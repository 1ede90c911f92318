"""Distributed DISCO convolution with explicit all-to-all transposes.

Spatial-parallel analogue of the reference's
``thd.DistributedDiscreteContinuousConvS2`` (swapped into every local
conv under the spatial backend,
fme/core/distributed/model_torch_distributed.py:454-465). The single
-device op (ops/disco.py DiscoConvS2) is: lon DFT -> per-output-lat
banded gather over input lats -> banded complex contraction against the
precomputed psi basis -> inverse lon DFT.

Under a (data, h: lat, w: lon) mesh the XLA SPMD partitioning of those
einsums all-reduces the full spectral tensor (measured: 10 all-reduce +
6 collective-permute for the plain op under a (2,2) mesh). Here the op
runs inside ``shard_map`` with the same transpose pattern as
ops/distributed_sht.py — compute and memory stay sharded everywhere:

    grid  [B, lat/h, lon/w, C]
      --a2a(w: C->lon)-->  [B, lat/h, lon, C/w]      (full lon locally)
      --DFT matmul-->      [B, lat/h, M, C/w]
      --a2a(h: C->lat)-->  [B, lat, M, C/(h*w)]      (full lat locally)
      --banded gather + psi contraction (fully local; psi replicated,
        as in the reference's thd which replicates the filter basis)-->
                           [B, T, K, M, C/(h*w)]
      --inverse DFT + lon stride-->
                           [B, T, K, lon_out, C/(h*w)]
      --a2a(h: lat->C)-->  [B, T/h, K, lon_out, C/w]
      --a2a(w: lon->C)-->  [B, T/h, K, lon_out/w, C]

Communication is four all-to-alls of ~(tensor/P); no all-reduce, no
replicated spectral tensor. Uneven lat/lon/channel splits are handled by
zero-padding to mesh multiples (padded DFT rows are zero, padded psi
rows are zero, so padding contributes nothing).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ace_tpu.parallel.mesh import DATA_AXIS, H_AXIS, W_AXIS


def _pad_to(n: int, mult: int) -> int:
    return (mult - n % mult) % mult


class DistributedDiscoConvS2:
    """Fixed-geometry DISCO contraction over a (data, h, w) mesh.

    Takes a global channels-last [B, nlat_in, nlon_in, C] array sharded
    P(data, h, w, None) and returns [B, nlat_out, nlon_out, K, C]
    sharded P(data, h, w, None, None) — same logical shapes as
    ops/disco.py DiscoConvS2 (padding is internal).
    """

    def __init__(self, mesh, in_shape, out_shape, kernel_shape,
                 grid_in="equiangular", grid_out="equiangular",
                 theta_cutoff=None, basis_norm_mode="mean",
                 basis_type="piecewise linear", pipeline_chunks=None):
        from ace_tpu.ops.disco import precompute_disco_psi
        from ace_tpu.ops.sht import _dft_matrices

        self.mesh = mesh
        self.ph = int(mesh.shape[H_AXIS])
        self.pw = int(mesh.shape[W_AXIS])
        self.n_data = int(mesh.shape[DATA_AXIS])
        self.in_shape = in_shape
        self.out_shape = out_shape

        psi_banded, gather_idx = precompute_disco_psi(
            in_shape, out_shape, kernel_shape,
            grid_in=grid_in, grid_out=grid_out,
            theta_cutoff=theta_cutoff, basis_norm_mode=basis_norm_mode,
            basis_type=basis_type,
        )
        self.kernel_size = psi_banded.shape[0]
        nlat_in, nlon_in = in_shape
        nlat_out, nlon_out = out_shape
        mmax = nlon_in // 2 + 1
        fc, fs, ic, is_ = _dft_matrices(nlon_in, mmax)
        scale = nlon_in / (2 * math.pi)  # see DiscoConvS2: plain rfft
        fc = np.asarray(fc) * scale
        fs = np.asarray(fs) * scale
        ic = np.asarray(ic) / nlon_in
        is_ = np.asarray(is_) / nlon_in

        # padded sizes (lat over h; lon over w; T over h; lon_out over w)
        self.k_padded = nlat_in + _pad_to(nlat_in, self.ph)
        self.j_padded = nlon_in + _pad_to(nlon_in, self.pw)
        self.t_padded = nlat_out + _pad_to(nlat_out, self.ph)
        self.jo_padded = nlon_out + _pad_to(nlon_out, self.pw)
        self.pscale = nlon_in // nlon_out

        fc_p = np.zeros((self.j_padded, mmax), np.float32)
        fs_p = np.zeros_like(fc_p)
        fc_p[:nlon_in] = fc
        fs_p[:nlon_in] = fs
        self._fc = jnp.asarray(fc_p)
        self._fs = jnp.asarray(fs_p)
        self._ic = jnp.asarray(ic.astype(np.float32))
        self._is = jnp.asarray(is_.astype(np.float32))

        # psi FFT (conjugated), zero-padded over T; gather indices are
        # absolute input-lat rows (full lat is local at contraction time)
        psi = psi_banded.astype(np.float64)
        pr = np.einsum("ktwj,jm->ktwm", psi, fc.astype(np.float64))
        pi = np.einsum("ktwj,jm->ktwm", psi, fs.astype(np.float64))
        K, T, BW, M = pr.shape
        pr_p = np.zeros((K, self.t_padded, BW, M), np.float32)
        pi_p = np.zeros_like(pr_p)
        pr_p[:, :T] = pr
        pi_p[:, :T] = -pi  # conj
        self._psi_r = jnp.asarray(pr_p)
        self._psi_i = jnp.asarray(pi_p)
        gi = np.zeros((self.t_padded, BW), np.int32)
        gi[:T] = gather_idx
        self._gather = jnp.asarray(gi)
        # communication/compute pipelining: split the channel axis into
        # chunks and run each chunk through the full a2a->DFT->banded->
        # a2a chain independently. Chunk k+1's all-to-all has no data
        # dependency on chunk k's contraction, so XLA's latency-hiding
        # scheduler can put the (async) collective in flight behind the
        # MXU work — the "halo exchange overlapped with compute" design.
        # The channel axis is batch-like in every einsum, so chunking
        # does not change matmul shapes; numerics are bit-identical
        # (tests/test_distributed_disco.py). Default 1 (off): a 1-chip
        # rig cannot TIME real overlap, so the pipelined schedule ships
        # opt-in until multi-chip hardware can validate the win
        # (ACE_TPU_DISCO_PIPELINE=N or the constructor arg).
        if pipeline_chunks is None:
            import os

            pipeline_chunks = int(
                os.environ.get("ACE_TPU_DISCO_PIPELINE", "1")
            )
        self.pipeline_chunks = max(1, int(pipeline_chunks))
        self._mapped = self._build(batch_sharded=True)
        self._mapped_whole_batch = self._build(batch_sharded=False)

    def _build(self, batch_sharded: bool = True):
        prec = jax.lax.Precision.HIGH
        pscale = self.pscale
        jo_pad = self.jo_padded
        n_chunks = self.pipeline_chunks

        def conv_chunk(x, fc, fs, ic, isin, pr, pi, gather):
            # x block [b, k/ph, j/pw, c]
            x = x.astype(jnp.float32)
            x = jax.lax.all_to_all(
                x, W_AXIS, split_axis=3, concat_axis=2, tiled=True
            )  # [b, k/ph, J, c/pw]
            xr = jnp.einsum("bkjc,jm->bkmc", x, fc, precision=prec,
                            preferred_element_type=jnp.float32)
            xi = jnp.einsum("bkjc,jm->bkmc", x, fs, precision=prec,
                            preferred_element_type=jnp.float32)
            z = jnp.concatenate([xr, xi], axis=0)  # [2b, k/ph, M, c/pw]
            z = jax.lax.all_to_all(
                z, H_AXIS, split_axis=3, concat_axis=1, tiled=True
            )  # [2b, K_full, M, c/(ph*pw)]
            zg = jnp.take(z, gather, axis=1)  # [2b, T_pad, BW, M, c']
            xr_g, xi_g = jnp.split(zg, 2, axis=0)
            yr = (
                jnp.einsum("ktwm,btwmc->btkmc", pr, xr_g, precision=prec,
                           preferred_element_type=jnp.float32)
                - jnp.einsum("ktwm,btwmc->btkmc", pi, xi_g,
                             precision=prec,
                             preferred_element_type=jnp.float32)
            )
            yi = (
                jnp.einsum("ktwm,btwmc->btkmc", pr, xi_g, precision=prec,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("ktwm,btwmc->btkmc", pi, xr_g,
                             precision=prec,
                             preferred_element_type=jnp.float32)
            )
            out = jnp.einsum("btkmc,mj->btkjc", yr, ic, precision=prec,
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("btkmc,mj->btkjc", yi, isin,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)
            out = out[..., ::pscale, :]  # [b, T_pad, K, lon_out, c']
            if out.shape[-2] < jo_pad:
                out = jnp.pad(
                    out,
                    ((0, 0),) * 3
                    + ((0, jo_pad - out.shape[-2]), (0, 0)),
                )
            out = jax.lax.all_to_all(
                out, H_AXIS, split_axis=1, concat_axis=4, tiled=True
            )  # [b, T/ph, K, lon_out, c/pw]
            out = jax.lax.all_to_all(
                out, W_AXIS, split_axis=3, concat_axis=4, tiled=True
            )  # [b, T/ph, K, lon_out/pw, c]
            return jnp.moveaxis(out, 2, 3)  # [b, T/ph, lon/pw, K, c]

        def conv(x, fc, fs, ic, isin, pr, pi, gather):
            if n_chunks == 1 or x.shape[-1] % n_chunks != 0:
                return conv_chunk(x, fc, fs, ic, isin, pr, pi, gather)
            # unrolled chunk pipeline: each chunk's chain is independent,
            # exposing its collectives for overlap with the previous
            # chunk's contraction
            outs = [
                conv_chunk(xc, fc, fs, ic, isin, pr, pi, gather)
                for xc in jnp.split(x, n_chunks, axis=-1)
            ]
            return jnp.concatenate(outs, axis=-1)

        spec_in = P(DATA_AXIS if batch_sharded else None,
                    H_AXIS, W_AXIS, None)
        spec_out = P(DATA_AXIS if batch_sharded else None,
                     H_AXIS, W_AXIS, None, None)
        return jax.shard_map(
            conv, mesh=self.mesh,
            in_specs=(spec_in,) + (P(),) * 7,
            out_specs=spec_out,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        b, k0, j0, c0 = x.shape
        cpad = _pad_to(c0, self.ph * self.pw * self.pipeline_chunks)
        pads = (
            (0, 0),
            (0, self.k_padded - k0),
            (0, self.j_padded - j0),
            (0, cpad),
        )
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads)
        mapped = (
            self._mapped if b % self.n_data == 0
            else self._mapped_whole_batch
        )
        out = mapped(
            x, self._fc, self._fs, self._ic, self._is,
            self._psi_r, self._psi_i, self._gather,
        )
        nlat_out, nlon_out = self.out_shape
        return out[:, :nlat_out, :nlon_out, :, :c0]


def build_disco(in_shape, out_shape, kernel_shape,
                grid_in="equiangular", grid_out="equiangular",
                theta_cutoff=None, basis_norm_mode="mean",
                basis_type="piecewise linear"):
    """Auto-dispatching DISCO constructor: the explicit all-to-all
    distributed op when a spatial mesh is active (see
    ace_tpu/ops/sht.py build_sht — the single swap point matching the
    reference's model_torch_distributed.py:454-465), the single-device
    op otherwise.
    """
    from ace_tpu.parallel.mesh import get_spatial_mesh

    mesh = get_spatial_mesh()
    if mesh is not None:
        return DistributedDiscoConvS2(
            mesh, in_shape, out_shape, kernel_shape,
            grid_in=grid_in, grid_out=grid_out,
            theta_cutoff=theta_cutoff, basis_norm_mode=basis_norm_mode,
            basis_type=basis_type,
        )
    from ace_tpu.ops.disco import DiscoConvS2

    return DiscoConvS2(
        in_shape, out_shape, kernel_shape,
        grid_in=grid_in, grid_out=grid_out,
        theta_cutoff=theta_cutoff, basis_norm_mode=basis_norm_mode,
        basis_type=basis_type,
    )
