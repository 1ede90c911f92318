"""Distributed real SHT with explicit all-to-all transposes.

The spatial-parallel SHT (reference: torch_harmonics.distributed
DistributedRealSHT / DistributedInverseRealSHT, used at
fme/core/distributed/model_torch_distributed.py:454-465). Inputs are
sharded over the (h: lat, w: lon) mesh axes; the transform runs inside
``shard_map`` with ``jax.lax.all_to_all`` transposes that trade the
channel axis against a spatial/spectral axis — so compute AND memory
stay sharded everywhere:

    grid  [B, lat/h, lon/w, C]
      --a2a(w: C->lon)-->    [B, lat/h, lon, C/w]     (full lon locally)
      --DFT matmul-->        [B, lat/h, M, C/w]
      --a2a(w: M->C)-->      [B, lat/h, M/w, C]       (m sharded over w)
      --a2a(h: C->lat)-->    [B, lat, M/w, C/h]       (full lat locally)
      --Legendre matmul-->   [B, L, M/w, C/h]
      --a2a(h: L->C)-->      [B, L/h, M/w, C]         (l sharded over h)

(the inverse mirrors this). Communication per transform is four
all-to-alls of ~(tensor size / P) — unlike the XLA SPMD partitioning of
the plain einsum, which all-reduces the FULL spectral tensor and leaves
it replicated on every device (measured: 36 all-reduce, 0 all-to-all in
the compiled SFNO forward; see tests/test_distributed_sht.py).

Communication/compute pipelining: the channel axis is batch-like in
both the DFT and Legendre einsums (no reduction ever crosses channels),
so the transform can be split into channel chunks that each run the
full a2a->DFT->a2a->a2a->Legendre->a2a chain independently — chunk
k+1's all-to-all has no data dependency on chunk k's matmul, so XLA's
latency-hiding scheduler puts the async collectives in flight behind
the MXU work (the same design as distributed DISCO,
ops/distributed_disco.py:120-208, where the SHT's 4 a2a per transform
are the dominant flagship collective: 32 per train step,
MULTICHIP_r04). Numerics match the unchunked
transform to matmul-blocking tolerance (channel chunking changes no
reduction; the backend may tile the batch-like channel axis
differently), verified in tests/test_distributed_sht.py. Default 2 chunks on spatial meshes;
``ACE_TPU_SHT_PIPELINE=N`` or the constructor arg overrides (1 = off).

Spectral filters that are diagonal in (l, m) — the SFNO "diagonal" and
"dhconv" operator types — apply locally on the [L/h, M/w, C] shard with
full channels, exactly like the reference's spatially-parallel SFNO.

Uneven splits (e.g. 180 lat over h=8, reference
thd.compute_split_shapes, model_torch_distributed.py:200-267) are
handled by zero-padding lat/lon/l/m to mesh multiples: the padded
Legendre/DFT matrix rows are identically zero, so padded cells
contribute nothing and padded spectral rows are exactly zero.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ace_tpu.parallel.mesh import DATA_AXIS, H_AXIS, W_AXIS


def _pad_to(n: int, mult: int) -> int:
    return (mult - n % mult) % mult


def _wire_a2a(x, axis_name, split_axis, concat_axis):
    """all_to_all that GUARANTEES the wire dtype equals x.dtype.

    For bf16 operands XLA's simplifier merges the downstream matmul's
    promotion convert across the collective (even across an
    optimization_barrier — verified in compiled HLO), silently doubling
    the transfer to f32. Bitcasting to u16 for the transfer makes the
    rewrite impossible (converting an integer tensor is not
    semantics-preserving) and is itself a free reinterpretation.
    """
    if x.dtype == jnp.bfloat16:
        xi = jax.lax.bitcast_convert_type(x, jnp.uint16)
        xi = jax.lax.all_to_all(
            xi, axis_name, split_axis=split_axis,
            concat_axis=concat_axis, tiled=True,
        )
        return jax.lax.bitcast_convert_type(xi, jnp.bfloat16)
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis,
        tiled=True,
    )


def _resolve_pipeline_chunks(pipeline_chunks) -> int:
    if pipeline_chunks is None:
        import os

        pipeline_chunks = int(os.environ.get("ACE_TPU_SHT_PIPELINE", "2"))
    return max(1, int(pipeline_chunks))


def _chunked(fn, n_chunks: int, n_in: int, chunk_mult: int):
    """Wrap a per-shard transform so its first ``n_in`` array arguments
    are split into ``n_chunks`` channel chunks (last axis), each run
    through the full collective+matmul chain independently, and the
    outputs concatenated back. Falls back to one chunk when the channel
    count does not split into per-chunk multiples of ``chunk_mult``
    (the a2a split granularity, ph*pw)."""
    if n_chunks == 1:
        return fn

    def wrapped(*args):
        ins, rest = args[:n_in], args[n_in:]
        c = ins[0].shape[-1]
        if c % (n_chunks * chunk_mult) != 0:
            return fn(*args)
        parts = [
            fn(*chunk_ins, *rest)
            for chunk_ins in zip(
                *(jnp.split(a, n_chunks, axis=-1) for a in ins)
            )
        ]
        if isinstance(parts[0], tuple):
            return tuple(
                jnp.concatenate(p, axis=-1) for p in zip(*parts)
            )
        return jnp.concatenate(parts, axis=-1)

    return wrapped


class DistributedRealSHT:
    """Forward SHT over a (data, h, w) mesh; channels-last only.

    __call__ takes a global [B, nlat, nlon, C] array sharded
    P(data, h, w, None) and returns (real, imag) float32 coefficient
    arrays of global shape [B, L_pad, M_pad, C], sharded
    P(data, h, w, None), where rows beyond (lmax, mmax) are zero.
    Use ``.lmax``/``.mmax`` (logical) and ``.l_padded``/``.m_padded``.
    """

    def __init__(self, mesh, nlat, nlon, lmax=None, mmax=None,
                 grid="legendre-gauss", norm="ortho", csphase=True,
                 precision=jax.lax.Precision.HIGH, pipeline_chunks=None):
        self.mesh = mesh
        self.ph = int(mesh.shape[H_AXIS])
        self.pw = int(mesh.shape[W_AXIS])
        self.precision = precision
        self.pipeline_chunks = _resolve_pipeline_chunks(pipeline_chunks)
        # pure-numpy precompute (this runs inside flax setup, i.e. under
        # a jit trace — jnp intermediates would become tracers)
        from ace_tpu.ops.legendre import precompute_legpoly
        from ace_tpu.ops.sht import _dft_matrices, quadrature_for_grid

        cost, wq, default_lmax = quadrature_for_grid(grid, nlat)
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        tq = np.flip(np.arccos(cost))
        pct = precompute_legpoly(self.mmax, self.lmax, tq, norm=norm,
                                 csphase=csphase)
        weights_np = (pct * wq[None, None, :]).astype(np.float32)
        fc_np, fs_np, _, _ = _dft_matrices(nlon, self.mmax)
        self.k_padded = nlat + _pad_to(nlat, self.ph)
        self.j_padded = nlon + _pad_to(nlon, self.pw)
        self.l_padded = self.lmax + _pad_to(self.lmax, self.ph)
        self.m_padded = self.mmax + _pad_to(self.mmax, self.pw)
        fc = np.zeros((self.j_padded, self.m_padded), np.float32)
        fs = np.zeros_like(fc)
        fc[:nlon, : self.mmax] = fc_np
        fs[:nlon, : self.mmax] = fs_np
        w = np.zeros((self.m_padded, self.l_padded, self.k_padded),
                     np.float32)
        w[: self.mmax, : self.lmax, :nlat] = weights_np
        self._fc = jnp.asarray(fc)
        self._fs = jnp.asarray(fs)
        self._weights = jnp.asarray(w)  # [M_pad, L_pad, K_pad]
        self.n_data = int(mesh.shape[DATA_AXIS])
        self._mapped = self._build(batch_sharded=True)
        # batches not divisible by the data axis (e.g. flax init's
        # batch-1 dummy) run with the batch replicated per data slice
        self._mapped_whole_batch = self._build(batch_sharded=False)

    # the transform casts to f32 internally AFTER the first (grid-space)
    # all-to-all, so callers should pass their native activation dtype:
    # under the bf16 AMP path this halves that transfer's bytes, and the
    # cast commutes exactly with the (compute-free) transpose
    casts_input = True

    def _build(self, batch_sharded: bool = True):
        prec = self.precision
        def fwd(x, fc, fs, w_mblock):
            # block shapes: x [b, k/ph, j/pw, c]; w_mblock [M/pw, L, K]
            # grid-space transfer rides the caller's dtype (bf16 under
            # AMP = half the bytes; see _wire_a2a); exact — bf16 inputs
            # carry no information a pre-cast would preserve
            x = _wire_a2a(
                x, W_AXIS, split_axis=3, concat_axis=2
            )  # [b, k/ph, J, c/pw]
            xr = jnp.einsum("bkjc,jm->bkmc", x, fc, precision=prec,
                            preferred_element_type=jnp.float32)
            xi = jnp.einsum("bkjc,jm->bkmc", x, fs, precision=prec,
                            preferred_element_type=jnp.float32)
            # stack real/imag on the batch axis: a2a never touches it,
            # so ordering through the transposes is trivially stable
            z = jnp.concatenate([xr, xi], axis=0)  # [2b, k/ph, M, c/pw]
            z = jax.lax.all_to_all(
                z, W_AXIS, split_axis=2, concat_axis=3, tiled=True
            )  # [2b, k/ph, M/pw, c]
            z = jax.lax.all_to_all(
                z, H_AXIS, split_axis=3, concat_axis=1, tiled=True
            )  # [2b, K, M/pw, c/ph]
            z = jnp.einsum("bkmc,mlk->blmc", z, w_mblock, precision=prec,
                           preferred_element_type=jnp.float32)
            z = jax.lax.all_to_all(
                z, H_AXIS, split_axis=1, concat_axis=3, tiled=True
            )  # [2b, L/ph, M/pw, c]
            cr, ci = jnp.split(z, 2, axis=0)
            return cr, ci

        spec = P(DATA_AXIS if batch_sharded else None,
                 H_AXIS, W_AXIS, None)
        return jax.shard_map(
            _chunked(fwd, self.pipeline_chunks, 1, self.ph * self.pw),
            mesh=self.mesh,
            in_specs=(spec, P(), P(), P(W_AXIS, None, None)),
            out_specs=(spec, spec),
        )

    def forward_pair(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Forward SHT returning (real, imag) float32 arrays — the
        no-complex hot path (see ace_tpu/models/sfno.py use_pair)."""
        b, k0, j0, c0 = x.shape
        # pad channels to the chunked-a2a granularity so the pipelined
        # schedule applies (padded channels are zero work sliced off
        # below; at most chunks*ph*pw-1 extra)
        cpad = _pad_to(c0, self.pipeline_chunks * self.ph * self.pw)
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
        cr, ci = mapped(x, self._fc, self._fs, self._weights)
        if cpad:
            cr = cr[..., :c0]
            ci = ci[..., :c0]
        return cr, ci

    def __call__(self, x: jax.Array) -> jax.Array:
        """Complex-API parity with ops.sht.RealSHT (coefficient rows
        beyond (lmax, mmax) are zero-padding to the mesh multiple)."""
        return jax.lax.complex(*self.forward_pair(x))


class DistributedInverseRealSHT:
    """Inverse of DistributedRealSHT: (real, imag) [B, L_pad, M_pad, C]
    sharded P(data, h, w, None) -> grid [B, nlat, nlon, C]."""

    def __init__(self, mesh, nlat, nlon, lmax=None, mmax=None,
                 grid="legendre-gauss", norm="ortho", csphase=True,
                 precision=jax.lax.Precision.HIGH, pipeline_chunks=None):
        self.mesh = mesh
        self.ph = int(mesh.shape[H_AXIS])
        self.pw = int(mesh.shape[W_AXIS])
        self.precision = precision
        self.pipeline_chunks = _resolve_pipeline_chunks(pipeline_chunks)
        from ace_tpu.ops.legendre import precompute_legpoly
        from ace_tpu.ops.sht import _dft_matrices, quadrature_for_grid

        cost, _, default_lmax = quadrature_for_grid(grid, nlat)
        self.nlat, self.nlon, self.grid = nlat, nlon, grid
        self.lmax = lmax or default_lmax
        self.mmax = mmax or nlon // 2 + 1
        t = np.flip(np.arccos(cost))
        pct_np = precompute_legpoly(
            self.mmax, self.lmax, t, norm=norm, inverse=True,
            csphase=csphase,
        ).astype(np.float32)
        _, _, ic_np, is_np = _dft_matrices(nlon, self.mmax)
        self.k_padded = nlat + _pad_to(nlat, self.ph)
        self.j_padded = nlon + _pad_to(nlon, self.pw)
        self.l_padded = self.lmax + _pad_to(self.lmax, self.ph)
        self.m_padded = self.mmax + _pad_to(self.mmax, self.pw)
        ic = np.zeros((self.m_padded, self.j_padded), np.float32)
        isin = np.zeros_like(ic)
        ic[: self.mmax, : self.nlon] = ic_np
        isin[: self.mmax, : self.nlon] = is_np
        pct = np.zeros((self.m_padded, self.l_padded, self.k_padded),
                       np.float32)
        pct[: self.mmax, : self.lmax, :nlat] = pct_np
        self._ic = jnp.asarray(ic)
        self._is = jnp.asarray(isin)
        self._pct = jnp.asarray(pct)
        self.n_data = int(mesh.shape[DATA_AXIS])
        self._mapped = self._build(batch_sharded=True)
        self._mapped_whole_batch = self._build(batch_sharded=False)

    def _build(self, batch_sharded: bool = True):
        prec = self.precision
        def inv(cr, ci, ic, isin, pct_mblock):
            # first a2a rides the caller's dtype (bf16 filter outputs
            # under AMP — half the bytes; see _wire_a2a)
            z = jnp.concatenate([cr, ci], axis=0)  # [2b, L/ph, M/pw, c]
            z = _wire_a2a(
                z, H_AXIS, split_axis=3, concat_axis=1
            )  # [2b, L, M/pw, c/ph]
            z = jnp.einsum("blmc,mlk->bkmc", z, pct_mblock, precision=prec,
                           preferred_element_type=jnp.float32)
            z = jax.lax.all_to_all(
                z, H_AXIS, split_axis=1, concat_axis=3, tiled=True
            )  # [2b, K/ph, M/pw, c]
            z = jax.lax.all_to_all(
                z, W_AXIS, split_axis=3, concat_axis=2, tiled=True
            )  # [2b, K/ph, M, c/pw]
            xr, xi = jnp.split(z, 2, axis=0)
            out = jnp.einsum("bkmc,mj->bkjc", xr, ic, precision=prec,
                             preferred_element_type=jnp.float32)
            out = out + jnp.einsum("bkmc,mj->bkjc", xi, isin,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)
            out = jax.lax.all_to_all(
                out, W_AXIS, split_axis=2, concat_axis=3, tiled=True
            )  # [b, K/ph, J/pw, c]
            return out

        spec = P(DATA_AXIS if batch_sharded else None,
                 H_AXIS, W_AXIS, None)
        return jax.shard_map(
            _chunked(inv, self.pipeline_chunks, 2, self.ph * self.pw),
            mesh=self.mesh,
            in_specs=(spec, spec, P(), P(), P(W_AXIS, None, None)),
            out_specs=spec,
        )

    def inverse_pair(self, cr: jax.Array, ci: jax.Array) -> jax.Array:
        """Inverse SHT from (real, imag) float32 coefficient arrays —
        the no-complex hot path (see ace_tpu/models/sfno.py use_pair).
        Inputs smaller than (l_padded, m_padded) are zero-padded."""
        b, l0, m0, c0 = cr.shape
        cpad = _pad_to(c0, self.pipeline_chunks * self.ph * self.pw)
        pads = (
            (0, 0),
            (0, self.l_padded - l0),
            (0, self.m_padded - m0),
            (0, cpad),
        )
        if any(p != (0, 0) for p in pads):
            cr = jnp.pad(cr, pads)
            ci = jnp.pad(ci, pads)
        mapped = (
            self._mapped if b % self.n_data == 0
            else self._mapped_whole_batch
        )
        out = mapped(cr, ci, self._ic, self._is, self._pct)
        if (
            cpad
            or self.k_padded != self.nlat
            or self.j_padded != self.nlon
        ):
            out = out[:, : self.nlat, : self.nlon, :c0]
        return out

    def __call__(self, c: jax.Array) -> jax.Array:
        """Complex-API parity with ops.sht.InverseRealSHT."""
        return self.inverse_pair(jnp.real(c), jnp.imag(c))
