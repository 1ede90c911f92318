"""Device mesh and sharding layout (reference: fme/core/distributed/).

The reference runs a 3-D (data, h, w) DeviceMesh with DDP over data and
2-D spatial decomposition of the lat-lon grid over (h, w), with distributed
SHT all-to-alls inside layers (model_torch_distributed.py:112-158). The
TPU-native replacement is one ``jax.sharding.Mesh`` with NamedSharding
annotations; XLA's SPMD partitioner inserts the all-to-all/all-reduce
collectives inside the SHT einsum chain and the psum for data-parallel
gradients — there is no wrapper module and no hand-written process-group
logic.

Batch layout: [batch, (time,) lat, lon, (channel)] ->
PartitionSpec("data", None, "h", "w", None)-style specs via
``batch_spec(ndim)``.
"""

import dataclasses
from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
H_AXIS = "h"
W_AXIS = "w"


@dataclasses.dataclass
class MeshConfig:
    """Mesh shape configuration (reference env vars FME_DISTRIBUTED_H/W,
    fme/core/distributed/model_torch_distributed.py:112).

    data_parallel = -1 means "all remaining devices".
    """

    data_parallel: int = -1
    h: int = 1
    w: int = 1

    def build(self, devices=None) -> Mesh:
        devices = devices if devices is not None else jax.devices()
        n = len(devices)
        spatial = self.h * self.w
        if n % spatial != 0:
            raise ValueError(
                f"{n} devices not divisible by spatial h*w={spatial}"
            )
        data = self.data_parallel if self.data_parallel > 0 else n // spatial
        if data * spatial != n:
            raise ValueError(
                f"mesh ({data}, {self.h}, {self.w}) != {n} devices"
            )
        arr = np.asarray(devices).reshape(data, self.h, self.w)
        return Mesh(arr, (DATA_AXIS, H_AXIS, W_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
        (DATA_AXIS, H_AXIS, W_AXIS),
    )


def batch_spec(ndim: int, has_channel: bool = False) -> P:
    """PartitionSpec for a [batch, ..., lat, lon(, channel)] array: batch
    over "data", lat over "h", lon over "w".
    """
    n_spatial_end = 3 if has_channel else 2
    middle = ndim - 1 - n_spatial_end
    spec = [DATA_AXIS] + [None] * middle + [H_AXIS, W_AXIS]
    if has_channel:
        spec.append(None)
    return P(*spec)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a dict of [B, ..., H, W] arrays onto the mesh."""
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, batch_spec(v.ndim))
        out[k] = jax.device_put(v, sharding)
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@contextmanager
def use_mesh(mesh: Mesh):
    with jax.set_mesh(mesh):
        yield mesh


_SPATIAL_MESH: Mesh | None = None


@contextmanager
def spatial_parallel(mesh: Mesh | None):
    """Declare the active (data, h, w) mesh for spatial model
    parallelism. While active (and the mesh has h*w > 1), SFNO models
    build the explicit all-to-all distributed SHT
    (ace_tpu/ops/distributed_sht.py) instead of the plain einsum —
    the reference's thd.init(h_group, w_group) moment
    (fme/core/distributed/model_torch_distributed.py:157).
    """
    global _SPATIAL_MESH
    old = _SPATIAL_MESH
    _SPATIAL_MESH = mesh
    try:
        yield mesh
    finally:
        _SPATIAL_MESH = old


def get_spatial_mesh() -> Mesh | None:
    """The mesh declared via ``spatial_parallel``, if it actually
    decomposes space (h*w > 1); else None."""
    mesh = _SPATIAL_MESH
    if mesh is None:
        return None
    if int(mesh.shape[H_AXIS]) * int(mesh.shape[W_AXIS]) == 1:
        return None
    return mesh


def parameter_spec(shape, mesh: Mesh, axis: str = DATA_AXIS,
                   min_elements: int = 1 << 16) -> P:
    """FSDP-style sharding spec for one parameter/optimizer-state leaf:
    shard the largest dimension divisible by the mesh axis size over
    ``axis``; replicate leaves that are small or have no divisible
    dimension. The TPU-native analog of ZeRO-3 weight sharding — XLA
    inserts the all-gather where a layer consumes the weight and the
    reduce-scatter in the gradient, riding ICI (scaling-book recipe;
    the reference's torch DDP replicates instead, so this strictly
    lowers per-chip HBM vs the reference at equal world size)."""
    n = int(mesh.shape[axis])
    if n <= 1:
        return P()
    size = 1
    for d in shape:
        size *= int(d)
    if size < min_elements:
        return P()
    best = None
    for i, d in enumerate(shape):
        if int(d) % n == 0 and (best is None or int(d) > int(shape[best])):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def shard_parameters(tree, mesh: Mesh, axis: str = DATA_AXIS,
                     min_elements: int = 1 << 16):
    """Place a parameter (or optimizer-state) pytree with FSDP-style
    sharding over ``axis`` (see ``parameter_spec``). Scalars and
    non-array leaves pass through untouched."""

    def put(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        return jax.device_put(
            leaf,
            NamedSharding(
                mesh, parameter_spec(leaf.shape, mesh, axis, min_elements)
            ),
        )

    return jax.tree_util.tree_map(put, tree)
