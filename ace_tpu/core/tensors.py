"""Tensor-dict utilities (reference: fme/core/tensors.py, dicts.py,
tensor_dict_accumulator.py, winds.py).
"""

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.typing_ import TensorDict, TensorMapping


def assert_dict_allclose(actual: TensorMapping, expected: TensorMapping,
                         rtol=1e-5, atol=1e-8):
    """(reference: fme/core/tensors.py assert_dict_allclose)."""
    missing = set(expected) - set(actual)
    extra = set(actual) - set(expected)
    if missing or extra:
        raise AssertionError(
            f"dict keys differ; missing: {sorted(missing)}, "
            f"extra: {sorted(extra)}"
        )
    for k in expected:
        np.testing.assert_allclose(
            np.asarray(actual[k]), np.asarray(expected[k]),
            rtol=rtol, atol=atol, err_msg=f"variable {k}",
        )


def add_ensemble_dim(data: TensorMapping, repeats: int = 1) -> TensorDict:
    """[B, ...] -> [B, E, ...] (reference: tensors.py add_ensemble_dim)."""
    return {
        k: jnp.repeat(v[:, None], repeats, axis=1) for k, v in data.items()
    }


def fold_ensemble_dim(data: TensorMapping) -> tuple[TensorDict, int]:
    """[B, E, ...] -> [B*E, ...]."""
    n_ensemble = next(iter(data.values())).shape[1]
    return {
        k: v.reshape(-1, *v.shape[2:]) for k, v in data.items()
    }, n_ensemble


def unfold_ensemble_dim(data: TensorMapping, n_ensemble: int) -> TensorDict:
    """[B*E, ...] -> [B, E, ...]."""
    return {
        k: v.reshape(-1, n_ensemble, *v.shape[1:]) for k, v in data.items()
    }


def flatten_dict(nested: dict, separator: str = ".") -> dict:
    """Nested -> flat config dict (reference: fme/core/dicts.py:5)."""
    out = {}
    for k, v in nested.items():
        if isinstance(v, dict):
            for kk, vv in flatten_dict(v, separator).items():
                out[f"{k}{separator}{kk}"] = vv
        else:
            out[k] = v
    return out


def unflatten_dict(flat: dict, separator: str = ".") -> dict:
    """Flat -> nested config dict (reference: fme/core/dicts.py:23)."""
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(separator)
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = v
    return out


def add_names(source: TensorMapping, target: TensorMapping,
              names: list[str]) -> TensorDict:
    """target[name] += source[name] for each name
    (reference: fme/core/dicts.py add_names).
    """
    out = dict(target)
    for name in names:
        out[name] = out[name] + source[name]
    return out


class TensorDictAccumulator:
    """Running accumulation of TensorDicts (flux averaging in coupled
    stepping; reference: fme/core/tensor_dict_accumulator.py:7).
    """

    def __init__(self):
        self._sum: TensorDict | None = None
        self._count = 0

    def record(self, data: TensorMapping):
        if self._sum is None:
            self._sum = {k: v for k, v in data.items()}
        else:
            if set(data) != set(self._sum):
                raise ValueError("inconsistent keys in accumulation")
            self._sum = {k: self._sum[k] + data[k] for k in data}
        self._count += 1

    def get_mean(self) -> TensorDict:
        if self._sum is None:
            raise ValueError("no data recorded")
        return {k: v / self._count for k, v in self._sum.items()}


def u_v_to_x_y_z_wind(u, v, lat, lon):
    """Horizontal wind to Cartesian components
    (reference: fme/core/winds.py:4 u_v_to_x_y_z_wind).
    """
    lat, lon = jnp.deg2rad(lat), jnp.deg2rad(lon)
    wx = -u * jnp.sin(lon) - v * jnp.sin(lat) * jnp.cos(lon)
    wy = u * jnp.cos(lon) - v * jnp.sin(lat) * jnp.sin(lon)
    wz = v * jnp.cos(lat)
    return wx, wy, wz


def x_y_z_to_u_v_wind(wx, wy, wz, lat, lon):
    """Cartesian wind back to horizontal components
    (reference: fme/core/winds.py x_y_z_to_u_v_wind).
    """
    lat, lon = jnp.deg2rad(lat), jnp.deg2rad(lon)
    u = -wx * jnp.sin(lon) + wy * jnp.cos(lon)
    v = (
        -wx * jnp.sin(lat) * jnp.cos(lon)
        - wy * jnp.sin(lat) * jnp.sin(lon)
        + wz * jnp.cos(lat)
    )
    return u, v
