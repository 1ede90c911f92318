"""Per-variable standard normalization of TensorDicts
(reference: fme/core/normalizer.py).

Means/stds are scalars per variable, loaded from stats files (HDF5/netCDF
via h5py, or .npz) or given explicitly. ``NetworkAndLossNormalizationConfig``
separates the normalization the network sees from the one the loss is
computed in (residual-scaled stats), as in the reference (:318).
"""

import dataclasses
import pathlib
from collections.abc import Mapping

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.typing_ import TensorDict, TensorMapping


def load_scalar_dict_from_file(path, names=None) -> dict[str, float]:
    """Load {variable: scalar} from an .npz / .npy-dict / netCDF-HDF5 file.

    netCDF4 files are HDF5 underneath, so h5py reads the reference's stats
    files (reference loader: fme/core/normalizer.py:259 via xarray).
    """
    path = str(path)
    if path.endswith(".npz") or path.endswith(".npy"):
        data = np.load(path, allow_pickle=True)
        if hasattr(data, "files"):
            out = {k: float(np.asarray(data[k]).item()) for k in data.files}
        else:
            out = {k: float(v) for k, v in data.item().items()}
    else:
        import h5py

        out = {}
        with h5py.File(path, "r") as f:
            for k in f.keys():
                v = f[k]
                if hasattr(v, "shape") and int(np.prod(v.shape)) == 1:
                    out[k] = float(np.asarray(v[()]).reshape(()))
    if names is not None:
        missing = set(names) - set(out)
        if missing:
            raise KeyError(
                f"stats file {path} missing variables {sorted(missing)}"
            )
        out = {k: out[k] for k in names}
    return out


class StandardNormalizer:
    """Normalizes/denormalizes TensorDicts with per-variable scalar stats."""

    def __init__(
        self,
        means: Mapping[str, float],
        stds: Mapping[str, float],
        fill_nans_on_normalize: bool = False,
        fill_nans_on_denormalize: bool = False,
    ):
        self.means = {k: jnp.float32(v) for k, v in means.items()}
        self.stds = {k: jnp.float32(v) for k, v in stds.items()}
        self._names = set(means) & set(stds)
        self._fill_nans_on_normalize = fill_nans_on_normalize
        self._fill_nans_on_denormalize = fill_nans_on_denormalize

    @property
    def names(self) -> set[str]:
        return self._names

    def normalize(self, tensors: TensorMapping, apply_mean: bool = True) -> TensorDict:
        out = {}
        for k, v in tensors.items():
            if k not in self._names:
                out[k] = v
                continue
            mean = self.means[k] if apply_mean else 0.0
            normed = (v - mean) / self.stds[k]
            if self._fill_nans_on_normalize:
                normed = jnp.nan_to_num(normed, nan=0.0)
            out[k] = normed
        return out

    def denormalize(self, tensors: TensorMapping) -> TensorDict:
        out = {}
        for k, v in tensors.items():
            if k not in self._names:
                out[k] = v
                continue
            if self._fill_nans_on_denormalize:
                v = jnp.nan_to_num(v, nan=0.0)
            out[k] = v * self.stds[k] + self.means[k]
        return out

    def get_state(self) -> dict:
        return {
            "means": {k: float(v) for k, v in self.means.items()},
            "stds": {k: float(v) for k, v in self.stds.items()},
            "fill_nans_on_normalize": self._fill_nans_on_normalize,
            "fill_nans_on_denormalize": self._fill_nans_on_denormalize,
        }

    @classmethod
    def from_state(cls, state: dict) -> "StandardNormalizer":
        return cls(**state)


def get_normalizer(
    global_means_path, global_stds_path, names,
    fill_nans_on_normalize=False, fill_nans_on_denormalize=False,
) -> StandardNormalizer:
    means = load_scalar_dict_from_file(global_means_path, names)
    stds = load_scalar_dict_from_file(global_stds_path, names)
    return StandardNormalizer(
        means, stds,
        fill_nans_on_normalize=fill_nans_on_normalize,
        fill_nans_on_denormalize=fill_nans_on_denormalize,
    )


@dataclasses.dataclass
class NormalizationConfig:
    """Normalization stats from files or explicit values
    (reference: fme/core/normalizer.py:16).
    """

    global_means_path: str | pathlib.Path | None = None
    global_stds_path: str | pathlib.Path | None = None
    means: dict[str, float] = dataclasses.field(default_factory=dict)
    stds: dict[str, float] = dataclasses.field(default_factory=dict)
    fill_nans_on_normalize: bool = False
    fill_nans_on_denormalize: bool = False

    def __post_init__(self):
        using_path = (
            self.global_means_path is not None
            and self.global_stds_path is not None
        )
        using_explicit = len(self.means) > 0 and len(self.stds) > 0
        if using_path and using_explicit:
            raise ValueError(
                "Cannot use both stats paths and explicit means/stds."
            )
        if not (using_path or using_explicit):
            raise ValueError(
                "Must provide either stats paths or explicit means/stds."
            )

    def load(self):
        """Resolve file-based stats to explicit values (for serialization)."""
        if self.global_means_path is not None:
            self.means = load_scalar_dict_from_file(self.global_means_path)
            self.stds = load_scalar_dict_from_file(self.global_stds_path)
            self.global_means_path = None
            self.global_stds_path = None

    def build(self, names: list[str]) -> StandardNormalizer:
        if self.global_means_path is not None:
            return get_normalizer(
                self.global_means_path, self.global_stds_path, names,
                self.fill_nans_on_normalize, self.fill_nans_on_denormalize,
            )
        missing = set(names) - set(self.means)
        if missing:
            raise KeyError(f"means/stds missing for variables {sorted(missing)}")
        return StandardNormalizer(
            {k: self.means[k] for k in names},
            {k: self.stds[k] for k in names},
            self.fill_nans_on_normalize,
            self.fill_nans_on_denormalize,
        )


@dataclasses.dataclass
class NetworkAndLossNormalizationConfig:
    """Separate network-input and loss (residual) normalization
    (reference: fme/core/normalizer.py:318).
    """

    network: NormalizationConfig
    loss: NormalizationConfig | None = None
    residual: NormalizationConfig | None = None

    def __post_init__(self):
        if self.loss is not None and self.residual is not None:
            raise ValueError("Cannot specify both loss and residual normalization.")

    def build_network_normalizer(self, names: list[str]) -> StandardNormalizer:
        return self.network.build(names)

    def build_loss_normalizer(
        self, names: list[str], residual_scaled_names: list[str] | None = None
    ) -> StandardNormalizer:
        """The loss normalizer: either explicit loss stats, or network stats
        with std replaced by residual stds for prognostic variables.
        """
        if self.loss is not None:
            return self.loss.build(names)
        if self.residual is None:
            return self.network.build(names)
        network = self.network.build(names)
        residual_names = (
            [n for n in residual_scaled_names if n in names]
            if residual_scaled_names is not None
            else names
        )
        residual = self.residual.build(residual_names)
        means = {k: float(v) for k, v in network.means.items()}
        stds = {k: float(v) for k, v in network.stds.items()}
        for k in residual_names:
            # residual stats override BOTH moments (reference
            # _combine_normalizers, fme/core/normalizer.py:296): keeping
            # the network mean with the residual std would offset every
            # mean-sensitive loss term by mean/residual_std
            means[k] = float(residual.means[k])
            stds[k] = float(residual.stds[k])
        return StandardNormalizer(means, stds)

    def load(self):
        self.network.load()
        if self.loss is not None:
            self.loss.load()
        if self.residual is not None:
            self.residual.load()
