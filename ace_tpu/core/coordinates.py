"""Horizontal and vertical coordinate systems
(reference: fme/core/coordinates.py).

Vertical: hybrid sigma-pressure (atmosphere), depth (ocean), null.
Horizontal: lat-lon (Gaussian or equiangular); HEALPix arrives in a later
round. Coordinates are plain Python objects holding numpy arrays on the
host; jnp versions are materialized on demand for device math.
"""

import abc
import dataclasses
from datetime import timedelta

import jax.numpy as jnp
import numpy as np

from ace_tpu.core.constants import GRAVITY
from ace_tpu.core.metrics import spherical_area_weights


@dataclasses.dataclass
class DimSize:
    name: str
    size: int


class VerticalCoordinate(abc.ABC):
    @abc.abstractmethod
    def __len__(self) -> int: ...

    @abc.abstractmethod
    def as_dict(self) -> dict: ...

    @property
    @abc.abstractmethod
    def coords(self) -> dict[str, np.ndarray]: ...


@dataclasses.dataclass
class HybridSigmaPressureCoordinate(VerticalCoordinate):
    """Interface pressures p(k) = ak + bk * ps
    (reference: fme/core/coordinates.py:150).
    """

    ak: np.ndarray
    bk: np.ndarray

    def __post_init__(self):
        self.ak = np.asarray(self.ak, dtype=np.float32)
        self.bk = np.asarray(self.bk, dtype=np.float32)
        if self.ak.ndim != 1 or self.bk.ndim != 1:
            raise ValueError("ak and bk must be 1-dimensional")
        if len(self.ak) != len(self.bk):
            raise ValueError("ak and bk must have the same length")

    def __len__(self):
        return len(self.ak)

    def __eq__(self, other):
        if not isinstance(other, HybridSigmaPressureCoordinate):
            return False
        return np.allclose(self.ak, other.ak) and np.allclose(self.bk, other.bk)

    def get_ak(self) -> jnp.ndarray:
        return jnp.asarray(self.ak)

    def get_bk(self) -> jnp.ndarray:
        return jnp.asarray(self.bk)

    @property
    def coords(self) -> dict[str, np.ndarray]:
        return {"ak": self.ak, "bk": self.bk}

    def as_dict(self) -> dict:
        return {"ak": self.ak.tolist(), "bk": self.bk.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "HybridSigmaPressureCoordinate":
        return cls(ak=np.asarray(d["ak"]), bk=np.asarray(d["bk"]))

    def interface_pressure(self, surface_pressure: jnp.ndarray) -> jnp.ndarray:
        """Pressure at layer interfaces; appends a trailing vertical axis."""
        return (
            jnp.asarray(self.ak)
            + jnp.asarray(self.bk) * surface_pressure[..., None]
        )

    def vertical_integral(
        self, integrand: jnp.ndarray, surface_pressure: jnp.ndarray
    ) -> jnp.ndarray:
        """(1/g) ∫ x dp over the column; removes the trailing vertical axis."""
        if len(self.ak) != integrand.shape[-1] + 1:
            raise ValueError(
                f"integrand has {integrand.shape[-1]} layers but coordinate "
                f"has {len(self.ak) - 1}"
            )
        pressure_thickness = jnp.diff(
            self.interface_pressure(surface_pressure), axis=-1
        )
        return jnp.sum(integrand * pressure_thickness, axis=-1) / GRAVITY


def dz_from_idepth(idepth: np.ndarray, mask: np.ndarray,
                   deptho: np.ndarray | None = None) -> np.ndarray:
    """Layer thicknesses from interface depths, accounting for partial
    bottom cells when the sea-floor depth ``deptho`` is given
    (reference: fme/core/coordinates.py:287 dz_from_idepth)."""
    z_top = idepth[..., :-1]
    z_bot = idepth[..., 1:]
    if deptho is None:
        deptho_exp = np.max(mask * z_bot, axis=-1, keepdims=True)
    else:
        deptho_exp = np.asarray(deptho)[..., None]
    dz = np.clip(deptho_exp, z_top, z_bot) - z_top
    return np.nan_to_num(dz) * mask


@dataclasses.dataclass
class DepthCoordinate(VerticalCoordinate):
    """Ocean depth coordinate with a static column mask and optional
    sea-floor depth for partial bottom cells
    (reference: fme/core/coordinates.py:303).
    """

    idepth: np.ndarray
    mask: np.ndarray  # [..., n_layers], 1 valid / 0 invalid
    deptho: np.ndarray | None = None  # positive-down sea-floor depth
    surface_mask: np.ndarray | None = None

    def __post_init__(self):
        self.idepth = np.asarray(self.idepth, dtype=np.float32)
        self.mask = np.asarray(self.mask, dtype=np.float32)
        if self.deptho is not None:
            self.deptho = np.asarray(self.deptho, dtype=np.float32)
        if self.idepth.ndim != 1:
            raise ValueError("idepth must be 1-dimensional")
        if self.mask.shape[-1] != len(self.idepth) - 1:
            raise ValueError(
                "mask last dim must equal len(idepth) - 1 "
                f"({self.mask.shape[-1]} vs {len(self.idepth) - 1})"
            )
        self._dz = dz_from_idepth(self.idepth, self.mask, self.deptho)

    def __len__(self):
        return len(self.idepth)

    @property
    def dz(self) -> np.ndarray:
        return self._dz

    @property
    def coords(self) -> dict[str, np.ndarray]:
        return {"idepth": self.idepth}

    def as_dict(self) -> dict:
        d = {"idepth": self.idepth.tolist(), "mask": self.mask.tolist()}
        if self.deptho is not None:
            d["deptho"] = np.nan_to_num(self.deptho).tolist()
        return d

    def get_mask(self) -> jnp.ndarray:
        return jnp.asarray(self.mask)

    def get_idepth(self) -> jnp.ndarray:
        return jnp.asarray(self.idepth)

    def depth_integral(self, integrand: jnp.ndarray) -> jnp.ndarray:
        """∫ x dz over valid layers; removes the trailing vertical axis.
        dz accounts for partial bottom cells when deptho is known. NaNs
        in the integrand count as zero; fully-dry columns (surface mask
        0) are NaN (reference: fme/core/coordinates.py:410-437)."""
        integral = jnp.sum(
            jnp.nan_to_num(integrand * jnp.asarray(self._dz)), axis=-1
        )
        mask = jnp.asarray(self.mask)
        surface = (
            mask[..., 0] if mask.ndim > 1
            else jnp.broadcast_to(mask[0], integral.shape)
        )
        return jnp.where(surface > 0, integral, jnp.nan)


@dataclasses.dataclass
class NullVerticalCoordinate(VerticalCoordinate):
    """No vertical coordinate (reference: fme/core/coordinates.py:440)."""

    def __len__(self):
        return 0

    @property
    def coords(self) -> dict[str, np.ndarray]:
        return {}

    def as_dict(self) -> dict:
        return {}


@dataclasses.dataclass
class LatLonCoordinates:
    """A lat-lon (possibly Gaussian) grid
    (reference: fme/core/coordinates.py:609).
    """

    lat: np.ndarray
    lon: np.ndarray
    loaded_lat_name: str = "lat"
    loaded_lon_name: str = "lon"

    def __post_init__(self):
        self.lat = np.asarray(self.lat, dtype=np.float64)
        self.lon = np.asarray(self.lon, dtype=np.float64)

    def __eq__(self, other):
        if not isinstance(other, LatLonCoordinates):
            return False
        return (
            self.lat.shape == other.lat.shape
            and self.lon.shape == other.lon.shape
            and np.allclose(self.lat, other.lat)
            and np.allclose(self.lon, other.lon)
        )

    @property
    def shape(self) -> tuple[int, int]:
        return (len(self.lat), len(self.lon))

    @property
    def area_weights(self) -> jnp.ndarray:
        return spherical_area_weights(self.lat, len(self.lon))

    @property
    def dims(self) -> list[str]:
        return ["lat", "lon"]

    @property
    def loaded_sizes(self) -> list[DimSize]:
        return [
            DimSize(self.loaded_lat_name, len(self.lat)),
            DimSize(self.loaded_lon_name, len(self.lon)),
        ]

    @property
    def coords(self) -> dict[str, np.ndarray]:
        return {"lat": self.lat, "lon": self.lon}

    @property
    def grid(self) -> str:
        """Infer the latitude grid type ("legendre-gauss" or "equiangular")."""
        from ace_tpu.ops.quadrature import legendre_gauss_weights

        nlat = len(self.lat)
        cost, _ = legendre_gauss_weights(nlat)
        gauss_lats = np.rad2deg(np.arcsin(cost))
        if np.allclose(
            np.sort(np.asarray(self.lat)), gauss_lats, atol=1e-2
        ):
            return "legendre-gauss"
        return "equiangular"

    def as_dict(self) -> dict:
        return {"lat": self.lat.tolist(), "lon": self.lon.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "LatLonCoordinates":
        return cls(lat=np.asarray(d["lat"]), lon=np.asarray(d["lon"]))

    def get_gridded_operations(self):
        from ace_tpu.core.gridded_ops import LatLonOperations

        return LatLonOperations(self.area_weights)


@dataclasses.dataclass
class HEALPixCoordinates:
    """A HEALPix (face, height, width) grid in flat-XY pixel order
    (reference: fme/core/coordinates.py:717 HEALPixCoordinates).
    """

    face: np.ndarray
    height: np.ndarray
    width: np.ndarray

    def __post_init__(self):
        self.face = np.asarray(self.face)
        self.height = np.asarray(self.height)
        self.width = np.asarray(self.width)
        if len(self.face) != 12:
            raise ValueError("HEALPixCoordinates must have 12 faces")
        if len(self.height) != len(self.width):
            raise ValueError("HEALPix faces must be square")
        nside = len(self.width)
        if 2 ** int(np.log2(nside)) != nside:
            raise ValueError("HEALPix nside must be a power of 2")
        self.nside = nside

    @classmethod
    def from_nside(cls, nside: int) -> "HEALPixCoordinates":
        return cls(
            face=np.arange(12),
            height=np.arange(nside),
            width=np.arange(nside),
        )

    def __eq__(self, other):
        return (
            isinstance(other, HEALPixCoordinates)
            and other.nside == self.nside
        )

    @property
    def shape(self) -> tuple[int, int, int]:
        return (12, self.nside, self.nside)

    @property
    def dims(self) -> list[str]:
        return ["face", "height", "width"]

    @property
    def loaded_sizes(self) -> list[DimSize]:
        return [
            DimSize("face", 12),
            DimSize("height", self.nside),
            DimSize("width", self.nside),
        ]

    @property
    def coords(self) -> dict[str, np.ndarray]:
        return {
            "face": self.face,
            "height": self.height,
            "width": self.width,
        }

    @property
    def grid(self) -> str:
        return "healpix"

    @property
    def area_weights(self):
        # HEALPix pixels are equal-area
        return None

    def meshgrid(self) -> tuple[np.ndarray, np.ndarray]:
        """(lat, lon) in degrees per pixel, [12, nside, nside], computed
        analytically from the ring geometry + ring->xy reorder (the
        reference uses earth2grid for this).
        """
        from ace_tpu.ops.hpx import ring_decomposition, ring_to_xy_indices

        nphi, start, theta, phi0 = ring_decomposition(self.nside)
        npix = 12 * self.nside**2
        lat_ring = np.zeros(npix)
        lon_ring = np.zeros(npix)
        for t in range(len(nphi)):
            p = np.arange(nphi[t])
            lat_ring[start[t] : start[t] + nphi[t]] = 90.0 - np.rad2deg(
                theta[t]
            )
            lon_ring[start[t] : start[t] + nphi[t]] = np.rad2deg(
                phi0[t] + 2.0 * np.pi * p / nphi[t]
            )
        idx = ring_to_xy_indices(self.nside)
        return (
            lat_ring[idx].reshape(self.shape),
            lon_ring[idx].reshape(self.shape),
        )

    @property
    def xyz(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        lat, lon = self.meshgrid()
        lat_r, lon_r = np.deg2rad(lat), np.deg2rad(lon)
        return (
            np.cos(lat_r) * np.cos(lon_r),
            np.cos(lat_r) * np.sin(lon_r),
            np.sin(lat_r),
        )

    def as_dict(self) -> dict:
        return {"nside": int(self.nside)}

    @classmethod
    def from_dict(cls, d: dict) -> "HEALPixCoordinates":
        return cls.from_nside(d["nside"])

    def get_gridded_operations(self):
        from ace_tpu.core.gridded_ops import HEALPixOperations

        return HEALPixOperations(self.nside)


def gaussian_latitudes(nlat: int) -> np.ndarray:
    """Gaussian (Legendre) latitudes in degrees, south-to-north ascending."""
    from ace_tpu.ops.quadrature import legendre_gauss_weights

    cost, _ = legendre_gauss_weights(nlat)
    return np.rad2deg(np.arcsin(cost))


def equiangular_latitudes(nlat: int) -> np.ndarray:
    """Equiangular cell-center latitudes in degrees, ascending."""
    return np.linspace(-90.0, 90.0, nlat)


def serialize_vertical_coordinate(vc: VerticalCoordinate) -> dict:
    if isinstance(vc, HybridSigmaPressureCoordinate):
        return {"type": "hybrid_sigma_pressure", "data": vc.as_dict()}
    if isinstance(vc, DepthCoordinate):
        return {"type": "depth", "data": vc.as_dict()}
    return {"type": "null", "data": {}}


def deserialize_vertical_coordinate(state: dict) -> VerticalCoordinate:
    if state["type"] == "hybrid_sigma_pressure":
        return HybridSigmaPressureCoordinate.from_dict(state["data"])
    if state["type"] == "depth":
        d = state["data"]
        return DepthCoordinate(
            idepth=np.asarray(d["idepth"]), mask=np.asarray(d["mask"]),
            deptho=(np.asarray(d["deptho"])
                    if d.get("deptho") is not None else None),
        )
    return NullVerticalCoordinate()


def encode_timestep(timestep: timedelta) -> float:
    return timestep.total_seconds()


def decode_timestep(seconds: float) -> timedelta:
    return timedelta(seconds=seconds)
