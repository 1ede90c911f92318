"""Ocean surface-temperature prescription (prescribed SST or slab ocean)
(reference: fme/core/ocean.py, fme/core/prescriber.py).
"""

import abc
import dataclasses
import datetime

import jax.numpy as jnp

from ace_tpu.core.atmosphere_data import AtmosphereData
from ace_tpu.core.constants import DENSITY_OF_WATER, SPECIFIC_HEAT_OF_WATER
from ace_tpu.core.typing_ import TensorDict, TensorMapping


def replace_on_mask(original, replacement, mask, mask_value: int):
    """Replace original with replacement where round(mask) == mask_value
    (reference: fme/core/spatial_masking.py:11).
    """
    rounded_mask = jnp.round(mask).astype(jnp.int32)
    return jnp.where(rounded_mask == mask_value, replacement, original)


@dataclasses.dataclass
class PrescriberConfig:
    """Overwrite predictions of ``prescribed_name`` with target values in a
    masked region (reference: fme/core/prescriber.py:8).
    """

    prescribed_name: str
    mask_name: str
    mask_value: int
    interpolate: bool = False

    def __post_init__(self):
        if self.interpolate and self.mask_value != 1:
            raise ValueError(
                "Interpolation requires mask_value to be 1, got "
                f"{self.mask_value}."
            )

    def build(self, in_names: list[str], out_names: list[str]) -> "Prescriber":
        if not (
            self.prescribed_name in in_names and self.prescribed_name in out_names
        ):
            raise ValueError(
                "Prescribed variables must be in in_names and out_names, "
                f"but {self.prescribed_name} is not."
            )
        return Prescriber(
            self.prescribed_name, self.mask_name, self.mask_value,
            self.interpolate,
        )


class Prescriber:
    def __init__(self, prescribed_name, mask_name, mask_value,
                 interpolate=False):
        self.prescribed_name = prescribed_name
        self.mask_name = mask_name
        self.mask_value = mask_value
        self.interpolate = interpolate

    def __call__(
        self, mask_data: TensorMapping, gen: TensorMapping,
        target: TensorMapping,
    ) -> TensorDict:
        for label, named in [("gen", gen), ("target", target)]:
            if self.prescribed_name not in named:
                raise ValueError(
                    f"Prescribed variable {self.prescribed_name!r} missing "
                    f"from {label}"
                )
        if self.interpolate:
            mask = mask_data[self.mask_name]
            output = (
                mask * target[self.prescribed_name]
                + (1 - mask) * gen[self.prescribed_name]
            )
        else:
            output = replace_on_mask(
                gen[self.prescribed_name],
                target[self.prescribed_name],
                mask_data[self.mask_name],
                self.mask_value,
            )
        return {**gen, self.prescribed_name: output}

    @property
    def prescribed_names(self) -> list[str]:
        return [self.prescribed_name]

    @property
    def mask_names(self) -> list[str]:
        return [self.mask_name]


def mixed_layer_temperature_tendency(
    f_net, q_flux, depth,
    density=DENSITY_OF_WATER, specific_heat=SPECIFIC_HEAT_OF_WATER,
):
    """Slab ocean mixed-layer temperature tendency, K/s
    (reference: fme/core/ocean.py:223).
    """
    return (f_net + q_flux) / (density * depth * specific_heat)


@dataclasses.dataclass(frozen=True)
class SlabOceanConfig:
    """Slab ocean model fields (reference: fme/core/ocean.py:14)."""

    mixed_layer_depth_name: str
    q_flux_name: str

    @property
    def names(self) -> list[str]:
        return [self.mixed_layer_depth_name, self.q_flux_name]


class SurfaceTemperature(abc.ABC):
    @abc.abstractmethod
    def __call__(self, input_data, gen_data, target_data) -> jnp.ndarray: ...


@dataclasses.dataclass(frozen=True)
class PrescribedSurfaceTemperature(SurfaceTemperature):
    surface_temperature_name: str

    def __call__(self, input_data, gen_data, target_data):
        return target_data[self.surface_temperature_name]


@dataclasses.dataclass(frozen=True)
class SlabOceanSurfaceTemperature(SurfaceTemperature):
    surface_temperature_name: str
    q_flux_name: str
    mixed_layer_depth_name: str
    timestep: datetime.timedelta

    def __call__(self, input_data, gen_data, target_data):
        tendency = mixed_layer_temperature_tendency(
            AtmosphereData(gen_data).net_surface_energy_flux_without_frozen_precip,
            target_data[self.q_flux_name],
            target_data[self.mixed_layer_depth_name],
        )
        return (
            input_data[self.surface_temperature_name]
            + tendency * self.timestep.total_seconds()
        )


@dataclasses.dataclass(frozen=True)
class OceanConfig:
    """Sea-surface-temperature source configuration
    (reference: fme/core/ocean.py:90).
    """

    surface_temperature_name: str
    ocean_fraction_name: str
    interpolate: bool = False
    slab: SlabOceanConfig | None = None

    def build(self, in_names, out_names, timestep: datetime.timedelta) -> "Ocean":
        if not (
            self.surface_temperature_name in in_names
            and self.surface_temperature_name in out_names
        ):
            raise ValueError(
                "Surface temperature must be in in_names and out_names, but "
                f"{self.surface_temperature_name} is not."
            )
        prescriber = Prescriber(
            prescribed_name=self.surface_temperature_name,
            mask_name=self.ocean_fraction_name,
            mask_value=1,
            interpolate=self.interpolate,
        )
        if self.slab is None:
            surface_temperature: SurfaceTemperature = (
                PrescribedSurfaceTemperature(self.surface_temperature_name)
            )
        else:
            surface_temperature = SlabOceanSurfaceTemperature(
                surface_temperature_name=self.surface_temperature_name,
                q_flux_name=self.slab.q_flux_name,
                mixed_layer_depth_name=self.slab.mixed_layer_depth_name,
                timestep=timestep,
            )
        return Ocean(
            surface_temperature=surface_temperature,
            prescriber=prescriber,
            forcing_names=self.forcing_names,
            surface_temperature_name=self.surface_temperature_name,
            ocean_fraction_name=self.ocean_fraction_name,
        )

    @property
    def is_slab(self) -> bool:
        return self.slab is not None

    @property
    def forcing_names(self) -> list[str]:
        names = [self.ocean_fraction_name]
        if self.slab is None:
            names.append(self.surface_temperature_name)
        else:
            names.extend(self.slab.names)
        return list(set(names))


class Ocean:
    """Overwrite SST with a prescribed or slab-ocean prediction
    (reference: fme/core/ocean.py:167).
    """

    def __init__(self, surface_temperature, prescriber, forcing_names,
                 surface_temperature_name, ocean_fraction_name):
        self._surface_temperature = surface_temperature
        self.prescriber = prescriber
        self._forcing_names = forcing_names
        self.surface_temperature_name = surface_temperature_name
        self.ocean_fraction_name = ocean_fraction_name

    def __call__(
        self, input_data: TensorMapping, gen_data: TensorMapping,
        target_data: TensorMapping,
    ) -> TensorDict:
        next_step_temperature = self._surface_temperature(
            input_data, gen_data, target_data
        )
        return self.prescriber(
            target_data, gen_data,
            {self.surface_temperature_name: next_step_temperature},
        )

    @property
    def forcing_names(self) -> list[str]:
        return self._forcing_names
