"""Corrector selection by ``{type, config}``
(reference: fme/core/registry/corrector.py CorrectorSelector with
atmosphere_corrector / ocean_corrector / ice_corrector registrations).
"""

from ace_tpu.core.corrector.atmosphere import AtmosphereCorrectorConfig
from ace_tpu.core.corrector.ice import IceCorrectorConfig
from ace_tpu.core.corrector.ocean import OceanCorrectorConfig
from ace_tpu.core.registry import Registry, Selector


class CorrectorSelector(Selector):
    _registry: Registry = Registry()

    @classmethod
    def get_registry(cls) -> Registry:
        return cls._registry

    @classmethod
    def register(cls, name: str):
        return cls._registry.register(name)

    @property
    def is_noop(self) -> bool:
        return self.instance.is_noop

    def build_from_dataset_info(self, dataset_info):
        """Dispatch build args by corrector family: the atmosphere
        corrector needs the hybrid sigma-pressure coordinate, the ocean
        corrector the depth coordinate, the ice corrector neither.
        """
        instance = self.instance
        if isinstance(instance, OceanCorrectorConfig):
            return instance.build(
                dataset_info.gridded_operations,
                dataset_info.vertical_coordinate,
                dataset_info.timestep,
            )
        if isinstance(instance, IceCorrectorConfig):
            return instance.build(
                dataset_info.gridded_operations, None,
                dataset_info.timestep,
            )
        return instance.build(
            dataset_info.gridded_operations,
            dataset_info.atmosphere_vertical_coordinate,
            dataset_info.timestep,
        )


CorrectorSelector.register("atmosphere_corrector")(
    AtmosphereCorrectorConfig
)
CorrectorSelector.register("ice_corrector")(IceCorrectorConfig)
CorrectorSelector.register("ocean_corrector")(OceanCorrectorConfig)
