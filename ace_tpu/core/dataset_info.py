"""Dataset metadata bundle (reference: fme/core/dataset_info.py:30).

Carries horizontal/vertical coordinates, timestep, and variable metadata.
Serialized into checkpoints so a trained stepper knows the grid it was
trained on; inference checks compatibility with the forcing dataset.
"""

import dataclasses
from typing import Any
from datetime import timedelta

import numpy as np

from ace_tpu.core.coordinates import (
    DepthCoordinate,
    HEALPixCoordinates,
    HybridSigmaPressureCoordinate,
    LatLonCoordinates,
    NullVerticalCoordinate,
    VerticalCoordinate,
    deserialize_vertical_coordinate,
    serialize_vertical_coordinate,
)
from ace_tpu.core.gridded_ops import GriddedOperations


@dataclasses.dataclass(frozen=True)
class VariableMetadata:
    units: str
    long_name: str


class IncompatibleDatasetInfo(ValueError):
    """Raised when two DatasetInfos cannot be used together."""


@dataclasses.dataclass
class DatasetInfo:
    horizontal_coordinates: LatLonCoordinates | HEALPixCoordinates | None = None
    vertical_coordinate: VerticalCoordinate | None = None
    timestep: timedelta | None = None
    variable_metadata: dict[str, VariableMetadata] = dataclasses.field(
        default_factory=dict
    )
    # dataset-derived static "mask_*" fields (reference:
    # fme/core/spatial_mask_provider.py); None = no masks
    mask_provider: Any = None
    # sorted union of dataset label names (reference: fme/core/labels.py
    # LabelEncoding; conditional models one-hot these)
    all_labels: tuple = ()

    @property
    def img_shape(self) -> tuple[int, int]:
        if self.horizontal_coordinates is None:
            raise ValueError("DatasetInfo has no horizontal coordinates")
        return self.horizontal_coordinates.shape

    @property
    def gridded_operations(self) -> GriddedOperations:
        if self.horizontal_coordinates is None:
            raise ValueError("DatasetInfo has no horizontal coordinates")
        ops = self.horizontal_coordinates.get_gridded_operations()
        if (
            self.mask_provider is not None
            and getattr(self.mask_provider, "masks", None)
            and hasattr(ops, "_mask_provider")
        ):
            # per-variable masks zero the area weight of masked cells in
            # every scalar metric (reference: fme/core/gridded_ops.py:271
            # _spatial_mask_area_weights + :290 mask-provider ctor)
            ops._mask_provider = self.mask_provider
        return ops

    @property
    def atmosphere_vertical_coordinate(
        self,
    ) -> HybridSigmaPressureCoordinate | None:
        if isinstance(self.vertical_coordinate, HybridSigmaPressureCoordinate):
            return self.vertical_coordinate
        return None

    @property
    def depth_coordinate(self) -> DepthCoordinate | None:
        if isinstance(self.vertical_coordinate, DepthCoordinate):
            return self.vertical_coordinate
        return None

    def assert_compatible_with(self, other: "DatasetInfo"):
        """Check the other dataset can be used with a model trained on this
        one (reference: fme/core/dataset_info.py assert_compatible_with,
        used at fme/ace/inference/inference.py:416).
        """
        if (
            self.horizontal_coordinates is not None
            and other.horizontal_coordinates is not None
        ):
            if self.horizontal_coordinates != other.horizontal_coordinates:
                raise IncompatibleDatasetInfo(
                    "horizontal coordinates differ between datasets"
                )
        if self.timestep is not None and other.timestep is not None:
            if self.timestep != other.timestep:
                raise IncompatibleDatasetInfo(
                    f"timesteps differ: {self.timestep} vs {other.timestep}"
                )
        if (
            isinstance(self.vertical_coordinate, HybridSigmaPressureCoordinate)
            and isinstance(other.vertical_coordinate, HybridSigmaPressureCoordinate)
            and self.vertical_coordinate != other.vertical_coordinate
        ):
            raise IncompatibleDatasetInfo("vertical coordinates differ")

    def update_variable_metadata(
        self, metadata: dict[str, VariableMetadata]
    ) -> "DatasetInfo":
        merged = {**self.variable_metadata, **metadata}
        return dataclasses.replace(self, variable_metadata=merged)

    def get_state(self) -> dict:
        state: dict = {"variable_metadata": {
            k: {"units": v.units, "long_name": v.long_name}
            for k, v in self.variable_metadata.items()
        }}
        if self.horizontal_coordinates is not None:
            state["horizontal_coordinates"] = self.horizontal_coordinates.as_dict()
        if self.vertical_coordinate is not None and not isinstance(
            self.vertical_coordinate, NullVerticalCoordinate
        ):
            state["vertical_coordinate"] = serialize_vertical_coordinate(
                self.vertical_coordinate
            )
        if self.timestep is not None:
            state["timestep_seconds"] = self.timestep.total_seconds()
        if self.mask_provider is not None and self.mask_provider.masks:
            state["mask_provider"] = self.mask_provider.get_state()
        if self.all_labels:
            state["all_labels"] = list(self.all_labels)
        return state

    @classmethod
    def from_state(cls, state: dict) -> "DatasetInfo":
        horizontal = None
        if "horizontal_coordinates" in state:
            hc = state["horizontal_coordinates"]
            if "nside" in hc:
                horizontal = HEALPixCoordinates.from_nside(hc["nside"])
            else:
                horizontal = LatLonCoordinates(
                    lat=np.asarray(hc["lat"]), lon=np.asarray(hc["lon"])
                )
        vertical: VerticalCoordinate | None = None
        if "vertical_coordinate" in state:
            vertical = deserialize_vertical_coordinate(state["vertical_coordinate"])
        timestep = None
        if state.get("timestep_seconds") is not None:
            timestep = timedelta(seconds=state["timestep_seconds"])
        metadata = {
            k: VariableMetadata(units=v["units"], long_name=v["long_name"])
            for k, v in state.get("variable_metadata", {}).items()
        }
        mask_provider = None
        if "mask_provider" in state:
            from ace_tpu.core.masking import MaskProvider

            mask_provider = MaskProvider.from_state(state["mask_provider"])
        return cls(
            horizontal_coordinates=horizontal,
            vertical_coordinate=vertical,
            timestep=timestep,
            variable_metadata=metadata,
            mask_provider=mask_provider,
            all_labels=tuple(state.get("all_labels", ())),
        )
