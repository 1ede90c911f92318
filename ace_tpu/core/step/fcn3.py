"""FCN3 step: grouped atmosphere/surface/forcing channels through
FourCastNet3 (reference: fme/ace/step/fcn3.py:36 FCN3Config,
FCN3StepConfig :149, FCN3Step :340).
"""

import dataclasses
from typing import Any, Literal

import jax

from ace_tpu.core.corrector.atmosphere import (
    AtmosphereCorrector,
    AtmosphereCorrectorConfig,
)
from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.normalizer import (
    NetworkAndLossNormalizationConfig,
    StandardNormalizer,
)
from ace_tpu.core.ocean import Ocean, OceanConfig
from ace_tpu.core.packer import Packer
from ace_tpu.core.step.base import (
    StepABC,
    StepArgs,
    StepConfigABC,
    StepOutput,
    StepperState,
    StepSelector,
)
from ace_tpu.core.step.single_module import step_with_adjustments, make_rngs
from ace_tpu.core.typing_ import TensorMapping


@dataclasses.dataclass
class FCN3Config:
    """(reference: fme/ace/step/fcn3.py:36 FCN3Config). Tensor
    factorization is not implemented (dense weights only).
    """

    model_grid_type: str = "legendre-gauss"
    sht_grid_type: str = "legendre-gauss"
    kernel_width: int = 3
    filter_basis_type: str = "morlet"
    scale_factor: int = 8
    encoder_mlp: bool = False
    upsample_sht: bool = False
    atmo_embed_dim: int = 8
    surf_embed_dim: int = 8
    aux_embed_dim: int = 8
    num_layers: int = 4
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    layer_scale: bool = True
    normalization_layer: str = "none"
    max_modes: int | None = None
    hard_thresholding_fraction: float = 1.0
    sfno_block_frequency: int = 2
    bias: bool = False

    def build(self, n_atmo_channels, n_atmo_groups, n_surf_channels,
              n_aux_channels, n_atmo_diagnostic_channels,
              n_surf_diagnostic_channels, dataset_info: DatasetInfo):
        from ace_tpu.models.fcn3 import FourCastNet3

        return FourCastNet3(
            img_shape=dataset_info.img_shape,
            n_atmo_channels=n_atmo_channels,
            n_atmo_groups=n_atmo_groups,
            n_surf_channels=n_surf_channels,
            n_aux_channels=n_aux_channels,
            n_atmo_diagnostic_channels=n_atmo_diagnostic_channels,
            n_surf_diagnostic_channels=n_surf_diagnostic_channels,
            model_grid_type=self.model_grid_type,
            sht_grid_type=self.sht_grid_type,
            kernel_shape=(self.kernel_width, self.kernel_width),
            filter_basis_type=self.filter_basis_type,
            scale_factor=self.scale_factor,
            encoder_mlp=self.encoder_mlp,
            upsample_sht=self.upsample_sht,
            atmo_embed_dim=self.atmo_embed_dim,
            surf_embed_dim=self.surf_embed_dim,
            aux_embed_dim=self.aux_embed_dim,
            num_layers=self.num_layers,
            use_mlp=self.use_mlp,
            mlp_ratio=self.mlp_ratio,
            activation_function=self.activation_function,
            layer_scale=self.layer_scale,
            normalization_layer=self.normalization_layer,
            max_modes=self.max_modes,
            hard_thresholding_fraction=self.hard_thresholding_fraction,
            sfno_block_frequency=self.sfno_block_frequency,
            use_bias=self.bias,
        )


@dataclasses.dataclass
class FCN3Selector:
    type: Literal["FCN3"]
    config: FCN3Config

    def build(self, **kwargs):
        return self.config.build(**kwargs)


@StepSelector.register("FCN3")
@dataclasses.dataclass
class FCN3StepConfig(StepConfigABC):
    """(reference: fme/ace/step/fcn3.py:149 FCN3StepConfig). Atmosphere
    channel naming is level-major with variables fastest: for level i the
    inputs are ``{name}_{i}`` for each prognostic name.
    """

    builder: FCN3Selector
    atmosphere_prognostic_names: list[str]
    atmosphere_diagnostic_names: list[str]
    atmosphere_levels: int
    surface_prognostic_names: list[str]
    surface_diagnostic_names: list[str]
    normalization: NetworkAndLossNormalizationConfig
    # defaulted because the base class exposes a same-named property (the
    # dataclass would otherwise treat the property object as a default)
    forcing_names: list[str] = dataclasses.field(default_factory=list)
    ocean: OceanConfig | None = None
    corrector: AtmosphereCorrectorConfig = dataclasses.field(
        default_factory=AtmosphereCorrectorConfig
    )
    next_step_forcing_names: list[str] = dataclasses.field(
        default_factory=list
    )
    prescribed_prognostic_names: list[str] = dataclasses.field(
        default_factory=list
    )
    residual_prediction: bool = False

    def __post_init__(self):
        for name in self.next_step_forcing_names:
            if name not in self.forcing_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} not in forcing_names"
                )
        atmosphere_in, atmosphere_out = [], []
        for i in range(self.atmosphere_levels):
            for name in self.atmosphere_prognostic_names:
                atmosphere_in.append(f"{name}_{i}")
                atmosphere_out.append(f"{name}_{i}")
            for name in self.atmosphere_diagnostic_names:
                atmosphere_out.append(f"{name}_{i}")
        self.atmosphere_input_names = atmosphere_in
        self.atmosphere_output_names = atmosphere_out
        self.surface_input_names = list(self.surface_prognostic_names)
        self.surface_output_names = (
            list(self.surface_prognostic_names)
            + list(self.surface_diagnostic_names)
        )
        self.in_names = (
            list(self.forcing_names)
            + self.atmosphere_input_names
            + self.surface_input_names
        )
        self.out_names = (
            self.atmosphere_output_names + self.surface_output_names
        )
        for name in self.prescribed_prognostic_names:
            if name not in self.out_names:
                raise ValueError(
                    f"prescribed_prognostic_name {name!r} not in out_names"
                )

    @property
    def input_names(self) -> list[str]:
        if self.ocean is None:
            return list(self.in_names)
        return sorted(set(self.in_names) | set(self.ocean.forcing_names))

    @property
    def output_names(self) -> list[str]:
        return list(self.out_names)

    @property
    def next_step_input_names(self) -> list[str]:
        result = set(self.input_names) - set(self.output_names)
        if self.ocean is not None:
            result |= set(self.ocean.forcing_names)
        result |= set(self.prescribed_prognostic_names)
        return sorted(result)

    def get_next_step_forcing_names(self) -> list[str]:
        return list(self.next_step_forcing_names)

    @property
    def _normalize_names(self) -> list[str]:
        return sorted(set(self.in_names) | set(self.out_names))

    def get_step(self, dataset_info: DatasetInfo) -> "FCN3Step":
        return FCN3Step(config=self, dataset_info=dataset_info)

    def get_state(self) -> dict[str, Any]:
        from ace_tpu.core.config import to_dict

        state = to_dict(self)
        # derived name lists are rebuilt in __post_init__
        for key in (
            "atmosphere_input_names", "atmosphere_output_names",
            "surface_input_names", "surface_output_names",
            "in_names", "out_names",
        ):
            state.pop(key, None)
        return state


# The base class defines ``forcing_names`` as a read-only property; give
# the FCN3 config a settable instance-backed override so the dataclass
# __init__ can assign the configured list through it.
FCN3StepConfig.forcing_names = property(
    lambda self: list(self.__dict__.get("forcing_names", [])),
    lambda self, v: self.__dict__.__setitem__("forcing_names", list(v)),
)


class FCN3Step(StepABC):
    """(reference: fme/ace/step/fcn3.py:340 FCN3Step)."""

    def __init__(self, config: FCN3StepConfig, dataset_info: DatasetInfo):
        self._config = config
        self._dataset_info = dataset_info
        self.forcing_packer = Packer(config.forcing_names)
        self.atmosphere_input_packer = Packer(
            config.atmosphere_input_names
        )
        self.atmosphere_output_packer = Packer(
            config.atmosphere_output_names
        )
        self.surface_input_packer = Packer(config.surface_input_names)
        self.surface_output_packer = Packer(config.surface_output_names)
        self.normalizer: StandardNormalizer = (
            config.normalization.build_network_normalizer(
                config._normalize_names
            )
        )
        self.module = config.builder.build(
            n_atmo_channels=(
                len(config.atmosphere_prognostic_names)
                + len(config.atmosphere_diagnostic_names)
            ),
            n_atmo_groups=config.atmosphere_levels,
            n_surf_channels=(
                len(config.surface_prognostic_names)
                + len(config.surface_diagnostic_names)
            ),
            n_aux_channels=len(config.forcing_names),
            n_atmo_diagnostic_channels=len(
                config.atmosphere_diagnostic_names
            ),
            n_surf_diagnostic_channels=len(
                config.surface_diagnostic_names
            ),
            dataset_info=dataset_info,
        )
        if config.ocean is not None:
            if dataset_info.timestep is None:
                raise ValueError("ocean requires dataset_info.timestep")
            self.ocean: Ocean | None = config.ocean.build(
                config.in_names, config.out_names, dataset_info.timestep
            )
        else:
            self.ocean = None
        if not config.corrector.is_noop:
            self.corrector: AtmosphereCorrector | None = (
                config.corrector.build(
                    dataset_info.gridded_operations,
                    dataset_info.atmosphere_vertical_coordinate,
                    dataset_info.timestep,
                )
            )
        else:
            self.corrector = None

    @property
    def config(self) -> FCN3StepConfig:
        return self._config

    @property
    def dataset_info(self) -> DatasetInfo:
        return self._dataset_info

    def init_params(self, rng: jax.Array):
        import jax.numpy as jnp

        cfg = self._config
        nlat, nlon = self._dataset_info.img_shape
        g = cfg.atmosphere_levels
        x_atmo = jnp.zeros(
            (1, nlat, nlon, g * len(cfg.atmosphere_prognostic_names))
        )
        x_surf = jnp.zeros(
            (1, nlat, nlon, len(cfg.surface_prognostic_names))
        )
        x_aux = jnp.zeros((1, nlat, nlon, len(cfg.forcing_names)))
        return self.module.init(rng, x_atmo, x_surf, x_aux)

    def init_stepper_state(self, input_data: TensorMapping) -> StepperState:
        state: StepperState = {}
        if self.corrector is not None:
            state["corrector"] = self.corrector.init_state(input_data)
        return state

    def step(self, params: Any, args: StepArgs) -> StepOutput:
        config = self._config
        if args.labels is not None:
            raise ValueError(
                "Labels are not supported for FCN3"
            )  # reference: fme/ace/step/fcn3.py:450

        def network_calls(input_norm, rngs):
            x_aux = self.forcing_packer.pack(input_norm)
            x_atmo = self.atmosphere_input_packer.pack(input_norm)
            x_surf = self.surface_input_packer.pack(input_norm)
            atmo_out, surf_out = self.module.apply(
                params, x_atmo, x_surf, x_aux,
                deterministic=args.deterministic, rngs=rngs,
            )
            output = self.atmosphere_output_packer.unpack(atmo_out)
            output.update(self.surface_output_packer.unpack(surf_out))
            return output

        return step_with_adjustments(
            args=args,
            network_calls=network_calls,
            normalizer=self.normalizer,
            corrector=self.corrector,
            ocean=self.ocean,
            residual_prediction=config.residual_prediction,
            prognostic_names=self.prognostic_names,
            prescribed_prognostic_names=config.prescribed_prognostic_names,
        )

    def get_state(self) -> dict[str, Any]:
        return {
            "config": self._config.get_state(),
            "dataset_info": self._dataset_info.get_state(),
            "normalizer": self.normalizer.get_state(),
        }
