"""The default single-module step
(reference: fme/core/step/single_module.py:48,261,595).

Pipeline per step: normalize inputs -> pack channels -> module forward ->
unpack -> denormalize -> corrector -> ocean SST prescription -> prescribed
prognostic overwrite. All of it is a pure function of (params, StepArgs).
"""

import dataclasses
from typing import Any

import jax

from ace_tpu.core.corrector.atmosphere import (
    AtmosphereCorrector,
    AtmosphereCorrectorConfig,
)
from ace_tpu.core.corrector.registry import CorrectorSelector
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
from ace_tpu.core.masking import VariableMaskingConfig
from ace_tpu.core.step.secondary_decoder import SecondaryDecoderConfig
from ace_tpu.core.step.global_mean_removal import (
    GlobalMeanRemovalConfig,
    extra_channel_source_field,
)
from ace_tpu.core.typing_ import TensorDict, TensorMapping
from ace_tpu.models.registry import ModuleSelector


def make_rngs(rng):
    """Split a step rng into the flax PRNG collections used by modules."""
    if rng is None:
        return None
    k_drop, k_noise = jax.random.split(rng)
    return {"dropout": k_drop, "noise": k_noise}


def split_rngs(rngs, n: int):
    """Derive ``n`` independent rng-collection dicts from one, so sibling
    modules in a multi-module step draw independent dropout/noise (the
    reference's separate torch modules each own their RNG stream)."""
    if rngs is None:
        return [None] * n
    return [
        {name: jax.random.fold_in(key, i) for name, key in rngs.items()}
        for i in range(n)
    ]


def apply_input_mask(input_norm: TensorDict, presence: TensorMapping):
    """Zero masked channels of normalized inputs
    (reference: single_module.py _apply_input_mask). ``presence`` maps a
    channel name to a bool scalar (dropout, batch-shared) or a [batch]
    vector (data_mask); absent keys are fully present.
    """
    import jax.numpy as jnp

    result = dict(input_norm)
    for name, mask in presence.items():
        if name not in result:
            continue
        t = result[name]
        m = jnp.asarray(mask)
        if m.ndim > 0:  # [batch] -> broadcast over spatial dims
            m = m.reshape(-1, *(1,) * (t.ndim - 1))
        result[name] = jnp.where(m, t, 0.0)
    return result


def step_with_adjustments(
    args: StepArgs,
    network_calls,
    normalizer: StandardNormalizer,
    corrector,
    ocean,
    residual_prediction: bool,
    prognostic_names: list[str],
    prescribed_prognostic_names: list[str],
    global_mean_removal=None,
) -> StepOutput:
    """Shared step pipeline around the network call(s): normalize ->
    network -> denormalize -> corrector -> ocean -> prescribed overwrite
    (reference: fme/core/step/single_module.py:595 step_with_adjustments).

    ``network_calls(input_norm, rngs) -> output_norm`` runs the module(s) on
    the normalized input dict.
    """
    input_data = args.input
    next_step_input_data = args.next_step_input_data

    gmr_state = None
    if global_mean_removal is not None:
        network_input, gmr_state = global_mean_removal.forward_transform(
            input_data
        )
        input_norm = normalizer.normalize(dict(network_input))
        # synthetic global-mean channels are already normalized
        input_norm = {**input_norm, **gmr_state.extras}
    else:
        input_norm = normalizer.normalize(dict(input_data))
    output_norm = network_calls(input_norm, make_rngs(args.rng))
    if residual_prediction:
        # network output is added to the normalized input for prognostics
        # (reference: single_module.py add_names semantics)
        for name in prognostic_names:
            output_norm[name] = output_norm[name] + input_norm[name]
    output: TensorDict = normalizer.denormalize(output_norm)
    if global_mean_removal is not None:
        output = global_mean_removal.inverse_transform(output, gmr_state)

    stepper_state = dict(args.stepper_state)
    diagnostics: TensorDict = {}
    if corrector is not None and args.corrector_disabled:
        # epoch-scheduled disabling (reference: corrector/registry.py:56
        # EpochScheduledCorrector): train-mode steps skip the corrector
        # during the first corrector_disabled_epochs epochs
        corrector = None
    if corrector is not None:
        result = corrector(
            input_data, output, next_step_input_data,
            stepper_state.get("corrector", {}),
        )
        output = result.corrected
        diagnostics = result.delta
        stepper_state["corrector"] = result.corrector_state

    if ocean is not None:
        overlap = {ocean.surface_temperature_name} & set(diagnostics)
        if overlap:
            raise ValueError(
                "ocean-prescribed names overlap corrector-modified names: "
                f"{sorted(overlap)}"
            )
        output = ocean(input_data, output, next_step_input_data)

    for name in prescribed_prognostic_names:
        if name not in next_step_input_data:
            raise ValueError(
                f"prescribed_prognostic_name {name!r} not in "
                "next_step_input_data"
            )
        output = {**output, name: next_step_input_data[name]}
    if prescribed_prognostic_names:
        diagnostics = {
            k: v for k, v in diagnostics.items()
            if k not in prescribed_prognostic_names
        }

    return StepOutput(
        output=output,
        stepper_state=stepper_state,
        corrector_diagnostics=diagnostics,
    )


@StepSelector.register("single_module")
@StepSelector.register("default")
@dataclasses.dataclass
class SingleModuleStepConfig(StepConfigABC):
    """Configuration for the single-module step
    (reference: fme/core/step/single_module.py:48).
    """

    builder: ModuleSelector
    in_names: list[str]
    out_names: list[str]
    normalization: NetworkAndLossNormalizationConfig
    ocean: OceanConfig | None = None
    corrector: AtmosphereCorrectorConfig | CorrectorSelector = (
        dataclasses.field(default_factory=AtmosphereCorrectorConfig)
    )
    next_step_forcing_names: list[str] = dataclasses.field(default_factory=list)
    prescribed_prognostic_names: list[str] = dataclasses.field(
        default_factory=list
    )
    residual_prediction: bool = False
    global_mean_removal: GlobalMeanRemovalConfig | None = None
    include_channel_mask_inputs: bool = False
    input_dropout: VariableMaskingConfig | None = None
    secondary_decoder: SecondaryDecoderConfig | None = None

    def __post_init__(self):
        if self.global_mean_removal is not None:
            self.global_mean_removal.validate_names(
                self.in_names, self.out_names
            )
        for name in self.prescribed_prognostic_names:
            if name not in self.out_names:
                raise ValueError(
                    f"prescribed_prognostic_name {name!r} must be in out_names"
                )
        for name in self.next_step_forcing_names:
            if name not in self.in_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} not in in_names"
                )
            if name in self.out_names:
                raise ValueError(
                    f"next_step_forcing_name {name!r} is an output variable"
                )
        if self.secondary_decoder is not None:
            for name in self.secondary_decoder.secondary_diagnostic_names:
                if name in self.in_names or name in self.out_names:
                    raise ValueError(
                        f"secondary_diagnostic_name {name!r} is already an "
                        "input or output variable"
                    )

    @property
    def input_names(self) -> list[str]:
        if self.ocean is None:
            return list(self.in_names)
        return sorted(set(self.in_names) | set(self.ocean.forcing_names))

    @property
    def output_names(self) -> list[str]:
        secondary = (
            self.secondary_decoder.secondary_diagnostic_names
            if self.secondary_decoder is not None
            else []
        )
        return list(self.out_names) + list(secondary)

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
        return sorted(set(self.in_names) | set(self.output_names))

    def get_step(self, dataset_info: DatasetInfo) -> "SingleModuleStep":
        return SingleModuleStep(config=self, dataset_info=dataset_info)

    def get_state(self) -> dict[str, Any]:
        from ace_tpu.core.config import to_dict

        state = to_dict(self)
        state["builder"] = self.builder.get_state()
        return state


class SingleModuleStep(StepABC):
    def __init__(self, config: SingleModuleStepConfig,
                 dataset_info: DatasetInfo):
        self._config = config
        self._dataset_info = dataset_info
        self.normalizer: StandardNormalizer = (
            config.normalization.build_network_normalizer(
                config._normalize_names
            )
        )
        self.global_mean_removal = (
            config.global_mean_removal.build(self.normalizer)
            if config.global_mean_removal is not None
            else None
        )
        extra_names = (
            self.global_mean_removal.extra_channel_names
            if self.global_mean_removal is not None
            else []
        )
        packed_in_names = list(config.in_names) + extra_names
        self.input_masking = (
            config.input_dropout.build(packed_in_names)
            if config.input_dropout is not None
            else None
        )
        n_in_channels = len(packed_in_names)
        if config.include_channel_mask_inputs:
            # one presence channel per input channel (reference:
            # single_module.py include_channel_mask_inputs)
            n_in_channels *= 2
        self.module = config.builder.build(
            n_in_channels=n_in_channels,
            n_out_channels=len(config.out_names),
            dataset_info=dataset_info,
        )
        self.in_packer = Packer(packed_in_names)
        self.out_packer = Packer(config.out_names)
        self.secondary_decoder = (
            config.secondary_decoder.build(
                n_in_channels=len(config.out_names),
                dataset_info=dataset_info,
            )
            if config.secondary_decoder is not None
            else None
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
            if dataset_info.timestep is None:
                raise ValueError("corrector requires dataset_info.timestep")
            if isinstance(config.corrector, CorrectorSelector):
                self.corrector = (
                    config.corrector.build_from_dataset_info(dataset_info)
                )
            else:
                self.corrector = config.corrector.build(
                    dataset_info.gridded_operations,
                    dataset_info.atmosphere_vertical_coordinate,
                    dataset_info.timestep,
                )
        else:
            self.corrector = None

    @property
    def config(self) -> SingleModuleStepConfig:
        return self._config

    @property
    def dataset_info(self) -> DatasetInfo:
        return self._dataset_info

    def init_params(self, rng: jax.Array):
        import jax.numpy as jnp

        # img_shape is (lat, lon) or (face, height, width) for HEALPix
        spatial = tuple(self._dataset_info.img_shape)
        n_in = len(self.in_packer.names)
        if self._config.include_channel_mask_inputs:
            n_in *= 2
        dummy = jnp.zeros((1, *spatial, n_in))
        if self.secondary_decoder is None:
            return self.module.init(rng, dummy)
        k_main, k_sec = jax.random.split(rng)
        return {
            "main": self.module.init(k_main, dummy),
            "secondary_decoder": self.secondary_decoder.init_params(
                k_sec, spatial
            ),
        }

    def init_stepper_state(self, input_data: TensorMapping) -> StepperState:
        state: StepperState = {}
        if self.corrector is not None:
            state["corrector"] = self.corrector.init_state(input_data)
        return state

    def step(self, params: Any, args: StepArgs) -> StepOutput:
        import jax.numpy as jnp

        config = self._config
        dropout_presence = self._draw_input_dropout_presence(args)

        def network_calls(input_norm, rngs):
            if args.data_mask is not None:
                # GMR extra sentinels share their source field's mask
                data_presence = {}
                for name in self.in_packer.names:
                    source = extra_channel_source_field(name)
                    lookup = source if source is not None else name
                    if lookup in args.data_mask:
                        data_presence[name] = args.data_mask[lookup]
                input_norm = apply_input_mask(input_norm, data_presence)
            if dropout_presence is not None:
                input_norm = apply_input_mask(input_norm, dropout_presence)
            packed = self.in_packer.pack(
                {k: input_norm[k] for k in self.in_packer.names}
            )
            if config.include_channel_mask_inputs:
                batch = packed.shape[0]
                spatial = packed.shape[1:-1]
                mask_dict = {}
                for name in self.in_packer.names:
                    source = extra_channel_source_field(name)
                    lookup = source if source is not None else name
                    real = jnp.ones((batch,), bool)
                    if args.data_mask is not None and lookup in args.data_mask:
                        real = jnp.asarray(args.data_mask[lookup], bool)
                    if (
                        dropout_presence is not None
                        and name in dropout_presence
                    ):
                        real = real & dropout_presence[name]
                    mask_dict[name] = jnp.broadcast_to(
                        real.astype(packed.dtype).reshape(
                            -1, *(1,) * len(spatial)
                        ),
                        (batch, *spatial),
                    )
                mask_packed = self.in_packer.pack(mask_dict)
                packed = jnp.concatenate([packed, mask_packed], axis=-1)
            main_params = (
                params["main"] if self.secondary_decoder is not None
                else params
            )
            kwargs = {}
            if getattr(self.module, "n_labels", 0):
                kwargs["labels"] = args.labels
            out_packed = self.module.apply(
                main_params, packed,
                deterministic=args.deterministic, rngs=rngs, **kwargs,
            )
            output = self.out_packer.unpack(out_packed)
            if self.secondary_decoder is not None:
                # decodes from a stop_gradient of the main outputs
                # (reference: single_module.py:430 detach semantics);
                # independent rng stream from the main module
                output.update(
                    self.secondary_decoder(
                        params["secondary_decoder"], out_packed,
                        deterministic=args.deterministic,
                        rngs=split_rngs(rngs, 2)[1],
                    )
                )
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
            global_mean_removal=self.global_mean_removal,
        )

    def _draw_input_dropout_presence(self, args: StepArgs):
        """Per-channel presence dict for synthetic input dropout, or None.

        Sampled fresh per step from a fold of the step rng; inert during
        deterministic (eval/inference) steps (reference:
        single_module.py:451 _draw_input_dropout_mask). The mask is shared
        across the batch, as in the reference.
        """
        if (
            self.input_masking is None
            or args.deterministic
            or args.rng is None
        ):
            return None
        key = jax.random.fold_in(args.rng, 0x1D50)
        presence = self.input_masking.sample_presence(key)
        return {
            name: presence[i]
            for i, name in enumerate(self.in_packer.names)
        }

    def get_state(self) -> dict[str, Any]:
        return {
            "config": self._config.get_state(),
            "dataset_info": self._dataset_info.get_state(),
            "normalizer": self.normalizer.get_state(),
        }
