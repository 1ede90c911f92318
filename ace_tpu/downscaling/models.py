"""Diffusion downscaling model: config surface, training step, generation
(reference: fme/downscaling/models.py:145 DiffusionModelConfig,
DiffusionModel :346).

Single-timestep conditional generation (coarse fields -> fine fields),
distinct from the autoregressive stepper stack.
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.normalizer import NormalizationConfig, StandardNormalizer
from ace_tpu.core.packer import Packer
from ace_tpu.downscaling.diffusion import (
    LogNormalNoiseDistribution,
    LogUniformNoiseDistribution,
    edm_loss,
    edm_precondition,
    make_moe_denoiser,
    stochastic_sampler,
    validate_sigma_ranges,
)
from ace_tpu.downscaling.unet import DiffusionUNet
from ace_tpu.core.typing_ import TensorDict, TensorMapping


@dataclasses.dataclass
class PairedNormalizationConfig:
    """Separate normalization for coarse (input) and fine (output) data
    (reference: downscaling PairedNormalizationConfig).
    """

    fine: NormalizationConfig
    coarse: NormalizationConfig


@dataclasses.dataclass
class UNetConfig:
    base_channels: int = 64
    channel_mults: list[int] = dataclasses.field(
        default_factory=lambda: [1, 2, 2]
    )
    num_res_blocks: int = 2
    attn_levels: list[int] = dataclasses.field(default_factory=list)
    bottleneck_attention: bool = True
    num_heads: int = 4
    compute_dtype: str = "float32"


@dataclasses.dataclass
class SongUNetV2Config:
    """SongUNet v2 backbone options (reference:
    fme/downscaling/modules/diffusion_registry.py:102
    UNetDiffusionSongv2)."""

    model_channels: int = 128
    channel_mult: list[int] = dataclasses.field(
        default_factory=lambda: [1, 2, 2, 2]
    )
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: list[int] = dataclasses.field(
        default_factory=lambda: [16]
    )
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"
    channel_mult_noise: int = 1
    encoder_type: str = "standard"
    decoder_type: str = "standard"
    resample_filter: list[int] = dataclasses.field(
        default_factory=lambda: [1, 1]
    )
    act: str = "silu"
    # accepted for reference-config compatibility; the XLA GroupNorm is
    # always channels-last-fused, so there is nothing to toggle
    use_apex_gn: bool = True
    bottleneck_attention: bool = True
    # >= 1: per-block activation rematerialization
    checkpointing: int = 0
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.act != "silu":
            raise ValueError("only act='silu' is supported")


@dataclasses.dataclass
class DiffusionModuleSelector:
    """{type, config} backbone selection (reference:
    fme/downscaling/modules/diffusion_registry.py:170
    DiffusionModuleRegistrySelector). Types: "unet_diffusion_song_v2"
    (SongUNetV2Config) and "unet" (the compact UNetConfig)."""

    type: str
    config: dict = dataclasses.field(default_factory=dict)
    expects_interpolated_input: bool | None = None

    def __post_init__(self):
        from ace_tpu.core.config import from_dict

        if self.type in ("unet_diffusion_song", "unet_diffusion_song_v2"):
            # v1 ("unet_diffusion_song", physicsnemo_unets_v1) computes
            # the same forward as v2 — the reference's v2 vendorization
            # adds infrastructure (apex norms, profiling, recursive
            # properties), not math — so one port serves both registry
            # names (reference: diffusion_registry.py:217-219)
            self.instance = from_dict(SongUNetV2Config, self.config)
        elif self.type == "unet":
            self.instance = from_dict(UNetConfig, self.config)
        else:
            raise ValueError(
                f"unknown diffusion module type {self.type!r}; known: "
                "['unet', 'unet_diffusion_song', 'unet_diffusion_song_v2']"
            )
        if self.expects_interpolated_input is None:
            # both supported backbones run at the (interpolated) fine
            # resolution, matching the reference's EXPECTS_INTERPOLATED
            self.expects_interpolated_input = True


def _build_net(module_cfg, out_channels: int, cond_channels: int,
               fine_shape: tuple[int, int]):
    """Build the raw denoiser network from either the legacy compact
    UNetConfig or a DiffusionModuleSelector."""
    cfg = getattr(module_cfg, "instance", module_cfg)
    if isinstance(cfg, SongUNetV2Config):
        from ace_tpu.downscaling.song_unet import SongUNetV2

        return SongUNetV2(
            img_resolution=min(fine_shape),
            # latents + conditioning, the reference's
            # n_in_channels_conditioned (diffusion_registry.py:131)
            in_channels=out_channels + cond_channels,
            out_channels=out_channels,
            model_channels=cfg.model_channels,
            channel_mult=tuple(cfg.channel_mult),
            channel_mult_emb=cfg.channel_mult_emb,
            num_blocks=cfg.num_blocks,
            attn_resolutions=tuple(cfg.attn_resolutions),
            dropout=cfg.dropout,
            label_dropout=cfg.label_dropout,
            embedding_type=cfg.embedding_type,
            channel_mult_noise=cfg.channel_mult_noise,
            encoder_type=cfg.encoder_type,
            decoder_type=cfg.decoder_type,
            resample_filter=tuple(cfg.resample_filter),
            bottleneck_attention=cfg.bottleneck_attention,
            checkpointing=cfg.checkpointing,
            dtype=jnp.dtype(cfg.compute_dtype),
        )
    return DiffusionUNet(
        out_channels=out_channels,
        base_channels=cfg.base_channels,
        channel_mults=tuple(cfg.channel_mults),
        num_res_blocks=cfg.num_res_blocks,
        attn_levels=tuple(cfg.attn_levels),
        bottleneck_attention=cfg.bottleneck_attention,
        num_heads=cfg.num_heads,
        dtype=jnp.dtype(cfg.compute_dtype),
    )


@dataclasses.dataclass
class LossWeightsConfig:
    """(reference: fme/downscaling/models.py:81 LossWeightsConfig).

    output_channels: per-variable multiplicative loss weights (missing
    variables default to 1). noise_weight_exponent: exponent on the EDM
    noise-level weight; <1 reduces the dominance of low-noise samples.
    """

    output_channels: dict[str, float] = dataclasses.field(
        default_factory=dict
    )
    noise_weight_exponent: float = 1.0


@dataclasses.dataclass
class DiffusionModelConfig:
    """(reference: fme/downscaling/models.py:145)."""

    in_names: list[str]
    out_names: list[str]
    normalization: PairedNormalizationConfig
    # legacy compact-UNet fields directly, or a {type, config} selector
    # (reference: DiffusionModuleRegistrySelector) choosing
    # "unet_diffusion_song_v2" or "unet"
    module: UNetConfig | DiffusionModuleSelector = dataclasses.field(
        default_factory=UNetConfig
    )
    downscale_factor: int = 1
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    # inputs are standard-score normalized, so the data std is 1
    # (reference models.py:258-261 hardcodes sigma_data=1.0)
    sigma_data: float = 1.0
    churn: float = 0.0
    num_diffusion_generation_steps: int = 18
    predict_residual: bool = False
    # append normalized fine-grid static fields (e.g. topography) to the
    # upsampled conditioning channels (reference: fme/downscaling/
    # models.py:185 use_fine_topography + data/static.py StaticInputs)
    use_fine_topography: bool = False
    loss_weights: LossWeightsConfig = dataclasses.field(
        default_factory=LossWeightsConfig
    )
    training_noise_distribution: (
        LogNormalNoiseDistribution | LogUniformNoiseDistribution | None
    ) = None
    # inner reconstruction loss of the EDM objective; only MSE is
    # supported (the weighted-MSE EDM objective; reference:
    # models.py:176 loss: LossConfig)
    loss: dict | None = None
    # deprecated noise-distribution spelling (reference: models.py:193
    # p_mean/p_std; folded into training_noise_distribution)
    p_mean: float | None = None
    p_std: float | None = None

    def __post_init__(self):
        if self.loss is not None:
            loss_type = (self.loss or {}).get("type", "MSE")
            if loss_type != "MSE":
                raise NotImplementedError(
                    f"diffusion loss type {loss_type!r}; the EDM "
                    "objective supports MSE only"
                )
        if self.p_mean is not None or self.p_std is not None:
            if self.training_noise_distribution is not None:
                raise ValueError(
                    "specify training_noise_distribution only; "
                    "p_mean/p_std are deprecated (reference: "
                    "models.py:203-213)"
                )
            self.training_noise_distribution = LogNormalNoiseDistribution(
                p_mean=self.p_mean if self.p_mean is not None else -1.2,
                p_std=self.p_std if self.p_std is not None else 1.2,
            )

    def build(self, dataset_info: DatasetInfo,
              static_inputs=None) -> "DiffusionModel":
        return DiffusionModel(self, dataset_info,
                              static_inputs=static_inputs)


class DiffusionModel:
    """EDM training/generation over named coarse/fine variables."""

    def __init__(self, config: DiffusionModelConfig,
                 dataset_info: DatasetInfo, static_inputs=None):
        self.config = config
        self.dataset_info = dataset_info
        # static_inputs: [H_fine, W_fine, n_static] normalized fields
        # appended to the conditioning when use_fine_topography is set
        # (reference: models.py:265 validation, :474 channel concat)
        if config.use_fine_topography and (
            static_inputs is None or static_inputs.shape[-1] == 0
        ):
            raise ValueError(
                "use_fine_topography is enabled but no static input "
                "fields were provided."
            )
        self.static_inputs = (
            jnp.asarray(static_inputs, jnp.float32)
            if static_inputs is not None else None
        )
        self.in_packer = Packer(config.in_names)
        self.out_packer = Packer(config.out_names)
        self.coarse_normalizer: StandardNormalizer = (
            config.normalization.coarse.build(config.in_names)
        )
        self.fine_normalizer: StandardNormalizer = (
            config.normalization.fine.build(config.out_names)
        )
        nlat, nlon = dataset_info.img_shape
        f = config.downscale_factor
        n_static = (
            self.static_inputs.shape[-1]
            if config.use_fine_topography else 0
        )
        self.net = _build_net(
            config.module,
            out_channels=len(config.out_names),
            cond_channels=len(config.in_names) + n_static,
            fine_shape=(nlat * f, nlon * f),
        )
        self.params: Any = None
        self._noise_dist = (
            config.training_noise_distribution
            or LogNormalNoiseDistribution()
        )

        def _sample(params, latents, cond, rng):
            return stochastic_sampler(
                self._denoiser(params), latents, cond, rng,
                num_steps=self.config.num_diffusion_generation_steps,
                sigma_min=self.config.sigma_min,
                sigma_max=self.config.sigma_max,
                S_churn=self.config.churn,
            )

        # one compiled sampler per (latent, cond) shape; reused across
        # patches/timesteps so patched generation compiles once
        self._jit_sample = jax.jit(_sample)

    def init_params(self, rng: jax.Array, img_shape=None):
        # img_shape is the COARSE conditioning shape; the UNet runs at the
        # fine resolution (coarse * downscale_factor)
        nlat, nlon = img_shape or self.dataset_info.img_shape
        f = self.config.downscale_factor
        n_static = (
            self.static_inputs.shape[-1]
            if self.config.use_fine_topography else 0
        )
        x = jnp.zeros((1, nlat * f, nlon * f, len(self.config.out_names)))
        cond = jnp.zeros(
            (1, nlat * f, nlon * f, len(self.config.in_names) + n_static)
        )
        sigma = jnp.zeros((1,))
        self.params = jax.jit(self.net.init)(rng, x, cond, sigma)
        return self.params

    def _denoiser(self, params, dropout_rng=None):
        def raw(x, cond, c_noise):
            if dropout_rng is not None and getattr(
                self.net, "dropout", 0.0
            ):
                # train-mode dropout (SongUNetV2; reference trains the
                # Song backbone with dropout=0.10 by default)
                return self.net.apply(
                    params, x, cond, c_noise, False,
                    rngs={"dropout": dropout_rng},
                )
            return self.net.apply(params, x, cond, c_noise)

        return edm_precondition(raw, sigma_data=self.config.sigma_data)

    def _pack(self, coarse: TensorMapping, fine: TensorMapping | None,
              static=None):
        cond = self.in_packer.pack(
            self.coarse_normalizer.normalize(dict(coarse))
        )
        f = self.config.downscale_factor
        if f > 1:
            # conditioning fields bilinearly upsampled to the fine grid
            # (reference: downscaling/models.py interpolated-input path)
            b, h, w, c = cond.shape
            cond = jax.image.resize(
                cond, (b, h * f, w * f, c), method="bilinear"
            )
        if self.config.use_fine_topography:
            # static: pre-sliced [h_fine, w_fine, n_static] for patched
            # calls; defaults to the model's full-grid fields
            static = static if static is not None else self.static_inputs
            if tuple(static.shape[:2]) != tuple(cond.shape[1:3]):
                raise ValueError(
                    f"static input shape {static.shape[:2]} does not "
                    f"match the fine spatial shape {cond.shape[1:3]}"
                )  # reference: models.py:476
            b = cond.shape[0]
            cond = jnp.concatenate(
                [cond, jnp.broadcast_to(static[None], (b, *static.shape))],
                axis=-1,
            )
        target = None
        if fine is not None:
            target = self.out_packer.pack(
                self.fine_normalizer.normalize(dict(fine))
            )
        return cond, target

    def _residual_base(self, coarse: TensorMapping):
        """Coarse-normalized output variables bilinearly upsampled to the
        fine grid — the base the network predicts a residual against
        (reference models.py:513-521 / :602-610)."""
        missing = [
            k for k in self.config.out_names if k not in coarse
        ]
        if missing:
            raise ValueError(
                "predict_residual requires every output variable in the "
                f"coarse data; missing {missing}"
            )
        base = self.out_packer.pack(
            self.coarse_normalizer.normalize(
                {k: coarse[k] for k in self.config.out_names}
            )
        )
        f = self.config.downscale_factor
        if f > 1:
            b, h, w, c = base.shape
            base = jax.image.resize(
                base, (b, h * f, w * f, c), method="bilinear"
            )
        return base

    def loss_fn(self, params, coarse: TensorMapping, fine: TensorMapping,
                rng: jax.Array, static=None):
        """EDM training loss on normalized fields."""
        cond, target = self._pack(coarse, fine, static=static)
        if self.config.predict_residual:
            target = target - self._residual_base(coarse)
        lw = self.config.loss_weights
        channel_weights = None
        if lw.output_channels:
            channel_weights = jnp.asarray([
                lw.output_channels.get(n, 1.0)
                for n in self.config.out_names
            ])
        rng, dropout_rng = jax.random.split(rng)
        return edm_loss(
            self._denoiser(params, dropout_rng=dropout_rng), rng, target,
            cond,
            noise_distribution=self._noise_dist,
            sigma_data=self.config.sigma_data,
            loss_weight_exponent=lw.noise_weight_exponent,
            channel_weights=channel_weights,
        )

    def generate(self, coarse: TensorMapping, rng: jax.Array,
                 params=None, n_samples: int = 1,
                 static=None) -> TensorDict:
        """Sample fine fields conditioned on coarse fields.

        Returns dict of [batch, n_samples, H, W] denormalized fields.
        """
        params = params if params is not None else self.params
        cond, _ = self._pack(coarse, None, static=static)
        batch, h, w = cond.shape[0], cond.shape[1], cond.shape[2]
        c_out = len(self.config.out_names)
        base = (
            self._residual_base(coarse)
            if self.config.predict_residual else None
        )
        outs = []
        for s in range(n_samples):
            rng, k_lat, k_samp = jax.random.split(rng, 3)
            latents = jax.random.normal(k_lat, (batch, h, w, c_out))
            sample = self._jit_sample(params, latents, cond, k_samp)
            if base is not None:
                sample = sample + base
            outs.append(sample)
        stacked = jnp.stack(outs, axis=1)  # [B, S, H, W, C]
        result = {}
        for i, name in enumerate(self.config.out_names):
            result[name] = stacked[..., i]
        return self.fine_normalizer.denormalize(result)

    def get_state(self) -> dict:
        from ace_tpu.core.config import to_dict

        return {"config": to_dict(self.config)}


@dataclasses.dataclass
class DenoisingExpertCheckpointConfig:
    """One expert checkpoint and the inclusive sigma interval it handles
    (reference: fme/downscaling/predictors/serial_denoising.py:21)."""

    checkpoint_path: str
    sigma_min: float
    sigma_max: float


@dataclasses.dataclass
class DenoisingMoEConfig:
    """Mixture of denoising experts specializing in different parts of
    the EDM sigma schedule (reference: serial_denoising.py:119
    DenoisingMoEConfig). Ranges must be non-overlapping and contiguous;
    the sampler's overall schedule spans the union.
    """

    denoising_expert_configs: list[DenoisingExpertCheckpointConfig]
    num_diffusion_generation_steps: int
    churn: float = 0.0

    def __post_init__(self):
        self.denoising_expert_configs = sorted(
            self.denoising_expert_configs, key=lambda c: c.sigma_min
        )

    def build(self) -> "DenoisingMoEPredictor":
        from ace_tpu.downscaling.train import load_downscaling_model

        experts = [
            load_downscaling_model(c.checkpoint_path)
            for c in self.denoising_expert_configs
        ]
        return DenoisingMoEPredictor(
            experts=experts,
            sigma_ranges=[
                (c.sigma_min, c.sigma_max)
                for c in self.denoising_expert_configs
            ],
            num_diffusion_generation_steps=(
                self.num_diffusion_generation_steps
            ),
            churn=self.churn,
        )


@dataclasses.dataclass
class CheckpointModelConfig:
    """Model loaded from a training checkpoint (reference:
    fme/downscaling/evaluator.py:173 CheckpointModelConfig in the model
    union)."""

    checkpoint_path: str

    def build(self):
        from ace_tpu.downscaling.train import load_downscaling_model

        return load_downscaling_model(self.checkpoint_path)


@dataclasses.dataclass
class DenoisingMoEBundledConfig:
    """Load a DenoisingMoEPredictor from one bundle written by
    ``DenoisingMoEPredictor.save`` (reference: serial_denoising.py:350
    DenoisingMoEBundledConfig)."""

    mixture_of_experts_path: str

    def build(self) -> "DenoisingMoEPredictor":
        return DenoisingMoEPredictor.load(self.mixture_of_experts_path)


def _validate_experts_compatible(experts: list[DiffusionModel]) -> None:
    """(reference: serial_denoising.py:53)."""
    primary = experts[0]

    def key(m):
        return (
            tuple(m.config.in_names), tuple(m.config.out_names),
            m.config.downscale_factor, m.config.sigma_data,
            m.config.predict_residual,
        )

    for m in experts[1:]:
        if key(m) != key(primary):
            raise ValueError(
                "All experts must share the same variable names, "
                f"downscale factor, and preconditioning; got {key(m)} "
                f"vs {key(primary)}."
            )


class DenoisingMoEPredictor:
    """Mixture of DiffusionModel experts, each used for part of the EDM
    sigma schedule; behaves like DiffusionModel for generation and
    patching (reference: serial_denoising.py:166 DenoisingMoEPredictor).
    The per-call expert routing is a lax.switch inside the compiled
    sampler (see diffusion.make_moe_denoiser), so generation stays one
    XLA program."""

    def __init__(self, experts: list[DiffusionModel],
                 sigma_ranges: list[tuple[float, float]],
                 num_diffusion_generation_steps: int,
                 churn: float = 0.0):
        if not experts:
            raise ValueError("experts must be non-empty.")
        if len(experts) != len(sigma_ranges):
            raise ValueError(
                "experts and sigma_ranges must have the same length."
            )
        validate_sigma_ranges(sigma_ranges)
        _validate_experts_compatible(experts)
        self._experts = experts
        self._primary = experts[0]
        self._sigma_ranges = [tuple(r) for r in sigma_ranges]
        self._num_steps = num_diffusion_generation_steps
        self._churn = churn

        def _sample(expert_params, latents, cond, rng):
            moe = make_moe_denoiser(
                self._sigma_ranges,
                [
                    e._denoiser(p)
                    for e, p in zip(self._experts, expert_params)
                ],
            )
            return stochastic_sampler(
                moe, latents, cond, rng,
                num_steps=self._num_steps,
                sigma_min=self._sigma_ranges[0][0],
                sigma_max=self._sigma_ranges[-1][1],
                S_churn=self._churn,
            )

        self._jit_sample = jax.jit(_sample)

    @property
    def config(self):
        # predictors and entry points read variable names and the
        # downscale factor off .config; experts are validated identical
        return self._primary.config

    @property
    def dataset_info(self):
        return self._primary.dataset_info

    @property
    def params(self):
        # experts carry their own params; entry points pass params=None
        return None

    @property
    def static_inputs(self):
        return self._primary.static_inputs

    def generate(self, coarse: TensorMapping, rng: jax.Array,
                 params=None, n_samples: int = 1,
                 static=None) -> TensorDict:
        """Same contract as DiffusionModel.generate; ``params`` is
        ignored (each expert owns its weights)."""
        primary = self._primary
        cond, _ = primary._pack(coarse, None, static=static)
        batch, h, w = cond.shape[0], cond.shape[1], cond.shape[2]
        c_out = len(primary.config.out_names)
        base = (
            primary._residual_base(coarse)
            if primary.config.predict_residual else None
        )
        expert_params = [e.params for e in self._experts]
        outs = []
        for _ in range(n_samples):
            rng, k_lat, k_samp = jax.random.split(rng, 3)
            latents = jax.random.normal(k_lat, (batch, h, w, c_out))
            sample = self._jit_sample(expert_params, latents, cond, k_samp)
            if base is not None:
                sample = sample + base
            outs.append(sample)
        stacked = jnp.stack(outs, axis=1)
        result = {
            name: stacked[..., i]
            for i, name in enumerate(primary.config.out_names)
        }
        return primary.fine_normalizer.denormalize(result)

    def save(self, path: str):
        """Bundle every expert plus routing/sampler parameters into one
        reloadable file (reference: serial_denoising.py:313 get_state)."""
        import json
        import os

        import numpy as np

        from ace_tpu.stepper.checkpoint import save_msgpack

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        from ace_tpu.core.config import to_dict

        payload: dict[str, Any] = {
            "moe_meta": json.dumps({
                "sigma_ranges": [list(r) for r in self._sigma_ranges],
                "num_diffusion_generation_steps": self._num_steps,
                "churn": self._churn,
                "n_experts": len(self._experts),
            }),
        }
        for i, expert in enumerate(self._experts):
            payload[f"expert_{i}"] = {
                "config": json.dumps(to_dict(expert.config)),
                "model_type": type(expert.config).__name__,
                "dataset_info": json.dumps(
                    expert.dataset_info.get_state()
                ),
                "params": jax.tree_util.tree_map(
                    np.asarray, expert.params
                ),
            }
        save_msgpack(path, payload)

    @classmethod
    def load(cls, path: str) -> "DenoisingMoEPredictor":
        import json

        from flax import serialization

        from ace_tpu.core.config import from_dict as cfg_from_dict
        from ace_tpu.core.dataset_info import DatasetInfo
        from ace_tpu.stepper.checkpoint import load_msgpack

        payload = load_msgpack(path)
        meta = json.loads(payload["moe_meta"])
        experts = []
        for i in range(meta["n_experts"]):
            blob = payload[f"expert_{i}"]
            config = cfg_from_dict(
                DiffusionModelConfig, json.loads(blob["config"])
            )
            info = DatasetInfo.from_state(
                json.loads(blob["dataset_info"])
            )
            model = config.build(info)
            template = jax.eval_shape(
                model.init_params, jax.random.PRNGKey(0)
            )
            model.params = serialization.from_state_dict(
                template, blob["params"]
            )
            experts.append(model)
        return cls(
            experts=experts,
            sigma_ranges=[
                (float(lo), float(hi)) for lo, hi in meta["sigma_ranges"]
            ],
            num_diffusion_generation_steps=int(
                meta["num_diffusion_generation_steps"]
            ),
            churn=float(meta["churn"]),
        )


class PatchPredictor:
    """Full-extent generation by compositing overlapping patch predictions
    (reference: fme/downscaling/predictors/composite.py:52 PatchPredictor).
    """

    def __init__(self, model: DiffusionModel,
                 coarse_patch_shape: tuple[int, int],
                 coarse_horizontal_overlap: int = 1):
        self.model = model
        self.coarse_patch_shape = coarse_patch_shape
        self.overlap = coarse_horizontal_overlap

    def generate(self, coarse: TensorMapping, rng: jax.Array,
                 params=None, n_samples: int = 1,
                 static=None) -> TensorDict:
        """``static`` is the fine-grid static field stack covering the
        SAME extent as ``coarse`` (defaults to the model's full grid);
        each patch slices its window from it."""
        from ace_tpu.downscaling.patching import (
            composite_patch_predictions,
            get_patches,
            scale_patch,
        )

        first = next(iter(coarse.values()))
        extent = first.shape[-2:]
        patches = get_patches(
            yx_extent=extent,
            yx_patch_extent=self.coarse_patch_shape,
            overlap=self.overlap,
            drop_partial_patches=False,
        )
        factor = self.model.config.downscale_factor
        full_static = (
            static if static is not None
            else getattr(self.model, "static_inputs", None)
        )
        use_static = (
            getattr(self.model.config, "use_fine_topography", False)
            and full_static is not None
        )
        predictions = []
        for patch in patches:
            sl_y, sl_x = patch.input_slice.y, patch.input_slice.x
            coarse_patch = {
                k: v[..., sl_y, sl_x] for k, v in coarse.items()
            }
            patch_static = None
            if use_static:
                # fine-grid static channels follow the patch
                patch_static = full_static[
                    sl_y.start * factor : sl_y.stop * factor,
                    sl_x.start * factor : sl_x.stop * factor,
                ]
            rng, sub = jax.random.split(rng)
            predictions.append(
                self.model.generate(
                    coarse_patch, sub, params=params,
                    n_samples=n_samples, static=patch_static,
                )
            )
        fine_patches = [scale_patch(p, factor) for p in patches]
        return composite_patch_predictions(predictions, fine_patches)


@dataclasses.dataclass
class DeterministicModelConfig:
    """Deterministic (regression) downscaling model
    (reference: fme/downscaling/_deterministic_models.py:24
    DeterministicModelConfig). module: "SwinIR" (pixel-shuffle
    super-resolution) or "interpolate" (bilinear baseline). Exposes the
    same loss_fn/generate API as DiffusionModel so trainers and
    predictors accept either.
    """

    in_names: list[str]
    out_names: list[str]
    normalization: PairedNormalizationConfig
    loss: str = "MSE"
    module: str = "SwinIR"
    downscale_factor: int = 1
    embed_dim: int = 96
    depths: list[int] = dataclasses.field(default_factory=lambda: [4, 4, 4])
    num_heads: int = 4
    window_size: list[int] = dataclasses.field(
        default_factory=lambda: [4, 8]
    )

    def build(self, dataset_info: DatasetInfo) -> "DeterministicModel":
        return DeterministicModel(self, dataset_info)


class DeterministicModel:
    def __init__(self, config: DeterministicModelConfig,
                 dataset_info: DatasetInfo):
        self.config = config
        self.dataset_info = dataset_info
        self.in_packer = Packer(config.in_names)
        self.out_packer = Packer(config.out_names)
        self.coarse_normalizer: StandardNormalizer = (
            config.normalization.coarse.build(config.in_names)
        )
        self.fine_normalizer: StandardNormalizer = (
            config.normalization.fine.build(config.out_names)
        )
        if config.module == "SwinIR":
            from ace_tpu.downscaling.swinir import SwinIR

            self.net = SwinIR(
                out_channels=len(config.out_names),
                upscale_factor=config.downscale_factor,
                embed_dim=config.embed_dim,
                depths=tuple(config.depths),
                num_heads=config.num_heads,
                window_size=tuple(config.window_size),
            )
        elif config.module == "interpolate":
            self.net = None  # bilinear baseline, no parameters
        else:
            raise ValueError(f"unknown module {config.module!r}")
        self.params: Any = None

    def init_params(self, rng: jax.Array, img_shape=None):
        nlat, nlon = img_shape or self.dataset_info.img_shape
        if self.net is None:
            self.params = {}
            return self.params
        x = jnp.zeros((1, nlat, nlon, len(self.config.in_names)))
        self.params = jax.jit(self.net.init)(rng, x)
        return self.params

    def _predict_norm(self, params, cond):
        f = self.config.downscale_factor
        if self.net is None:
            b, h, w, c = cond.shape
            up = jax.image.resize(
                cond, (b, h * f, w * f, c), method="bilinear"
            )
            # baseline predicts output vars by name-matching inputs
            idx = [
                self.config.in_names.index(n)
                for n in self.config.out_names
            ]
            return up[..., idx]
        return self.net.apply(params, cond)

    def loss_fn(self, params, coarse: TensorMapping, fine: TensorMapping,
                rng: jax.Array):
        cond = self.in_packer.pack(
            self.coarse_normalizer.normalize(dict(coarse))
        )
        target = self.out_packer.pack(
            self.fine_normalizer.normalize(dict(fine))
        )
        pred = self._predict_norm(params, cond)
        if self.config.loss == "MSE":
            return jnp.mean((pred - target) ** 2)
        if self.config.loss == "L1":
            return jnp.mean(jnp.abs(pred - target))
        raise ValueError(f"unknown loss {self.config.loss!r}")

    def generate(self, coarse: TensorMapping, rng: jax.Array,
                 params=None, n_samples: int = 1,
                 static=None) -> TensorDict:
        # static accepted for predictor-API compatibility; deterministic
        # models take no static conditioning
        params = params if params is not None else self.params
        cond = self.in_packer.pack(
            self.coarse_normalizer.normalize(dict(coarse))
        )
        pred = self._predict_norm(params, cond)
        stacked = jnp.repeat(pred[:, None], n_samples, axis=1)
        result = {
            name: stacked[..., i]
            for i, name in enumerate(self.config.out_names)
        }
        return self.fine_normalizer.denormalize(result)
