"""Module (architecture) registry (reference: fme/core/registry/module.py).

Each registered config builds a flax.linen module from channel counts and
dataset info. The built module's contract:

    module.apply(params, x, deterministic=..., rngs=...) with
    x: [batch, nlat, nlon, n_in_channels] -> [batch, nlat, nlon, n_out]

(channels-last; the reference uses [b, c, h, w]).
"""

import abc
import dataclasses
from typing import Any, ClassVar

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.registry import Registry, Selector
from ace_tpu.models.sfno import SphericalFourierNeuralOperatorNet


@dataclasses.dataclass
class ModuleConfig(abc.ABC):
    @abc.abstractmethod
    def build(
        self,
        n_in_channels: int,
        n_out_channels: int,
        dataset_info: DatasetInfo,
    ) -> nn.Module: ...


# builders that support label conditioning (reference:
# fme/core/registry/module.py:61 CONDITIONAL_BUILDERS)
CONDITIONAL_BUILDERS = (
    "NoiseConditionedSFNO",
    "LocalNet",
    "SwinTransformer",
    "NoiseConditionedSwinTransformer",
)


@dataclasses.dataclass
class ModuleSelector(Selector):
    """Module builder selection (reference: fme/core/registry/module.py:119
    ModuleSelector).

    conditional: condition predictions on batch labels. When False
        (default) the model ignores dataset labels entirely; when True the
        dataset must define labels and the built module receives them
        (reference module.py:194-199).
    allow_missing_variables: the data pipeline may produce variable
        presence masks for incomplete datasets instead of erroring
        (reference module.py:139; threaded into DataRequirements).
    """

    conditional: bool = False
    allow_missing_variables: bool = False

    _registry: ClassVar[Registry] = Registry()

    def __post_init__(self):
        if self.conditional and self.type not in CONDITIONAL_BUILDERS:
            raise ValueError(
                "Conditional predictions require a conditional builder, "
                f"got {self.type} (available: {CONDITIONAL_BUILDERS})"
            )
        super().__post_init__()

    @classmethod
    def get_registry(cls) -> Registry:
        return cls._registry

    @classmethod
    def register(cls, name: str):
        return cls._registry.register(name)

    def get_state(self) -> dict:
        state = super().get_state()
        state["conditional"] = self.conditional
        state["allow_missing_variables"] = self.allow_missing_variables
        return state

    def build(self, n_in_channels, n_out_channels, dataset_info) -> nn.Module:
        if self.conditional and len(dataset_info.all_labels) == 0:
            raise ValueError("Conditional predictions require labels")
        if not self.conditional and dataset_info.all_labels:
            # unconditional models ignore dataset labels (the reference
            # only passes a LabelEncoding when conditional=True)
            dataset_info = dataclasses.replace(dataset_info, all_labels=())
        return self.instance.build(n_in_channels, n_out_channels, dataset_info)


@ModuleSelector.register("SphericalFourierNeuralOperatorNet")
@dataclasses.dataclass
class SphericalFourierNeuralOperatorBuilder(ModuleConfig):
    """SFNO builder with the reference's YAML field surface
    (reference: fme/ace/registry/sfno.py:14).
    """

    spectral_transform: str = "sht"
    filter_type: str = "linear"
    operator_type: str = "diagonal"
    scale_factor: int = 1
    residual_filter_factor: int = 1
    embed_dim: int = 256
    num_layers: int = 12
    hard_thresholding_fraction: float = 1.0
    normalization_layer: str = "instance_norm"
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: bool = True
    big_skip: bool = True
    rank: float = 1.0
    factorization: str | None = None
    separable: bool = False
    complex_network: bool = True
    complex_activation: str = "real"
    spectral_layers: int = 1
    checkpointing: int = 0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    data_grid: str = "legendre-gauss"
    # "default" | "high" (TF32-equivalent) | "highest" (true fp32)
    spectral_precision: str = "high"
    compute_dtype: str = "float32"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        if self.filter_type != "linear":
            raise NotImplementedError("only filter_type='linear' is supported")
        return SphericalFourierNeuralOperatorNet(
            img_shape=dataset_info.img_shape,
            in_chans=n_in_channels,
            out_chans=n_out_channels,
            spectral_transform=self.spectral_transform,
            spectral_precision=self.spectral_precision,
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            operator_type=self.operator_type,
            scale_factor=self.scale_factor,
            residual_filter_factor=self.residual_filter_factor,
            hard_thresholding_fraction=self.hard_thresholding_fraction,
            normalization_layer=self.normalization_layer,
            use_mlp=self.use_mlp,
            mlp_ratio=self.mlp_ratio,
            activation_function=self.activation_function,
            encoder_layers=self.encoder_layers,
            pos_embed=self.pos_embed,
            big_skip=self.big_skip,
            separable=self.separable,
            drop_rate=self.drop_rate,
            drop_path_rate=self.drop_path_rate,
            data_grid=self.data_grid,
            checkpointing=self.checkpointing,
            dtype=jnp.dtype(self.compute_dtype),
        )


@ModuleSelector.register("SFNO-v0.1.0")
@dataclasses.dataclass
class SFNO_V0_1_0(ModuleConfig):
    """SFNO at the makani-0.1.0 config surface (reference:
    fme/ace/registry/sfno.py:66). Built on the same TPU SFNO backbone;
    makani-specific extras (tensor factorization) land in a
    later round.
    """

    spectral_transform: str = "sht"
    filter_type: str = "linear"
    operator_type: str = "dhconv"
    scale_factor: int = 16
    embed_dim: int = 256
    num_layers: int = 12
    repeat_layers: int = 1
    hard_thresholding_fraction: float = 1.0
    normalization_layer: str = "instance_norm"
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: str = "direct"
    big_skip: bool = True
    rank: float = 1.0
    factorization: str | None = None
    separable: bool = False
    complex_activation: str = "real"
    spectral_layers: int = 1
    checkpointing: int = 0
    data_grid: str = "legendre-gauss"
    compute_dtype: str = "float32"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        return SphericalFourierNeuralOperatorNet(
            img_shape=dataset_info.img_shape,
            in_chans=n_in_channels,
            out_chans=n_out_channels,
            spectral_transform=self.spectral_transform,
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            operator_type=self.operator_type,
            scale_factor=self.scale_factor,
            hard_thresholding_fraction=self.hard_thresholding_fraction,
            normalization_layer=self.normalization_layer,
            use_mlp=self.use_mlp,
            mlp_ratio=self.mlp_ratio,
            activation_function=self.activation_function,
            encoder_layers=self.encoder_layers,
            pos_embed=self.pos_embed,
            repeat_layers=self.repeat_layers,
            big_skip=self.big_skip,
            separable=self.separable,
            factorization=self.factorization,
            rank=self.rank,
            data_grid=self.data_grid,
            checkpointing=self.checkpointing,
            dtype=jnp.dtype(self.compute_dtype),
        )


class _PrebuiltStore:
    """Process-global store for externally-constructed modules selected via
    the "prebuilt" registry entry (reference: fme/ace/registry/prebuilt.py,
    used heavily by tests).
    """

    modules: dict[str, nn.Module] = {}


def register_prebuilt_module(key: str, module: nn.Module):
    _PrebuiltStore.modules[key] = module


@ModuleSelector.register("prebuilt")
@dataclasses.dataclass
class PreBuiltBuilder(ModuleConfig):
    module_key: str = "default"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        return _PrebuiltStore.modules[self.module_key]


class LinearModule(nn.Module):
    """Trivial per-point linear net (test/baseline module, reference
    analog: fme/core/models/mlp/mlp.py).
    """

    out_channels: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dense(self.out_channels, name="linear")(x)


class MLPModule(nn.Module):
    """Small per-point MLP baseline (reference: fme/core/models/mlp)."""

    hidden_channels: int
    out_channels: int
    num_hidden_layers: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_hidden_layers):
            x = nn.gelu(nn.Dense(self.hidden_channels, name=f"hidden_{i}")(x), approximate=False)
        return nn.Dense(self.out_channels, name="out")(x)


@ModuleSelector.register("MLP")
@dataclasses.dataclass
class MLPBuilder(ModuleConfig):
    hidden_channels: int = 32
    num_hidden_layers: int = 1

    def build(self, n_in_channels, n_out_channels, dataset_info):
        return MLPModule(
            hidden_channels=self.hidden_channels,
            out_channels=n_out_channels,
            num_hidden_layers=self.num_hidden_layers,
        )


@ModuleSelector.register("Linear")
@dataclasses.dataclass
class LinearBuilder(ModuleConfig):
    def build(self, n_in_channels, n_out_channels, dataset_info):
        return LinearModule(out_channels=n_out_channels)


@ModuleSelector.register("NoiseConditionedSFNO")
@dataclasses.dataclass
class NoiseConditionedSFNOBuilder(ModuleConfig):
    """Noise-conditioned SFNO config with the reference's YAML surface
    (reference: fme/ace/registry/stochastic_sfno.py:181
    NoiseConditionedSFNOBuilder; the ACE2-ERA5 baseline architecture,
    configs/baselines/era5/ace-train-config-1-step-pretrain.yaml:96-109).
    """

    spectral_transform: str = "sht"
    filter_type: str = "linear"
    operator_type: str = "dhconv"
    residual_filter_factor: int = 1
    embed_dim: int = 256
    noise_embed_dim: int = 256
    context_pos_embed_dim: int = 0
    label_embed_dim: int = 0
    noise_type: str = "gaussian"  # "gaussian" | "isotropic"
    global_layer_norm: bool = False
    num_layers: int = 12
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: bool = True
    big_skip: bool = True
    rank: float = 1.0
    factorization: None = None
    separable: bool = False
    complex_network: bool = True
    complex_activation: str = "real"
    spectral_layers: int = 1
    checkpointing: int = 0
    data_grid: str = "legendre-gauss"
    filter_residual: bool = False
    filter_output: bool = False
    normalize_big_skip: bool = False
    affine_norms: bool = False
    filter_num_groups: int = 1
    local_blocks: list[int] | None = None
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "morlet"
    spectral_ratio: float = 1.0
    lora_rank: int = 0
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.operator_type != "dhconv":
            raise ValueError(
                "Only 'dhconv' operator_type is supported for "
                "NoiseConditionedSFNO models."
            )
        if self.separable:
            raise ValueError("'separable' is not supported")

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.conditional_sfno import NoiseConditionedSFNO

        return NoiseConditionedSFNO(
            img_shape=dataset_info.img_shape,
            in_chans=n_in_channels,
            out_chans=n_out_channels,
            embed_dim=self.embed_dim,
            noise_embed_dim=self.noise_embed_dim,
            noise_type=self.noise_type,
            num_layers=self.num_layers,
            operator_type=self.operator_type,
            mlp_ratio=self.mlp_ratio,
            activation_function=self.activation_function,
            encoder_layers=self.encoder_layers,
            use_mlp=self.use_mlp,
            pos_embed=self.pos_embed,
            big_skip=self.big_skip,
            normalize_big_skip=self.normalize_big_skip,
            affine_norms=self.affine_norms,
            global_layer_norm=self.global_layer_norm,
            filter_residual=self.filter_residual,
            filter_output=self.filter_output,
            residual_filter_factor=self.residual_filter_factor,
            local_blocks=(
                tuple(self.local_blocks)
                if self.local_blocks is not None
                else None
            ),
            kernel_shape=tuple(self.kernel_shape),
            basis_type=self.basis_type,
            spectral_ratio=self.spectral_ratio,
            lora_rank=self.lora_rank,
            n_labels=len(dataset_info.all_labels),
            label_embed_dim=self.label_embed_dim,
            data_grid=self.data_grid,
            checkpointing=self.checkpointing,
            dtype=jnp.dtype(self.compute_dtype),
        )


@ModuleSelector.register("Samudra")
@dataclasses.dataclass
class SamudraBuilder(ModuleConfig):
    """M2Lines Samudra ocean emulator config
    (reference: fme/ace/registry/m2lines.py:12).
    """

    ch_width: list[int] = dataclasses.field(
        default_factory=lambda: [200, 250, 300, 400]
    )
    n_layers: list[int] = dataclasses.field(
        default_factory=lambda: [1, 1, 1, 1]
    )
    dilation: list[int] = dataclasses.field(
        default_factory=lambda: [1, 2, 4, 8]
    )
    pad: str = "circular"
    norm: str = "instance"
    upscale_factor: int = 4
    zonally_periodic_upsample: bool = False
    compute_dtype: str = "float32"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.samudra import Samudra

        return Samudra(
            out_channels=n_out_channels,
            ch_width=tuple(self.ch_width),
            dilation=tuple(self.dilation),
            n_layers=tuple(self.n_layers),
            norm=self.norm,
            upscale_factor=self.upscale_factor,
            zonally_periodic_upsample=self.zonally_periodic_upsample,
            dtype=jnp.dtype(self.compute_dtype),
        )


@ModuleSelector.register("HEALPixUNet")
@dataclasses.dataclass
class HEALPixUNetBuilder(ModuleConfig):
    """DLWP-style HEALPix UNet config with the reference's encoder/decoder
    block-config surface (reference: fme/ace/registry/hpx.py:15; operates
    on [batch, 12, face, face, channel] data).
    """

    encoder: Any = None
    decoder: Any = None
    compute_dtype: str = "float32"

    def __post_init__(self):
        from ace_tpu.core.config import from_dict
        from ace_tpu.models.healpix import (
            UNetDecoderConfig,
            UNetEncoderConfig,
        )

        if isinstance(self.encoder, dict):
            self.encoder = from_dict(UNetEncoderConfig, self.encoder)
        if isinstance(self.decoder, dict):
            self.decoder = from_dict(UNetDecoderConfig, self.decoder)

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.healpix import HEALPixUNet

        if len(dataset_info.all_labels) > 0:
            raise ValueError("HEALPixUNet does not support labels")
        kwargs = {}
        if self.encoder is not None:
            kwargs["encoder"] = self.encoder
        if self.decoder is not None:
            kwargs["decoder"] = self.decoder
        return HEALPixUNet(
            out_channels=n_out_channels,
            dtype=jnp.dtype(self.compute_dtype),
            **kwargs,
        )


def _swin_lat_coords(dataset_info, use_cpb_scaling: bool):
    """1D latitudes for cos-lat CPB scaling, or None when disabled
    (reference: fme/ace/registry/swin_transformer.py use_cpb_scaling)."""
    if not use_cpb_scaling:
        return None
    coords = dataset_info.horizontal_coordinates
    lat = getattr(coords, "lat", None)
    if lat is None:
        raise ValueError(
            "SwinTransformer requires 1D latitude coordinates for "
            "cos-lat CPB scaling (set use_cpb_scaling=False to disable)"
        )
    return tuple(np.asarray(lat, np.float64).tolist())


def _swin_padding_kwargs(padding_conf):
    if not padding_conf or not padding_conf.get("activate", False):
        return {}
    return {
        "padding_mode": padding_conf.get("mode", "earth"),
        "pad_lat": tuple(padding_conf.get("pad_lat", [40, 40])),
        "pad_lon": tuple(padding_conf.get("pad_lon", [40, 40])),
    }


@ModuleSelector.register("NoiseConditionedSwinTransformer")
@dataclasses.dataclass
class NoiseConditionedSwinTransformerBuilder(ModuleConfig):
    """Stochastic Swin U-Net: fresh Gaussian noise each forward
    conditions every block's ConditionalLayerNorm (reference:
    fme/ace/registry/swin_transformer.py:132
    NoiseConditionedSwinTransformerBuilder).
    """

    embed_dim: int = 96
    depth_multiplier: int = 1
    num_heads: list[int] = dataclasses.field(
        default_factory=lambda: [3, 6, 6, 3]
    )
    window_size: list[int] = dataclasses.field(default_factory=lambda: [4, 8])
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    use_skip: bool = True
    mlp_layer: str = "mlp"
    noise_embed_dim: int = 256
    label_embed_dim: int = 0
    cpb_hidden_dim: int = 64
    padding_conf: dict | None = None
    use_cpb_scaling: bool = True
    compute_dtype: str = "float32"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.swin import SwinTransformerNet

        return SwinTransformerNet(
            out_channels=n_out_channels,
            img_shape=tuple(dataset_info.img_shape),
            embed_dim=self.embed_dim,
            depth_multiplier=self.depth_multiplier,
            num_heads=tuple(self.num_heads),
            window_size=(self.window_size[0], self.window_size[1]),
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            use_skip=self.use_skip,
            mlp_layer=self.mlp_layer,
            conditioning="cln",
            n_labels=len(dataset_info.all_labels),
            label_embed_dim=self.label_embed_dim,
            noise_embed_dim=self.noise_embed_dim,
            cpb_hidden_dim=self.cpb_hidden_dim,
            lat_coords=_swin_lat_coords(dataset_info, self.use_cpb_scaling),
            dtype=jnp.dtype(self.compute_dtype),
            **_swin_padding_kwargs(self.padding_conf),
        )


@ModuleSelector.register("SwinTransformer")
@dataclasses.dataclass
class SwinTransformerBuilder(ModuleConfig):
    """Deterministic Swin U-Net config (reference:
    fme/ace/registry/swin_transformer.py:38 SwinTransformerBuilder;
    AdaLN label conditioning when the dataset defines labels).
    """

    embed_dim: int = 96
    depth_multiplier: int = 1
    num_heads: list[int] = dataclasses.field(
        default_factory=lambda: [3, 6, 6, 3]
    )
    window_size: list[int] = dataclasses.field(default_factory=lambda: [4, 8])
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    use_skip: bool = True
    mlp_layer: str = "mlp"
    embed_dim_scalar: int = 0
    cpb_hidden_dim: int = 64
    padding_conf: dict | None = None
    use_cpb_scaling: bool = True
    compute_dtype: str = "float32"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.swin import SwinTransformerNet

        return SwinTransformerNet(
            out_channels=n_out_channels,
            img_shape=tuple(dataset_info.img_shape),
            embed_dim=self.embed_dim,
            depth_multiplier=self.depth_multiplier,
            num_heads=tuple(self.num_heads),
            window_size=(self.window_size[0], self.window_size[1]),
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            use_skip=self.use_skip,
            mlp_layer=self.mlp_layer,
            conditioning="adaln",
            embed_dim_scalar=self.embed_dim_scalar,
            n_labels=len(dataset_info.all_labels),
            cpb_hidden_dim=self.cpb_hidden_dim,
            lat_coords=_swin_lat_coords(dataset_info, self.use_cpb_scaling),
            dtype=jnp.dtype(self.compute_dtype),
            **_swin_padding_kwargs(self.padding_conf),
        )


class LandNetModule(nn.Module):
    """Per-column MLP land-surface net with optional learned positional
    embedding (reference: fme/ace/models/land/land_net.py via
    fme/ace/registry/land_net.py:9).
    """

    img_shape: tuple[int, int]
    hidden_dims: tuple[int, ...]
    out_channels: int
    use_positional_embedding: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # per-column 1x1 convs with ReLU, additive learned positional
        # embedding after the first hidden layer (reference:
        # land/land_net.py forward, land/layers.py)
        for i, dim in enumerate(self.hidden_dims):
            x = nn.relu(nn.Dense(dim, name=f"hidden_{i}")(x))
            if self.use_positional_embedding and i == 0:
                pe = self.param(
                    "pos_embed",
                    nn.initializers.normal(1.0),
                    (1, *self.img_shape, dim),
                    jnp.float32,
                )
                x = x + pe
        return nn.Dense(self.out_channels, name="out")(x)


@ModuleSelector.register("LandNet")
@dataclasses.dataclass
class LandNetBuilder(ModuleConfig):
    """(reference: fme/ace/registry/land_net.py:9)."""

    hidden_dims: list[int] = dataclasses.field(
        default_factory=lambda: [64, 64]
    )
    network_type: str = "MLP"
    use_positional_embedding: bool = False

    def build(self, n_in_channels, n_out_channels, dataset_info):
        if self.network_type != "MLP":
            raise ValueError("network_type must be MLP")
        return LandNetModule(
            img_shape=dataset_info.img_shape,
            hidden_dims=tuple(self.hidden_dims),
            out_channels=n_out_channels,
            use_positional_embedding=self.use_positional_embedding,
        )


@ModuleSelector.register("AnkurLocalNet")
@dataclasses.dataclass
class AnkurLocalNetBuilder(ModuleConfig):
    """(reference: fme/ace/registry/local_net.py:47 AnkurLocalNetBuilder)."""

    embed_dim: int = 256
    use_disco_encoder: bool = True
    disco_kernel_size: int = 3
    pos_embed: bool = False
    activation_function: str = "gelu"

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.localnet import AnkurLocalNet

        return AnkurLocalNet(
            img_shape=dataset_info.img_shape,
            in_chans=n_in_channels,
            out_chans=n_out_channels,
            embed_dim=self.embed_dim,
            use_disco_encoder=self.use_disco_encoder,
            disco_kernel_size=self.disco_kernel_size,
            pos_embed=self.pos_embed,
            activation_function=self.activation_function,
            data_grid=dataset_info.horizontal_coordinates.grid,
        )


@ModuleSelector.register("FloeNet")
@ModuleSelector.register("GraphCast")
@dataclasses.dataclass
class FloeNetBuilder(ModuleConfig):
    """GraphCast-backbone sea-ice/ocean emulator
    (reference: fme/ace/registry/m2lines.py:60 FloeNetBuilder). The
    reference's is_ocean mode reads a mask_2d from the dataset's spatial
    mask provider; pass ``mask_field`` in a later round — until then the
    full grid is used.
    """

    latent_dimension: int = 256
    activation: str = "silu"
    meshes: int = 6
    M0: int = 4
    bias: bool = True
    radius_fraction: float = 1.0
    layernorm: bool = True
    processor_steps: int = 4
    residual: bool = True
    is_ocean: bool = False

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.graphcast import GraphCast

        hc = dataset_info.horizontal_coordinates
        lat2d, lon2d = np.meshgrid(hc.lat, hc.lon, indexing="ij")
        return GraphCast(
            img_shape=dataset_info.img_shape,
            in_chans=n_in_channels,
            out_chans=n_out_channels,
            lat2d=lat2d,
            lon2d=lon2d,
            latent_dimension=self.latent_dimension,
            activation=self.activation.lower(),
            meshes=self.meshes,
            M0=self.M0,
            use_bias=self.bias,
            radius_fraction=self.radius_fraction,
            layernorm=self.layernorm,
            processor_steps=self.processor_steps,
            residual=self.residual,
        )


@ModuleSelector.register("LocalNet")
@dataclasses.dataclass
class LocalNetBuilder(ModuleConfig):
    """Local neural operator with DISCO + conv1x1 blocks
    (reference: fme/ace/registry/local_net.py:103 LocalNetBuilder).
    basis_type: "piecewise linear", "morlet", "isotropic morlet" or
    "zernike" (ace_tpu/ops/disco.py, validated vs the torch reference).
    """

    embed_dim: int = 256
    kernel_shape: tuple[int, int] = (3, 3)
    basis_type: str = "piecewise linear"
    noise_embed_dim: int = 256
    noise_type: str = "gaussian"
    block_types: list[str] = dataclasses.field(
        default_factory=lambda: [
            "disco", "disco", "disco", "disco",
            "conv1x1", "conv1x1", "conv1x1", "conv1x1",
        ]
    )
    global_layer_norm: bool = False
    use_mlp: bool = True
    mlp_ratio: float = 2.0
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: bool = True
    big_skip: bool = True
    normalize_big_skip: bool = True
    affine_norms: bool = True
    lora_rank: int = 0
    lora_alpha: float | None = None

    def build(self, n_in_channels, n_out_channels, dataset_info):
        from ace_tpu.models.localnet import LocalNet

        grid = dataset_info.horizontal_coordinates.grid
        return LocalNet(
            img_shape=dataset_info.img_shape,
            in_chans=n_in_channels,
            out_chans=n_out_channels,
            embed_dim=self.embed_dim,
            kernel_shape=tuple(self.kernel_shape),
            basis_type=self.basis_type,
            noise_embed_dim=self.noise_embed_dim,
            noise_type=self.noise_type,
            block_types=tuple(self.block_types),
            global_layer_norm=self.global_layer_norm,
            use_mlp=self.use_mlp,
            mlp_ratio=self.mlp_ratio,
            activation_function=self.activation_function,
            encoder_layers=self.encoder_layers,
            pos_embed=self.pos_embed,
            big_skip=self.big_skip,
            normalize_big_skip=self.normalize_big_skip,
            affine_norms=self.affine_norms,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            data_grid=grid,
        )
