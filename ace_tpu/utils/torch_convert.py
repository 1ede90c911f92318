"""Convert reference (torch fme) SFNO checkpoints to ace_tpu flax params
(reference checkpoint layout: fme/ace/stepper/single_module.py:1337
get_state — {"stepper": {"config", "dataset_info", "step": {"module"}}};
module param naming from fme/ace/models/modulus/sfnonet.py).

Layout conversions (torch channels-first -> flax channels-last):
- Conv2d 1x1 weight [O, I, 1, 1]  -> Dense kernel [I, O]
- pos_embed [1, C, H, W]          -> [1, H, W, C]
- InstanceNorm weight/bias [C]    -> scale/bias [C]
- SpectralConvS2 weight [I, O, L(, M), 2] -> identical layout
- filter bias [1, O, 1, 1]        -> [O]
"""

import re
from typing import Any, Mapping

import numpy as np


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[..., 0, 0], (1, 0))


def _dense_to_conv1x1(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (1, 0))[..., None, None]


def torch_sfno_to_flax(
    torch_state: Mapping[str, Any], num_layers: int, encoder_layers: int = 1
) -> dict:
    """Map a modulus-SFNO torch state_dict to the ace_tpu flax param tree.

    Accepts numpy arrays or torch tensors as values.
    """

    def arr(key):
        v = torch_state[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    params: dict = {}

    def put(path: str, value):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    # encoder: Sequential(conv+act)*n + final conv (bias=False)
    for i in range(encoder_layers):
        put(f"encoder_{i}/kernel", _conv1x1_to_dense(arr(f"encoder.{2*i}.weight")))
        put(f"encoder_{i}/bias", arr(f"encoder.{2*i}.bias"))
    put("encoder_out/kernel",
        _conv1x1_to_dense(arr(f"encoder.{2*encoder_layers}.weight")))

    if "pos_embed" in torch_state:
        put("pos_embed", np.transpose(arr("pos_embed"), (0, 2, 3, 1)))

    for i in range(num_layers):
        b = f"blocks.{i}"
        put(f"block_{i}/norm0/scale", arr(f"{b}.norm0.weight"))
        put(f"block_{i}/norm0/bias", arr(f"{b}.norm0.bias"))
        put(f"block_{i}/norm1/scale", arr(f"{b}.norm1.weight"))
        put(f"block_{i}/norm1/bias", arr(f"{b}.norm1.bias"))
        put(f"block_{i}/filter/weight", arr(f"{b}.filter.filter.weight"))
        if f"{b}.filter.filter.bias" in torch_state:
            put(f"block_{i}/filter/bias",
                arr(f"{b}.filter.filter.bias").reshape(-1))
        if f"{b}.inner_skip.weight" in torch_state:
            put(f"block_{i}/inner_skip/kernel",
                _conv1x1_to_dense(arr(f"{b}.inner_skip.weight")))
            put(f"block_{i}/inner_skip/bias", arr(f"{b}.inner_skip.bias"))
        if f"{b}.mlp.fwd.0.weight" in torch_state:
            put(f"block_{i}/mlp/fc1/kernel",
                _conv1x1_to_dense(arr(f"{b}.mlp.fwd.0.weight")))
            put(f"block_{i}/mlp/fc1/bias", arr(f"{b}.mlp.fwd.0.bias"))
            put(f"block_{i}/mlp/fc2/kernel",
                _conv1x1_to_dense(arr(f"{b}.mlp.fwd.2.weight")))
            if f"{b}.mlp.fwd.2.bias" in torch_state:
                put(f"block_{i}/mlp/fc2/bias", arr(f"{b}.mlp.fwd.2.bias"))

    for i in range(encoder_layers):
        put(f"decoder_{i}/kernel", _conv1x1_to_dense(arr(f"decoder.{2*i}.weight")))
        put(f"decoder_{i}/bias", arr(f"decoder.{2*i}.bias"))
    put("decoder_out/kernel",
        _conv1x1_to_dense(arr(f"decoder.{2*encoder_layers}.weight")))

    return {"params": params}


def flax_sfno_to_torch(flax_params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse mapping (for round-trip validation and export)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out: dict[str, np.ndarray] = {}
    for path, leaf in flat:
        name = "/".join(str(k.key) for k in path)
        name = name.removeprefix("params/")
        leaf = np.asarray(leaf)
        m = re.match(r"encoder_(\d+)/(kernel|bias)", name)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            key = f"encoder.{2*i}." + ("weight" if kind == "kernel" else "bias")
            out[key] = _dense_to_conv1x1(leaf) if kind == "kernel" else leaf
            continue
        if name == "encoder_out/kernel":
            # final encoder conv index = 2 * n_encoder_layers; resolved later
            out["__encoder_out__"] = _dense_to_conv1x1(leaf)
            continue
        if name == "pos_embed":
            out["pos_embed"] = np.transpose(leaf, (0, 3, 1, 2))
            continue
        m = re.match(r"block_(\d+)/(.*)", name)
        if m:
            i, rest = int(m.group(1)), m.group(2)
            b = f"blocks.{i}"
            mapping = {
                "norm0/scale": f"{b}.norm0.weight",
                "norm0/bias": f"{b}.norm0.bias",
                "norm1/scale": f"{b}.norm1.weight",
                "norm1/bias": f"{b}.norm1.bias",
                "filter/weight": f"{b}.filter.filter.weight",
            }
            if rest in mapping:
                out[mapping[rest]] = leaf
            elif rest == "filter/bias":
                out[f"{b}.filter.filter.bias"] = leaf.reshape(1, -1, 1, 1)
            elif rest == "inner_skip/kernel":
                out[f"{b}.inner_skip.weight"] = _dense_to_conv1x1(leaf)
            elif rest == "inner_skip/bias":
                out[f"{b}.inner_skip.bias"] = leaf
            elif rest == "mlp/fc1/kernel":
                out[f"{b}.mlp.fwd.0.weight"] = _dense_to_conv1x1(leaf)
            elif rest == "mlp/fc1/bias":
                out[f"{b}.mlp.fwd.0.bias"] = leaf
            elif rest == "mlp/fc2/kernel":
                out[f"{b}.mlp.fwd.2.weight"] = _dense_to_conv1x1(leaf)
            elif rest == "mlp/fc2/bias":
                out[f"{b}.mlp.fwd.2.bias"] = leaf
            continue
        m = re.match(r"decoder_(\d+)/(kernel|bias)", name)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            key = f"decoder.{2*i}." + ("weight" if kind == "kernel" else "bias")
            out[key] = _dense_to_conv1x1(leaf) if kind == "kernel" else leaf
            continue
        if name == "decoder_out/kernel":
            out["__decoder_out__"] = _dense_to_conv1x1(leaf)
            continue
        raise KeyError(f"unmapped flax param {name}")
    # resolve final conv indices (encoder_layers inferred from keys)
    n_enc = 1 + max(
        (int(re.match(r"encoder\.(\d+)\.weight", k).group(1)) // 2
         for k in out if re.match(r"encoder\.\d+\.weight", k)),
        default=-1,
    )
    if "__encoder_out__" in out:
        out[f"encoder.{2*n_enc}.weight"] = out.pop("__encoder_out__")
    if "__decoder_out__" in out:
        out[f"decoder.{2*n_enc}.weight"] = out.pop("__decoder_out__")
    return out


def convert_reference_checkpoint(path: str, output_path: str):
    """Convert a reference training/inference checkpoint (.tar via
    torch.load) to an ace_tpu stepper checkpoint (msgpack).

    Handles the modern layout {"stepper": {"config", "dataset_info",
    "step": {"module": ...}}} with single_module steps and SFNO builders.
    """
    import torch

    from ace_tpu.core.config import from_dict
    from ace_tpu.core.dataset_info import DatasetInfo
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.stepper.checkpoint import save_stepper
    from ace_tpu.stepper.stepper import StepperConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    stepper_state = ckpt["stepper"] if "stepper" in ckpt else ckpt
    config_state = stepper_state["config"]
    step_cfg = config_state["step"]
    builder = step_cfg["config"]["builder"]
    module_cfg = dict(builder.get("config", {}))
    num_layers = module_cfg.get("num_layers", 12)
    encoder_layers = module_cfg.get("encoder_layers", 1)

    # rebuild dataset info from the reference serialization
    ds_state = stepper_state["dataset_info"]
    info_state: dict = {}
    if "horizontal_coordinates" in ds_state:
        info_state["horizontal_coordinates"] = ds_state["horizontal_coordinates"]
    if "vertical_coordinate" in ds_state:
        vc = ds_state["vertical_coordinate"]
        info_state["vertical_coordinate"] = {
            "type": "hybrid_sigma_pressure",
            "data": {
                "ak": np.asarray(vc["ak"]).tolist(),
                "bk": np.asarray(vc["bk"]).tolist(),
            },
        }
    if ds_state.get("timestep") is not None:
        # reference encode_timestep stores MICROSECONDS
        # (fme/core/dataset/utils.py:261)
        info_state["timestep_seconds"] = float(ds_state["timestep"]) / 1e6
    dataset_info = DatasetInfo.from_state(info_state)

    module_state = stepper_state["step"]["module"]
    flax_params = torch_sfno_to_flax(
        module_state, num_layers=num_layers, encoder_layers=encoder_layers
    )

    stepper_config = StepperConfig(
        step=StepSelector(type=step_cfg["type"], config=step_cfg["config"])
    )
    stepper = stepper_config.get_stepper(dataset_info)
    stepper.params = flax_params
    save_stepper(output_path, stepper, stepper_config)
    return output_path


def torch_csfno_to_flax(torch_state: Mapping[str, Any],
                        num_layers: int) -> dict:
    """Map a conditional-SFNO torch state_dict (reference:
    fme/core/models/conditional_sfno/sfnonet.py get_lat_lon_sfnonet, the
    ACE2-ERA5 NoiseConditionedSFNO backbone) to the ace_tpu
    NoiseConditionedSFNO flax param tree.
    """

    def arr(key):
        v = torch_state[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    def conv1x1_to_dense(key):
        # [out, in, 1, 1] -> [in, out]
        return arr(key)[:, :, 0, 0].T

    params: dict = {
        "encoder_0": {
            "kernel": conv1x1_to_dense("encoder.0.weight"),
            "bias": arr("encoder.0.bias"),
        },
        "encoder_out": {"kernel": conv1x1_to_dense("encoder.2.weight")},
        "decoder_0": {
            "kernel": conv1x1_to_dense("decoder.0.weight"),
            "bias": arr("decoder.0.bias"),
        },
        "decoder_out": {"kernel": conv1x1_to_dense("decoder.2.weight")},
    }
    if "pos_embed" in torch_state:
        pe = arr("pos_embed")  # [1, C, H, W]
        params["pos_embed"] = np.moveaxis(pe, 1, -1)
    for i in range(num_layers):
        pre = f"blocks.{i}."
        block: dict = {}
        for norm in ("norm0", "norm1"):
            block[norm] = {
                "w_scale_2d": {"kernel": conv1x1_to_dense(
                    f"{pre}{norm}.W_scale_2d.weight"
                )},
                "w_bias_2d": {"kernel": conv1x1_to_dense(
                    f"{pre}{norm}.W_bias_2d.weight"
                )},
            }
        # filter weight [groups=1, l, out, in, 2] (reference contraction
        # "bgixy,gxoi->bgoxy", s2convolutions.py:135) -> [in, out, l, 2];
        # bias [1, C, 1, 1] -> [C]
        w = arr(f"{pre}filter.filter.weight")[0]
        block["filter"] = {
            "weight": np.transpose(w, (2, 1, 0, 3)),
            "bias": arr(f"{pre}filter.filter.bias")[0, :, 0, 0],
        }
        block["inner_skip"] = {
            "kernel": conv1x1_to_dense(f"{pre}inner_skip.weight"),
            "bias": arr(f"{pre}inner_skip.bias"),
        }
        block["mlp"] = {
            "fc1": {
                "kernel": conv1x1_to_dense(f"{pre}mlp.fwd.0.weight"),
                "bias": arr(f"{pre}mlp.fwd.0.bias"),
            },
            "fc2": {
                "kernel": conv1x1_to_dense(f"{pre}mlp.fwd.2.weight"),
                "bias": arr(f"{pre}mlp.fwd.2.bias"),
            },
        }
        params[f"block_{i}"] = block
    return {"params": params}


def torch_swin_to_flax(
    torch_state: Mapping[str, Any],
    depth_multiplier: int = 1,
    conditioning: str = "adaln",
) -> dict:
    """Map a reference SwinTransformerNet state dict to ace_tpu flax params
    (reference: fme/core/models/swin_transformer/swin_transformer.py:57,
    swin_layers.py; torch [out, in] linears -> flax [in, out] kernels,
    convs [O, I, kh, kw] -> [kh, kw, I, O])."""

    def arr(key):
        v = torch_state[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    def dense(key, bias=True):
        out = {"kernel": np.transpose(arr(key + ".weight"), (1, 0))}
        if bias:
            out["bias"] = arr(key + ".bias")
        return out

    def conv(key):
        return {
            "kernel": np.transpose(arr(key + ".weight"), (2, 3, 1, 0)),
            "bias": arr(key + ".bias"),
        }

    def norm(key):
        return {"scale": arr(key + ".weight"), "bias": arr(key + ".bias")}

    def cln(prefix):
        out = {}
        if prefix + ".W_scale_2d.weight" in torch_state:
            out["w_scale_2d"] = {
                "kernel": _conv1x1_to_dense(arr(prefix + ".W_scale_2d.weight"))
            }
            out["w_bias_2d"] = {
                "kernel": _conv1x1_to_dense(arr(prefix + ".W_bias_2d.weight"))
            }
        if prefix + ".W_scale_labels.weight" in torch_state:
            out["w_scale_labels"] = dense(prefix + ".W_scale_labels")
            out["w_bias_labels"] = dense(prefix + ".W_bias_labels")
        return out

    def block(prefix):
        out = {
            "attn": {
                "tau": arr(prefix + ".attn.tau"),
                "qkv": dense(prefix + ".attn.qkv"),
                "proj": dense(prefix + ".attn.proj"),
                "cpb_fc1": dense(prefix + ".attn.cpb_mlp.0"),
                "cpb_fc2": dense(prefix + ".attn.cpb_mlp.2"),
            },
            "column_mixer": dense(prefix + ".column_mixer.fc"),
            "mlp": {
                "fc1": dense(prefix + ".mlp.fc1"),
                "fc2": dense(prefix + ".mlp.fc2"),
            },
        }
        for n in ("norm1", "norm2"):
            if conditioning == "cln":
                out[n] = cln(prefix + "." + n)
            else:
                out[n] = norm(prefix + "." + n)
        return out

    def basic_layer(prefix, depth):
        out = {
            f"blocks_{i}": block(f"{prefix}.blocks.{i}")
            for i in range(depth)
        }
        if prefix + ".adaln_scalar.1.weight" in torch_state:
            out["adaln_scalar"] = dense(prefix + ".adaln_scalar.1")
        if prefix + ".adaln_labels.1.weight" in torch_state:
            out["adaln_labels"] = dense(prefix + ".adaln_labels.1")
        return out

    d = depth_multiplier
    params = {
        "encoder": conv("encoder"),
        "channel_mixer": dense("channel_mixer.fc"),
        "layer1": basic_layer("layer1", 2 * d),
        "downsample": {
            "norm": norm("downsample.norm"),
            "reduction": dense("downsample.reduction", bias=False),
        },
        "layer2": basic_layer("layer2", 6 * d),
        "layer3": basic_layer("layer3", 6 * d),
        "upsample": {
            "expand": dense("upsample.expand", bias=False),
            "norm": norm("upsample.norm"),
            "linear": dense("upsample.linear", bias=False),
        },
        "layer4": basic_layer("layer4", 2 * d),
        "final_linear": dense("final_linear", bias=False),
        "decoder": conv("decoder"),
    }
    if "label_embedding.weight" in torch_state:
        params["label_embedding"] = dense("label_embedding")
    return {"params": params}


def torch_hpx_unet_to_flax(
    torch_state: Mapping[str, Any],
    encoder_levels: int,
    decoder_levels: int,
) -> dict:
    """Map a reference HEALPixUNet state dict to ace_tpu flax params
    (reference: fme/ace/models/healpix/healpix_unet.py; ConvNeXt blocks
    serialize as convblock.{0,2,4}.layers.{0,1} with the HEALPixLayer
    padding module occupying index 0 for padded convs)."""

    def arr(key):
        v = torch_state[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    def conv(key):
        return {
            "conv": {
                "kernel": np.transpose(arr(key + ".weight"), (2, 3, 1, 0)),
                "bias": arr(key + ".bias"),
            }
        }

    def hpx_conv(prefix):
        # HEALPixLayer: layers.1 when a padding module precedes the conv
        # (3x3), layers.0 otherwise (1x1 / pools / transposed conv)
        key = (
            prefix + ".layers.1"
            if prefix + ".layers.1.weight" in torch_state
            else prefix + ".layers.0"
        )
        return conv(key)

    def convnext(prefix):
        out = {
            "conv1": hpx_conv(prefix + ".convblock.0"),
            "conv2": hpx_conv(prefix + ".convblock.2"),
            "conv3": hpx_conv(prefix + ".convblock.4"),
        }
        if prefix + ".skip_module.layers.0.weight" in torch_state:
            out["skip"] = hpx_conv(prefix + ".skip_module")
        return out

    def basic(prefix):
        out = {}
        n = 0
        while True:
            # activations occupy odd Sequential slots when present
            for idx in (2 * n, n):
                p = f"{prefix}.convblock.{idx}"
                if (p + ".layers.0.weight" in torch_state
                        or p + ".layers.1.weight" in torch_state):
                    out[f"conv_{n}"] = hpx_conv(p)
                    break
            else:
                break
            n += 1
        return out

    params: dict = {}
    for lvl in range(encoder_levels):
        seq = 1 if lvl > 0 else 0  # Sequential(down?, conv)
        params[f"encoder_conv_{lvl}"] = convnext(
            f"encoder.encoder.{lvl}.{seq}"
        )
    for lvl in range(decoder_levels):
        if lvl > 0:
            tkey = f"decoder.decoder.{lvl}.upsamp.upsampler.0.layers.0"
            w = arr(tkey + ".weight")  # [in, out, kh, kw]
            params[f"decoder_up_{lvl}"] = {
                "kernel": np.transpose(w, (2, 3, 0, 1)),
                "bias": arr(tkey + ".bias"),
            }
        params[f"decoder_conv_{lvl}"] = convnext(
            f"decoder.decoder.{lvl}.conv"
        )
    params["output_layer"] = basic("decoder.output_layer")
    return {"params": params}


def torch_localnet_to_flax(torch_state: Mapping[str, Any],
                           block_types: list[str],
                           encoder_layers: int = 1,
                           use_mlp: bool = True) -> dict:
    """Map a reference LocalNet torch state_dict
    (fme/core/models/conditional_sfno/localnet.py:324 LocalNet) to the
    ace_tpu LocalNet flax param tree (channels-last, LoRADense layers).
    """

    def arr(key):
        v = torch_state[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    def conv1x1(key):
        return arr(key)[:, :, 0, 0].T  # [out, in, 1, 1] -> [in, out]

    def lora_dense(prefix, bias=True):
        out = {"base": {"kernel": conv1x1(prefix + ".weight")}}
        if bias and prefix + ".bias" in torch_state:
            out["base"]["bias"] = arr(prefix + ".bias")
        return out

    def cln(prefix):
        out: dict = {}
        if prefix + ".norm.weight" in torch_state:
            out["norm"] = {
                "weight": arr(prefix + ".norm.weight").reshape(-1),
                "bias": arr(prefix + ".norm.bias").reshape(-1),
            }
        if prefix + ".W_scale_2d.weight" in torch_state:
            out["w_scale_2d"] = {
                "kernel": conv1x1(prefix + ".W_scale_2d.weight")
            }
            out["w_bias_2d"] = {
                "kernel": conv1x1(prefix + ".W_bias_2d.weight")
            }
        return out

    params: dict = {}
    # encoder/decoder: Sequential of (LoRAConv2d, act) * layers + final
    for i in range(encoder_layers):
        params[f"encoder_{i}"] = lora_dense(f"encoder.{2 * i}")
        params[f"decoder_{i}"] = lora_dense(f"decoder.{2 * i}")
    params["encoder_out"] = lora_dense(
        f"encoder.{2 * encoder_layers}", bias=False
    )
    params["decoder_out"] = lora_dense(
        f"decoder.{2 * encoder_layers}", bias=False
    )
    if "pos_embed" in torch_state:
        params["pos_embed"] = np.moveaxis(arr("pos_embed"), 1, -1)
    if "norm_big_skip.norm.weight" in torch_state or (
        "norm_big_skip.W_scale_2d.weight" in torch_state
    ):
        params["norm_big_skip"] = cln("norm_big_skip")
    for i, block_type in enumerate(block_types):
        pre = f"blocks.{i}."
        block: dict = {
            "norm0": cln(pre + "norm0"),
            "norm1": cln(pre + "norm1"),
            "inner_skip": lora_dense(pre + "inner_skip"),
        }
        if block_type == "disco":
            # reference DISCO weight [C_out, C_in, K] -> ours [K, C_in,
            # C_out] (contraction "...jkc,kco->...jo", ops/disco.py)
            block["filter"] = {"weight": np.transpose(
                arr(pre + "filter.filter.conv.weight"), (2, 1, 0)
            )}
        else:  # conv1x1: Conv1x1Filter wraps a LoRAConv2d at .conv
            block["filter"] = lora_dense(pre + "filter.filter.conv")
        if use_mlp:
            block["mlp"] = {
                "fc1": {
                    "kernel": conv1x1(pre + "mlp.fwd.0.weight"),
                    "bias": arr(pre + "mlp.fwd.0.bias"),
                },
                "fc2": {
                    "kernel": conv1x1(pre + "mlp.fwd.2.weight"),
                    "bias": arr(pre + "mlp.fwd.2.bias"),
                },
            }
        params[f"block_{i}"] = block
    return {"params": params}


def torch_graphcast_to_flax(torch_state: Mapping[str, Any],
                            processor_steps: int) -> dict:
    """Map a reference GraphCast torch state_dict
    (fme/ace/models/graphcast/main.py:330 + layers.py) to the ace_tpu
    GraphCast flax param tree. MLPs are Sequential [Linear, act,
    LayerNorm, Linear] (indices 0/2/3), or [Linear, act, Linear] for the
    un-normed output head.
    """

    def arr(key):
        v = torch_state[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    def gnn_mlp(prefix, norm=True):
        out = {"fc0": {"kernel": arr(prefix + ".0.weight").T}}
        if prefix + ".0.bias" in torch_state:
            out["fc0"]["bias"] = arr(prefix + ".0.bias")
        last = 3 if norm else 2
        if norm:
            out["norm"] = {
                "scale": arr(prefix + ".2.weight"),
                "bias": arr(prefix + ".2.bias"),
            }
        out["fc1"] = {"kernel": arr(prefix + f".{last}.weight").T}
        if prefix + f".{last}.bias" in torch_state:
            out["fc1"]["bias"] = arr(prefix + f".{last}.bias")
        return out

    params = {
        "grid_node_embed": gnn_mlp("encoder.grid_node_embed"),
        "mesh_node_embed": gnn_mlp("encoder.mesh_node_embed"),
        "m2m_edge_embed": gnn_mlp("encoder.M2M_edge_embed"),
        "g2m_edge_embed": gnn_mlp("encoder.G2M_edge_embed"),
        "m2g_edge_embed": gnn_mlp("encoder.M2G_edge_embed"),
        "g2m_message": gnn_mlp("encoder.G2M_message"),
        "g2m_node_update": gnn_mlp("encoder.G2M_node_update"),
        "grid_update": gnn_mlp("encoder.G_update"),
        "m2g_message": gnn_mlp("decoder.edge_M2G"),
        "grid_node_update": gnn_mlp("decoder.node_VG"),
        "out_head": gnn_mlp("decoder.out_head", norm=False),
    }
    for i in range(processor_steps):
        params[f"m2m_message_{i}"] = gnn_mlp(
            f"processor.layers.{i}.M2M_message"
        )
        params[f"m2m_node_update_{i}"] = gnn_mlp(
            f"processor.layers.{i}.M2M_node_update"
        )
    return {"params": params}


def torch_fcn3_to_flax(torch_state: Mapping[str, Any],
                       n_atmo_channels: int,
                       n_atmo_groups: int,
                       n_surf_channels: int,
                       n_aux_channels: int,
                       atmo_embed_dim: int,
                       surf_embed_dim: int,
                       aux_embed_dim: int,
                       num_layers: int,
                       n_atmo_diagnostic_channels: int = 0,
                       n_surf_diagnostic_channels: int = 0,
                       encoder_mlp: bool = False,
                       use_mlp: bool = True,
                       layer_scale: bool = True) -> dict:
    """Map a reference FourCastNet3 torch state_dict
    (fme/ace/models/makani_fcn3/models/networks/fourcastnet3.py:423
    AtmoSphericNeuralOperatorNet) to the ace_tpu FourCastNet3 flax param
    tree (channels-last, grouped-DISCO [K, G, Cin/G, Cout/G] weights).
    """
    import math

    def arr(key):
        v = torch_state[key]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    def carr(key):
        v = torch_state[key]
        t = v.detach().cpu() if hasattr(v, "detach") else v
        return np.asarray(t.resolve_conj().numpy()
                          if hasattr(t, "resolve_conj") else t)

    def conv1x1(key):
        return arr(key)[:, :, 0, 0].T  # [out, in, 1, 1] -> [in, out]

    def disco_weight(prefix, groups, with_bias):
        # torch [out, in/g, K] (g-major out) -> ours [K, g, in/g, out/g]
        w = arr(prefix + ".weight")
        out_c, in_g, k = w.shape
        w = w.reshape(groups, out_c // groups, in_g, k)
        d = {"weight": np.transpose(w, (3, 0, 2, 1))}
        if with_bias and prefix + ".bias" in torch_state:
            d["bias"] = arr(prefix + ".bias")
        return d

    def enc_dec_mlp(prefix, width):
        # EncoderDecoder(num_layers=1): Sequential [Conv2d(bias),
        # act, Conv2d(no bias)] (makani_fcn3 common/layers.py:87);
        # our MLP's fc2 always carries a bias param -> zeros
        return {
            "fc1": {"kernel": conv1x1(prefix + ".fwd.0.weight"),
                    "bias": arr(prefix + ".fwd.0.bias")},
            "fc2": {"kernel": conv1x1(prefix + ".fwd.2.weight"),
                    "bias": np.zeros((width,), np.float32)},
        }

    def block_mlp(prefix):
        # MLP: Sequential(fc1, act, drop, fc2, drop)
        # (common/layers.py:148)
        return {
            "fc1": {"kernel": conv1x1(prefix + ".fwd.0.weight"),
                    "bias": arr(prefix + ".fwd.0.bias")},
            "fc2": {"kernel": conv1x1(prefix + ".fwd.3.weight"),
                    "bias": arr(prefix + ".fwd.3.bias")},
        }

    ca_in = n_atmo_channels - n_atmo_diagnostic_channels
    cs_in = n_surf_channels - n_surf_diagnostic_channels

    def coder(name, groups, out_chans, with_bias=True):
        d = {"conv": disco_weight(name + ".conv", groups, with_bias)}
        if encoder_mlp:
            d["mlp"] = enc_dec_mlp(name + ".mlp", out_chans)
        return d

    params: dict = {
        "atmo_encoder": coder(
            "atmo_encoder", math.gcd(ca_in, atmo_embed_dim),
            atmo_embed_dim,
        ),
        "atmo_decoder": coder(
            "atmo_decoder", math.gcd(n_atmo_channels, atmo_embed_dim),
            n_atmo_channels, with_bias=False,
        ),
    }
    # decoder MLP acts on the embedding (input width), not the output
    if encoder_mlp:
        params["atmo_decoder"]["mlp"] = enc_dec_mlp(
            "atmo_decoder.mlp", atmo_embed_dim
        )
    if n_surf_channels > 0:
        params["surf_encoder"] = coder(
            "surf_encoder", math.gcd(cs_in, surf_embed_dim),
            surf_embed_dim,
        )
        params["surf_decoder"] = coder(
            "surf_decoder", math.gcd(n_surf_channels, surf_embed_dim),
            n_surf_channels, with_bias=False,
        )
        if encoder_mlp:
            params["surf_decoder"]["mlp"] = enc_dec_mlp(
                "surf_decoder.mlp", surf_embed_dim
            )
    if n_aux_channels > 0:
        params["aux_encoder"] = coder(
            "aux_encoder", math.gcd(n_aux_channels, aux_embed_dim),
            aux_embed_dim,
        )

    for i in range(num_layers):
        pre = f"blocks.{i}."
        block: dict = {}
        if pre + "global_conv.weight" in torch_state:
            # complex [1, in, out, lmax] -> real [in, out, lmax, 2]
            w = carr(pre + "global_conv.weight")[0]
            block["global_conv"] = {
                "weight": np.stack([w.real, w.imag], axis=-1),
            }
        else:
            block["local_conv"] = disco_weight(
                pre + "local_conv", 1, with_bias=False
            )
        if use_mlp:
            block["mlp"] = block_mlp(pre + "mlp")
        if layer_scale:
            block["layer_scale"] = arr(
                pre + "layer_scale.weight"
            )[:, 0, 0, 0]
        params[f"block_{i}"] = block
    return {"params": params}


def torch_songunet_v2_to_flax(torch_state: Mapping[str, Any]) -> dict:
    """Map a reference SongUNetv2 state_dict (reference:
    fme/downscaling/modules/physicsnemo_unets_v2/unets.py:88) to the
    ace_tpu SongUNetV2 flax param tree.

    Routing is shape-driven: 4-D tensors are conv weights
    ([O, I, kh, kw] -> HWIO), 2-D are linear weights ([O, I] -> [I, O]),
    1-D are norm/bias vectors. ``resample_filter`` buffers are constants
    on the flax side and skipped.
    """

    def arr(v):
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    params: dict = {}

    def put(path: list[str], value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, v in torch_state.items():
        if key.endswith("resample_filter"):
            continue
        val = arr(v)
        parts = key.split(".")
        if parts[0] in ("enc", "dec"):
            # "enc.8x8_block0.conv0.weight" -> enc_8x8_block0 / ...
            head = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
            if "aux_residual" in parts[1]:
                # fused-resample conv: bare nn.Conv + separate bias param
                if rest == ["weight"]:
                    put([f"{head}_conv", "kernel"],
                        val.transpose(2, 3, 1, 0))
                elif rest == ["bias"]:
                    put([f"{head}_bias"], val)
                else:
                    raise KeyError(f"unmapped SongUNetv2 key {key}")
                continue
            path = [head]
            # submodule chain (norm0, conv0, affine, attn.qkv, ...)
            for sub in rest[:-1]:
                path.append(sub)
            leaf = rest[-1]
            if val.ndim == 4:
                put(path + ["conv", "kernel"], val.transpose(2, 3, 1, 0))
            elif val.ndim == 2:
                put(path + ["linear", "kernel"], val.transpose(1, 0))
            elif leaf == "weight":
                put(path + ["weight"], val)
            elif leaf == "bias":
                # conv bias vs norm bias: conv submodules wrap nn.Conv
                if path[-1].startswith(("conv", "skip", "qkv", "proj")) \
                        or path[-1].endswith(("_conv", "aux_skip")):
                    put(path + ["conv", "bias"], val)
                elif path[-1] in ("affine",) or path[-1].startswith("map"):
                    put(path + ["linear", "bias"], val)
                elif path[-1].endswith("aux_norm") or "norm" in path[-1]:
                    put(path + ["bias"], val)
                else:
                    put(path + ["bias"], val)
            else:
                raise KeyError(f"unmapped SongUNetv2 key {key}")
        elif parts[0] == "spatial_emb":
            put(["spatial_emb"], np.moveaxis(val, 1, -1))
        elif parts[0] == "map_noise" and parts[-1] == "freqs":
            put(["map_noise", "freqs"], val)
        elif parts[0].startswith("map_"):
            if val.ndim == 2:
                put([parts[0], "linear", "kernel"], val.transpose(1, 0))
            else:
                put([parts[0], "linear", "bias"], val)
        else:
            raise KeyError(f"unmapped SongUNetv2 key {key}")
    return {"params": params}
