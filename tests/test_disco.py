"""DISCO convolution tests vs the torch reference as oracle
(reference: fme/core/disco/_convolution.py DiscreteContinuousConvS2,
test model fme/core/disco/test_disco.py).
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.ops.disco import DiscoConvS2, precompute_disco_psi


def _load_reference_disco():
    for name in ["fme", "fme.core"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = ["/root/reference/" + name.replace(".", "/")]
            sys.modules[name] = mod
    import fme.core.disco as disco  # noqa: E402

    return disco


@pytest.mark.parametrize(
    "kernel_shape,in_shape,out_shape",
    [
        ((3, 1), (12, 24), (12, 24)),   # isotropic, same-grid
        ((2, 4), (12, 24), (12, 24)),   # anisotropic
        ((3, 1), (16, 32), (8, 16)),    # downsampling
    ],
)
def test_disco_matches_reference(kernel_shape, in_shape, out_shape):
    import torch

    disco_ref = _load_reference_disco()
    rng = np.random.RandomState(0)
    C_in, C_out, B = 3, 2, 2
    conv_ref = disco_ref.DiscreteContinuousConvS2(
        in_channels=C_in, out_channels=C_out,
        in_shape=in_shape, out_shape=out_shape,
        kernel_shape=kernel_shape, basis_type="piecewise linear",
        grid_in="equiangular", grid_out="equiangular", bias=False,
    )
    x = rng.randn(B, C_in, *in_shape).astype(np.float32)
    with torch.no_grad():
        expected = conv_ref(torch.as_tensor(x)).numpy()

    ours = DiscoConvS2(in_shape, out_shape, kernel_shape)
    x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
    contracted = ours(x_cl)  # [B, T, lon, K, C]
    weight = conv_ref.weight.detach().numpy()  # [C_out, C_in, K]
    result = jnp.einsum("btjkc,ock->btjo", contracted, jnp.asarray(weight))
    result_cf = np.moveaxis(np.asarray(result), -1, 1)
    np.testing.assert_allclose(result_cf, expected, atol=2e-4)


def test_disco_psi_matches_reference_sparsity():
    import torch

    disco_ref = _load_reference_disco()
    conv_ref = disco_ref.DiscreteContinuousConvS2(
        in_channels=1, out_channels=1, in_shape=(10, 20),
        out_shape=(10, 20), kernel_shape=(3, 1),
        basis_type="piecewise linear", grid_in="equiangular",
        grid_out="equiangular", bias=False,
    )
    psi_banded, gather_idx = precompute_disco_psi(
        (10, 20), (10, 20), (3, 1)
    )
    assert psi_banded.shape[0] == conv_ref.kernel_size
    # dense psi agrees exactly (stronger than nnz comparison, which can
    # differ by explicitly-stored zeros)
    import torch as _torch

    ref_dense = _torch.sparse_coo_tensor(
        conv_ref.psi_idx, conv_ref.psi_vals,
        size=(conv_ref.kernel_size, 10, 10 * 20),
    ).to_dense().numpy().reshape(conv_ref.kernel_size, 10, 10, 20)
    ours_dense = np.zeros_like(ref_dense)
    for t in range(10):
        for w in range(gather_idx.shape[1]):
            ours_dense[:, t, gather_idx[t, w]] += psi_banded[:, t, w]
    np.testing.assert_allclose(ours_dense, ref_dense, atol=1e-6)


@pytest.mark.medium_duration
def test_localnet_with_disco_blocks():
    import jax
    import jax.numpy as jnp

    from ace_tpu.models.localnet import LocalNet

    net = LocalNet(
        img_shape=(8, 16), in_chans=3, out_chans=2, embed_dim=8,
        noise_embed_dim=4, block_types=("disco", "conv1x1"),
        kernel_shape=(2, 1), lora_rank=2,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 16, 3), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), x)
    out1 = net.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert out1.shape == (2, 8, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out1)))
    # LoRA starts as identity: zero-noise calls match a lora_rank=0 net
    # with the same base weights is implied by zero-init B; here just
    # check stochasticity responds to the noise rng after perturbing the
    # conditioning weights (zero-init by design)
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    perturbed = {
        k: (v + 0.1 if "w_scale_2d" in "/".join(map(str, k)) else v)
        for k, v in flat.items()
    }
    params_p = flax.traverse_util.unflatten_dict(perturbed)
    o_a = net.apply(params_p, x, rngs={"noise": jax.random.PRNGKey(1)})
    o_b = net.apply(params_p, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o_a), np.asarray(o_b))


def test_localnet_builder_registry():
    import jax
    import jax.numpy as jnp

    from ace_tpu.models.registry import ModuleSelector
    from tests.test_step_stepper import _dataset_info

    sel = ModuleSelector(
        type="LocalNet",
        config={
            "embed_dim": 8,
            "noise_embed_dim": 0,
            "block_types": ["disco", "conv1x1"],
            "kernel_shape": [2, 1],
        },
    )
    info = _dataset_info()
    net = sel.build(n_in_channels=3, n_out_channels=2, dataset_info=info)
    x = jnp.zeros((1, *info.img_shape, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, *info.img_shape, 2)


@pytest.mark.parametrize(
    "basis_type", ["morlet", "isotropic morlet", "zernike"]
)
def test_disco_morlet_zernike_match_reference(basis_type):
    import torch

    disco_ref = _load_reference_disco()
    rng = np.random.RandomState(0)
    C_in, C_out, B = 2, 3, 1
    in_shape = out_shape = (12, 24)
    kernel_shape = (3, 3) if basis_type == "morlet" else (3, 1)
    conv_ref = disco_ref.DiscreteContinuousConvS2(
        in_channels=C_in, out_channels=C_out,
        in_shape=in_shape, out_shape=out_shape,
        kernel_shape=kernel_shape, basis_type=basis_type,
        grid_in="equiangular", grid_out="equiangular", bias=False,
    )
    x = rng.randn(B, C_in, *in_shape).astype(np.float32)
    with torch.no_grad():
        expected = conv_ref(torch.as_tensor(x)).numpy()

    ours = DiscoConvS2(
        in_shape, out_shape, kernel_shape, basis_type=basis_type
    )
    assert ours.kernel_size == conv_ref.kernel_size
    x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
    contracted = ours(x_cl)
    weight = conv_ref.weight.detach().numpy()
    result = jnp.einsum(
        "btjkc,ock->btjo", contracted, jnp.asarray(weight)
    )
    result_cf = np.moveaxis(np.asarray(result), -1, 1)
    np.testing.assert_allclose(result_cf, expected, atol=5e-4)


def test_ankur_localnet():
    from ace_tpu.models.registry import ModuleSelector
    from tests.test_step_stepper import _dataset_info

    sel = ModuleSelector(
        type="AnkurLocalNet",
        config={"embed_dim": 8, "disco_kernel_size": 2, "pos_embed": True},
    )
    info = _dataset_info()
    net = sel.build(3, 2, info)
    x = jnp.zeros((2, *info.img_shape, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, *info.img_shape, 2)
