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
