"""Weight-stationary Pallas dhconv filter vs the einsum path
(reference computation: fme/ace/models/modulus/s2convolutions.py:168-189
_contract with operator_type="dhconv"). Runs in the Pallas interpreter
on the CPU test backend; the compiled kernel was validated exact-match
on a real v5e (see ops/pallas_filter.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.ops.pallas_filter import dhconv_filter, shapes_supported

L, M, I, O = 5, 12, 128, 128


def _einsum_ref(xr, xi, wr, wi):
    # XLA:CPU has no batched bf16 dot thunk, so round operands to bf16
    # (matching the TPU kernel's operand values) and contract in f32
    def ein(a, b):
        return jnp.einsum(
            "...lmi,lio->...lmo",
            a.astype(jnp.bfloat16).astype(jnp.float32),
            b.astype(jnp.bfloat16).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    return (ein(xr, wr) - ein(xi, wi), ein(xr, wi) + ein(xi, wr))


def _rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape) * scale, jnp.float32)


def test_forward_matches_einsum():
    xr = _rand(2, L, M, I, seed=0)
    xi = _rand(2, L, M, I, seed=1)
    wr = _rand(L, I, O, seed=2, scale=0.02).astype(jnp.bfloat16)
    wi = _rand(L, I, O, seed=3, scale=0.02).astype(jnp.bfloat16)
    outr, outi = dhconv_filter(xr, xi, wr, wi, interpret=True)
    assert outr.dtype == jnp.bfloat16
    rr, ri = _einsum_ref(xr, xi, wr, wi)
    # identical operands, f32 accumulation: only the final bf16 rounding
    # of the kernel output differs from the f32 einsum combination
    np.testing.assert_allclose(
        np.asarray(outr, np.float32), np.asarray(rr),
        rtol=0, atol=float(jnp.max(jnp.abs(rr))) * 8e-3,
    )
    np.testing.assert_allclose(
        np.asarray(outi, np.float32), np.asarray(ri),
        rtol=0, atol=float(jnp.max(jnp.abs(ri))) * 8e-3,
    )


def test_forward_f32_out_exact():
    xr = _rand(1, L, M, I, seed=0)
    xi = _rand(1, L, M, I, seed=1)
    wr = _rand(L, I, O, seed=2, scale=0.02).astype(jnp.bfloat16)
    wi = _rand(L, I, O, seed=3, scale=0.02).astype(jnp.bfloat16)
    outr, outi = dhconv_filter(
        xr, xi, wr, wi, out_dtype=jnp.float32, interpret=True
    )
    rr, ri = _einsum_ref(xr, xi, wr, wi)
    np.testing.assert_allclose(np.asarray(outr), np.asarray(rr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outi), np.asarray(ri),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match_einsum_path():
    xr = _rand(1, L, M, I, seed=0)
    xi = _rand(1, L, M, I, seed=1)
    wr = _rand(L, I, O, seed=2, scale=0.02)
    wi = _rand(L, I, O, seed=3, scale=0.02)

    def loss_kernel(xr, xi, wr, wi):
        outr, outi = dhconv_filter(
            xr, xi, wr, wi, out_dtype=jnp.float32, interpret=True
        )
        return jnp.sum(outr**2) + jnp.sum(outi * outr)

    def loss_einsum(xr, xi, wr, wi):
        outr, outi = _einsum_ref(xr, xi, wr, wi)
        return jnp.sum(outr**2) + jnp.sum(outi * outr)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
    ge = jax.grad(loss_einsum, argnums=(0, 1, 2, 3))(xr, xi, wr, wi)
    for k, e, name in zip(gk, ge, ["dxr", "dxi", "dwr", "dwi"]):
        scale = float(jnp.max(jnp.abs(e))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(k, np.float32), np.asarray(e, np.float32),
            atol=scale * 2e-2, rtol=0, err_msg=name,
        )


def test_spectral_filter_module_uses_kernel(monkeypatch):
    """The SFNO SpectralFilter routes through the Pallas kernel when
    forced via ACE_TPU_PALLAS_FILTER=interpret and matches its own
    einsum path at bf16 tolerance."""
    from ace_tpu.models.sfno import SpectralConvS2
    from ace_tpu.ops import sht as sht_mod

    nlat, nlon, c = 16, 32, 128
    fwd = sht_mod.RealSHT(nlat, nlon, grid="legendre-gauss",
                          channels_last=True)
    inv = sht_mod.InverseRealSHT(nlat, nlon, grid="legendre-gauss",
                                 channels_last=True)
    layer = SpectralConvS2(
        forward_transform=fwd, inverse_transform=inv,
        in_channels=c, out_channels=c, operator_type="dhconv",
        separable=False,
    )
    x = _rand(1, nlat, nlon, c).astype(jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("ACE_TPU_PALLAS_FILTER", "0")
    ref, _ = layer.apply(params, x)
    monkeypatch.setenv("ACE_TPU_PALLAS_FILTER", "interpret")
    out, _ = layer.apply(params, x)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=scale * 1e-2, rtol=0,
    )


def test_shapes_supported_gate():
    assert shapes_supported(181, 512, 512)
    assert not shapes_supported(181, 8, 8)  # tiny test models fall back
    assert not shapes_supported(4, 512, 512)
