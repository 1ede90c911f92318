"""Fused block-tail Pallas kernel vs the unfused module path
(reference computation: conditional_sfno/sfnonet.py:388 block forward
after the filter). Interpreter mode on the CPU test backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.models.conditional_sfno import ConditionalFNOBlock
from ace_tpu.ops.pallas_block import (
    _reference_tail,
    fused_block_tail,
    tail_shapes_supported,
)
from ace_tpu.ops.sht import build_isht, build_sht

C, HID, NC = 128, 256, 16
NLAT, NLON = 8, 16


def _weights(seed=0):
    rng = np.random.RandomState(seed)

    def r(*s, scale=0.05):
        return jnp.asarray(rng.randn(*s) * scale, jnp.float32)

    return (
        r(C, C), r(C), 1.0 + 0.1 * r(C), 0.1 * r(C), r(NC, C), r(NC, C),
        r(C, HID), r(HID), r(HID, C), r(C),
    )


def test_fused_tail_matches_reference():
    rng = np.random.RandomState(1)
    xf = jnp.asarray(rng.randn(2, 5, 7, C), jnp.float32).astype(jnp.bfloat16)
    resid = jnp.asarray(rng.randn(2, 5, 7, C), jnp.float32).astype(jnp.bfloat16)
    noise = jnp.asarray(rng.randn(2, 5, 7, NC), jnp.float32)
    w = _weights()
    out = fused_block_tail(xf, resid, noise, w, interpret=True)
    ref = _reference_tail(xf, resid, noise, w, widen=True)
    assert out.shape == ref.shape and out.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=scale * 1.6e-2, rtol=0,
    )


def test_fused_tail_gradients():
    rng = np.random.RandomState(2)
    xf = jnp.asarray(rng.randn(1, 4, 4, C), jnp.float32).astype(jnp.bfloat16)
    resid = jnp.asarray(rng.randn(1, 4, 4, C), jnp.float32).astype(jnp.bfloat16)
    noise = jnp.asarray(rng.randn(1, 4, 4, NC), jnp.float32)
    w = _weights()

    def loss_fused(w):
        return jnp.sum(
            fused_block_tail(xf, resid, noise, w, interpret=True)
            .astype(jnp.float32) ** 2
        )

    def loss_ref(w):
        return jnp.sum(
            _reference_tail(xf, resid, noise, w, widen=True)
            .astype(jnp.float32) ** 2
        )

    gf = jax.grad(loss_fused)(w)
    gr = jax.grad(loss_ref)(w)
    for a, b in zip(gf, gr):
        s = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=s * 3e-2, rtol=0,
        )


def _block(dtype):
    fwd = build_sht(NLAT, NLON, grid="legendre-gauss", channels_last=True)
    inv = build_isht(NLAT, NLON, grid="legendre-gauss", channels_last=True)
    return ConditionalFNOBlock(
        forward_transform=fwd, inverse_transform=inv,
        embed_dim=C, embed_dim_noise=NC, mlp_ratio=2.0,
        affine_norms=True, dtype=dtype,
    )


def test_block_fused_path_matches_module_path(monkeypatch):
    """Same params, same inputs: the fused-tail branch of
    ConditionalFNOBlock agrees with the module branch at bf16
    tolerance, and the param trees are IDENTICAL (checkpoints are
    interchangeable)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, NLAT, NLON, C), jnp.float32)
    noise = jnp.asarray(rng.randn(1, NLAT, NLON, NC), jnp.float32)
    block = _block(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)

    monkeypatch.setenv("ACE_TPU_PALLAS_BLOCK", "0")
    monkeypatch.setenv("ACE_TPU_PALLAS_FILTER", "0")
    params_module = block.init(jax.random.PRNGKey(0), xb, noise)
    ref = block.apply(params_module, xb, noise)

    monkeypatch.setenv("ACE_TPU_PALLAS_BLOCK", "interpret")
    params_fused = block.init(jax.random.PRNGKey(0), xb, noise)
    # identical param trees: same paths, same shapes, same init values
    flat_m = jax.tree_util.tree_flatten_with_path(params_module)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(params_fused)[0]
    assert [p for p, _ in flat_m] == [p for p, _ in flat_f]
    for (pm, lm), (pf, lf) in zip(flat_m, flat_f):
        np.testing.assert_array_equal(
            np.asarray(lm), np.asarray(lf),
            err_msg=str(pm),
        )

    out = block.apply(params_module, xb, noise)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=scale * 2e-2, rtol=0,
    )


def test_block_f32_path_unchanged(monkeypatch):
    """f32 activations never route through the fused kernel (parity
    oracles depend on the exact module path)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, NLAT, NLON, C), jnp.float32)
    noise = jnp.asarray(rng.randn(1, NLAT, NLON, NC), jnp.float32)
    block = _block(jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, noise)
    monkeypatch.setenv("ACE_TPU_PALLAS_BLOCK", "interpret")
    out_forced = block.apply(params, x, noise)
    monkeypatch.setenv("ACE_TPU_PALLAS_BLOCK", "0")
    out_off = block.apply(params, x, noise)
    np.testing.assert_array_equal(
        np.asarray(out_forced), np.asarray(out_off)
    )


def test_tail_shapes_gate():
    assert tail_shapes_supported(512, 1024)
    assert not tail_shapes_supported(8, 16)
