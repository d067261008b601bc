"""Fused LayerNorm (ops/layer_norm.py) parity vs flax.linen.LayerNorm.

The kernel computes row statistics with MXU matmuls against a ones matrix
(XLA's cross-lane LN reductions profiled at ~10% of HBM peak); semantics
must match flax's fast-variance LayerNorm bit-for-tolerance, forward and
backward, at the fusion stack's shapes and at awkward (non-128-multiple)
feature widths.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.ops.layer_norm import FusedLayerNorm, fused_layer_norm


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("d", [896, 256, 200, 64])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_forward_parity(rng, d, dtype):
    x = jnp.asarray(rng.normal(2.0, 3.0, (2, 37, d)).astype(np.float32)).astype(dtype)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, (d,)).astype(np.float32))
    got = fused_layer_norm(x, scale, bias)
    ref = nn.LayerNorm(dtype=dtype).apply({"params": {"scale": scale, "bias": bias}}, x)
    assert got.dtype == ref.dtype
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=tol, atol=tol
    )


def test_fused_ln_residual_form_parity(rng):
    """LN(x, residual=h) == LN(x + h), forward and backward (the post-norm
    pattern the fusion encoders use)."""
    d = 896
    x = jnp.asarray(rng.normal(1.0, 2.0, (2, 33, d)).astype(np.float32)).astype(jnp.bfloat16)
    h = jnp.asarray(rng.normal(0.0, 1.0, (2, 33, d)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1.0, 0.2, (d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, (d,)).astype(np.float32))
    got = fused_layer_norm(x, scale, bias, residual=h)
    ref = nn.LayerNorm(dtype=jnp.bfloat16).apply(
        {"params": {"scale": scale, "bias": bias}}, x + h
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
    cot = jnp.asarray(rng.normal(0, 1, x.shape).astype(np.float32))

    def loss_fused(x, h, s, b):
        return (fused_layer_norm(x, s, b, residual=h).astype(jnp.float32) * cot).sum()

    def loss_flax(x, h, s, b):
        y = nn.LayerNorm(dtype=jnp.bfloat16).apply(
            {"params": {"scale": s, "bias": b}}, x + h
        )
        return (y.astype(jnp.float32) * cot).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, h, scale, bias)
    gr = jax.grad(loss_flax, argnums=(0, 1, 2, 3))(x, h, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32), rtol=3e-2, atol=3e-2
        )


def test_fused_ln_grad_parity(rng):
    d = 256
    x = jnp.asarray(rng.normal(1.0, 2.0, (5, 31, d)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1.0, 0.2, (d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, (d,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(0, 1, x.shape).astype(np.float32))

    def loss_fused(x, s, b):
        return (fused_layer_norm(x, s, b) * cot).sum()

    def loss_flax(x, s, b):
        y = nn.LayerNorm().apply({"params": {"scale": s, "bias": b}}, x)
        return (y * cot).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_fused_ln_module_param_compat(rng):
    """FusedLayerNorm exposes the same params as nn.LayerNorm (checkpoint
    translation targets 'scale'/'bias' under the module name) and the env
    fallback path produces the same output."""
    x = jnp.asarray(rng.normal(0, 1, (3, 7, 96)).astype(np.float32))
    v_fused = FusedLayerNorm().init(jax.random.key(0), x)
    v_flax = nn.LayerNorm().init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v_fused) == jax.tree_util.tree_structure(v_flax)
    y = FusedLayerNorm().apply(v_fused, x)
    ref = nn.LayerNorm().apply(v_flax, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_ln_env_fallback(rng, monkeypatch):
    monkeypatch.setenv("TRANSFUSION_FUSED_LN", "0")
    x = jnp.asarray(rng.normal(0, 1, (2, 5, 64)).astype(np.float32))
    variables = FusedLayerNorm().init(jax.random.key(0), x)
    y = FusedLayerNorm().apply(variables, x)
    ref = nn.LayerNorm().apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6, atol=1e-6)
