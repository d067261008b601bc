"""Fused attention kernels: forward parity vs the XLA oracle, and the
training kernel's custom VJP (gradients + in-kernel dropout consistency).
Runs in Pallas interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transfusion_tpu.ops.attention import (
    flash_attention_train,
    flash_self_attention,
    flash_self_attention_blhd,
    xla_self_attention,
)


def _inputs(rng, b=2, n=70, h=2, d=24):
    q = rng.normal(0, 1, (b, n, h, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, n, h, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, n, h, d)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[0, 61:] = True  # padded tail on one batch row
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)


def _oracle(q, k, v, mask):
    # [B, N, H, D] -> oracle layout [B, H, N, D]
    t = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    return t(xla_self_attention(t(q), t(k), t(v), mask))


def test_blhd_forward_parity(rng):
    q, k, v, mask = _inputs(rng)
    got = flash_self_attention_blhd(q, k, v, mask, block_q=32)
    ref = _oracle(q, k, v, mask)
    valid = ~np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(ref)[valid], rtol=2e-5, atol=2e-5
    )


def test_bhnd_and_blhd_agree(rng):
    q, k, v, mask = _inputs(rng, n=40, d=16)
    t = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
    a = flash_self_attention(t(q), t(k), t(v), mask, block_q=32)
    b = flash_self_attention_blhd(q, k, v, mask, block_q=32)
    np.testing.assert_allclose(np.asarray(t(a)), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_train_kernel_forward_matches_oracle_no_dropout(rng):
    q, k, v, mask = _inputs(rng)
    got = flash_attention_train(q, k, v, mask, dropout_rate=0.0, block_q=32)
    ref = _oracle(q, k, v, mask)
    valid = ~np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(ref)[valid], rtol=2e-5, atol=2e-5
    )


def test_train_kernel_grads_match_xla_no_dropout(rng):
    q, k, v, mask = _inputs(rng, b=1, n=50, h=2, d=12)

    def loss_flash(q, k, v):
        out = flash_attention_train(q, k, v, mask, dropout_rate=0.0, block_q=32)
        w = jnp.where(mask[..., None, None], 0.0, 1.0)
        return jnp.sum((out * w) ** 2)

    def loss_xla(q, k, v):
        out = _oracle(q, k, v, mask)
        w = jnp.where(mask[..., None, None], 0.0, 1.0)
        return jnp.sum((out * w) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name}")


def test_train_kernel_dropout_statistics_and_determinism(rng):
    q, k, v, mask = _inputs(rng, b=2, n=64, h=2, d=16)
    seed = jnp.asarray(123, jnp.int32)
    a1 = flash_attention_train(q, k, v, mask, dropout_rate=0.3, seed=seed, block_q=32)
    a2 = flash_attention_train(q, k, v, mask, dropout_rate=0.3, seed=seed, block_q=32)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # same seed = same mask
    a3 = flash_attention_train(q, k, v, mask, dropout_rate=0.3, seed=seed + 1, block_q=32)
    assert np.abs(np.asarray(a1) - np.asarray(a3)).max() > 1e-4  # different seed

    # Unbiasedness: averaged over many seeds, dropout-scaled attention
    # approaches the no-dropout output.
    outs = [
        np.asarray(flash_attention_train(q, k, v, mask, dropout_rate=0.3,
                                         seed=jnp.asarray(s, jnp.int32), block_q=32))
        for s in range(24)
    ]
    ref = np.asarray(flash_attention_train(q, k, v, mask, dropout_rate=0.0, block_q=32))
    valid = ~np.asarray(mask)
    err = np.abs(np.mean(outs, 0) - ref)[valid].mean() / (np.abs(ref)[valid].mean() + 1e-9)
    assert err < 0.15, err


def test_train_kernel_dropout_grads_finite_difference(rng):
    """The critical property: the backward pass regenerates the SAME dropout
    mask the forward used — checked by finite differences at a fixed seed."""
    q, k, v, mask = _inputs(rng, b=1, n=34, h=1, d=8)
    seed = jnp.asarray(7, jnp.int32)

    def f(q, k, v):
        out = flash_attention_train(q, k, v, mask, dropout_rate=0.25, seed=seed, block_q=32)
        w = jnp.where(mask[..., None, None], 0.0, 1.0)
        return jnp.sum(jnp.sin(out) * w)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    eps = 1e-3
    rng2 = np.random.default_rng(0)
    for gi, (name, x) in enumerate(zip("qkv", (q, k, v))):
        for _ in range(4):
            idx = tuple(rng2.integers(0, s) for s in x.shape)
            xp = x.at[idx].add(eps)
            xm = x.at[idx].add(-eps)
            args_p = [q, k, v]
            args_m = [q, k, v]
            args_p[gi] = xp
            args_m[gi] = xm
            fd = (f(*args_p) - f(*args_m)) / (2 * eps)
            got = grads[gi][idx]
            np.testing.assert_allclose(np.asarray(got), np.asarray(fd), rtol=2e-2, atol=2e-3,
                                       err_msg=f"d{name}[{idx}]")
