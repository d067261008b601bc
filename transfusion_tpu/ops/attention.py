"""Fused self-attention Pallas kernel for the fusion encoder.

The fusion stack's hot attention is over vis+lang sequences of a few
thousand tokens (level 0 at 768x1024 -> 3072 visual + <=128 language tokens)
with 4 heads of dim 224. The XLA path materializes [B, H, N, N] probability
tensors through HBM; this kernel keeps each (batch, head) pair's K/V resident
in VMEM and streams q in blocks, computing the exact softmax per q block —
for N <= ~8k (the MAX_NUM_PATCHES cap) everything fits on-chip, so no online
rescaling is needed and the math matches the reference bit-for-bit in f32.

Used on the inference path (training keeps the XLA formulation because the
reference applies dropout inside attention probabilities). The wrapper pads
head_dim to a lane multiple and N to the q-block size; padded keys are
masked, padded head dims contribute zeros.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _attn_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, N]
    s = s + mask_ref[:]  # [1, N] broadcast additive mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray | None = None,
    block_q: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """q/k/v: [B, H, N, D]; key_padding_mask: [B, N] bool, True = ignore.

    Returns [B, H, N, D] with exact softmax semantics (scale 1/sqrt(D) over
    the TRUE head dim, before padding).
    """
    b, h, n, d = q.shape
    scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, block_q)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, n), bool)
    mask = jnp.pad(key_padding_mask, ((0, 0), (0, n_pad - n)), constant_values=True)
    bias = jnp.where(mask, _NEG, 0.0).astype(jnp.float32)[:, None, :]  # [B, 1, N]

    grid = (b, h, n_pad // block_q)
    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, n_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((None, None, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((None, None, n_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((None, None, n_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(bias, qp, kp, vp)
    return out[:, :, :n, :d]


def xla_self_attention(q, k, v, key_padding_mask=None):
    """Reference XLA formulation (used for training and as a test oracle)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) / (d**0.5)
    if key_padding_mask is not None:
        s = jnp.where(key_padding_mask[:, None, None, :], _NEG, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)
