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


@partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_self_attention_blhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray | None = None,
    block_q: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Layout-native variant: q/k/v in [B, N, H, D] — the layout the QKV
    projections produce (Dense out [B, N, H*D] reshaped) — so no [B,H,N,D]
    transpose ever materializes in HBM; the block specs stride over the H axis
    directly (a rectangular window DMA), which is the fix for the round-2
    producer-fusion boundary (STATUS: pad/transpose breaking fusion).

    Returns [B, N, H, D]."""
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, block_q)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, d_pad - d)))

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
            pl.BlockSpec((None, block_q, None, d_pad), lambda bi, hi, qi: (bi, qi, hi, 0)),
            pl.BlockSpec((None, n_pad, None, d_pad), lambda bi, hi, qi: (bi, 0, hi, 0)),
            pl.BlockSpec((None, n_pad, None, d_pad), lambda bi, hi, qi: (bi, 0, hi, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, None, d_pad), lambda bi, hi, qi: (bi, qi, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h, d_pad), q.dtype),
        interpret=interpret,
    )(bias, qp, kp, vp)
    return out[:, :n, :, :d]


def xla_self_attention(q, k, v, key_padding_mask=None):
    """Reference XLA formulation (used for training and as a test oracle)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) / (d**0.5)
    if key_padding_mask is not None:
        s = jnp.where(key_padding_mask[:, None, None, :], _NEG, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)


# --------------------------------------------------------------------------
# Training flash attention: fwd + bwd kernels with IN-KERNEL probability
# dropout. This is the train-path replacement for the XLA attention whose
# profile shows two walls at flagship shapes: the [B, H, N, N] probability
# tensors (630 MB per layer at level 0) streamed through HBM, and ~22 ms
# minor-dim transposes ([B,N,H,D] -> [B,H,D,N]) feeding the einsums. Both
# kernels read the projections' native [B, N, H, D] layout via strided block
# windows and never materialize probabilities.
#
# Dropout (torch MultiheadAttention drops attention PROBABILITIES — the
# reference's token_dropout, cross_f_box_layers.py:50-58) uses a
# counter-based integer hash (murmur3 finalizer over (row, col, grid cell,
# seed)), so the backward pass regenerates the identical mask by
# construction — no RNG state, works under interpret mode on CPU.
# --------------------------------------------------------------------------


def _dropout_keep_mask(rows: int, cols: int, seed, cell, rate: float):
    """[rows, cols] bool keep-mask; drop probability = rate."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
    x = (
        r * jnp.uint32(0x9E3779B9)
        + c * jnp.uint32(0x85EBCA6B)
        + (seed.astype(jnp.uint32)
           + jnp.asarray(cell).astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    return x >= thresh


def _fwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate, n_q_blocks):
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if rate > 0.0:
        cell = (bi * pl.num_programs(1) + hi) * n_q_blocks + qi
        keep = _dropout_keep_mask(*p.shape, seed_ref[0, 0], cell, rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate, n_q_blocks):
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    # Recompute the forward probabilities (exact same math + mask).
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if rate > 0.0:
        cell = (bi * pl.num_programs(1) + hi) * n_q_blocks + qi
        keep = _dropout_keep_mask(*p.shape, seed_ref[0, 0], cell, rate)
        inv = 1.0 / (1.0 - rate)
        pt = jnp.where(keep, p, 0.0) * inv  # dropped+scaled probs (fwd's p)
    else:
        pt = p
    # dV += P̃^T dO
    dv_ref[:] += jax.lax.dot_general(pt, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    # dP̃ = dO V^T ; chain through dropout; softmax VJP
    dpt = jax.lax.dot_general(do, v_ref[:].astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = jnp.where(keep, dpt, 0.0) * inv
    else:
        dp = dpt
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[:] = (jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
                 ).astype(dq_ref.dtype)
    dk_ref[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale


def _pad_nd(x, n_pad, d_pad):
    b, n, h, d = x.shape
    return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, d_pad - d)))


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_core(q, k, v, bias, seed, rate: float, block_q: int):
    out, _ = _flash_fwd(q, k, v, bias, seed, rate, block_q)
    return out


def _flash_fwd(q, k, v, bias, seed, rate: float, block_q: int):
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, block_q)
    qp, kp, vp = (_pad_nd(x, n_pad, d_pad) for x in (q, k, v))
    bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=_NEG)
    nq = n_pad // block_q
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        partial(_fwd_kernel, scale=scale, rate=rate, n_q_blocks=nq),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, n_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((None, block_q, None, d_pad), lambda bi, hi, qi: (bi, qi, hi, 0)),
            pl.BlockSpec((None, n_pad, None, d_pad), lambda bi, hi, qi: (bi, 0, hi, 0)),
            pl.BlockSpec((None, n_pad, None, d_pad), lambda bi, hi, qi: (bi, 0, hi, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, None, d_pad), lambda bi, hi, qi: (bi, qi, hi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h, d_pad), q.dtype),
        interpret=interpret,
    )(seed, bias_p, qp, kp, vp)
    return out[:, :n, :, :d], (q, k, v, bias, seed)


def _flash_bwd(rate: float, block_q: int, res, dout):
    q, k, v, bias, seed = res
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, block_q)
    qp, kp, vp, dop = (_pad_nd(x, n_pad, d_pad) for x in (q, k, v, dout))
    bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=_NEG)
    nq = n_pad // block_q
    interpret = jax.default_backend() != "tpu"
    kv_spec = pl.BlockSpec((None, n_pad, None, d_pad), lambda bi, hi, qi: (bi, 0, hi, 0))
    qblk_spec = pl.BlockSpec((None, block_q, None, d_pad), lambda bi, hi, qi: (bi, qi, hi, 0))
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, scale=scale, rate=rate, n_q_blocks=nq),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, n_pad), lambda bi, hi, qi: (bi, 0, 0)),
            qblk_spec, kv_spec, kv_spec, qblk_spec,
        ],
        # dK/dV blocks revisit across the (innermost) qi steps and accumulate
        # in VMEM; f32 accumulators, cast by the consumer.
        out_specs=[qblk_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, h, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, h, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, h, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(seed, bias_p, qp, kp, vp, dop)
    import numpy as np

    unpad = lambda x: x[:, :n, :, :d]  # noqa: E731
    zero_bias = jnp.zeros_like(bias)
    zero_seed = np.zeros(seed.shape, jax.dtypes.float0)
    return (unpad(dq), unpad(dk).astype(k.dtype), unpad(dv).astype(v.dtype),
            zero_bias, zero_seed)


_flash_attention_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_train(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    seed=None,
    block_q: int = 256,
) -> jnp.ndarray:
    """Differentiable fused attention with probability dropout.

    q/k/v: [B, N, H, D] (the projections' native layout); key_padding_mask:
    [B, N] bool, True = ignore; seed: int32 scalar/array varying per step
    (ignored when dropout_rate == 0). Returns [B, N, H, D]."""
    b, n, h, d = q.shape
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, n), bool)
    bias = jnp.where(key_padding_mask, _NEG, 0.0).astype(jnp.float32)[:, None, :]
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1].reshape(1, 1)
    return _flash_attention_core(q, k, v, bias, seed, float(dropout_rate), int(block_q))
