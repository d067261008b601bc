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
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Normalize the [BQ, D] output instead of the [BQ, N] probabilities —
    # the row-scalar divide commutes with the row-sum matmul, saving a
    # full-row VPU pass per block.
    o_ref[:] = (o / denom).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _train_padded_len(n: int, block_q: int) -> int:
    """Padded sequence length for the train kernels: a block_q multiple, and
    additionally a multiple of 128 whenever the backward would have to
    STREAM the opposing axis (n_pad > 1024) — the streamed chunk divides
    n_pad and must be 128-aligned because both backward kernels slice the
    bias row along the lane axis (Mosaic requires provably 128-aligned
    lane-dim offsets; real-TPU compile rejects e.g. chunk 800). For
    n_pad <= 1024 the chunk is the whole row (offset 0), so any block_q
    works (CPU tests use 32)."""
    import math

    n_pad = _round_up(n, block_q)
    if n_pad > 1024:
        n_pad = _round_up(n_pad, block_q * 128 // math.gcd(block_q, 128))
    return n_pad


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

    qp, kp, vp = (_pad_flatten(x, n_pad, d_pad) for x in (q, k, v))
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, n), bool)
    mask = jnp.pad(key_padding_mask, ((0, 0), (0, n_pad - n)), constant_values=True)
    bias = jnp.where(mask, _NEG, 0.0).astype(jnp.float32)[:, None, :]  # [B, 1, N]

    # Flattened [B, N, H*Dp] blocks: the head is selected by the LAST-dim
    # block index (hi), so every block's trailing dims are (block_q, d_pad) —
    # 8/128-aligned as Mosaic requires — with no [B,H,N,D] transpose in HBM.
    grid = (b, h, n_pad // block_q)
    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, n_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((None, block_q, d_pad), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, qi: (bi, 0, hi)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d_pad), lambda bi, hi, qi: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h * d_pad), q.dtype),
        interpret=interpret,
    )(bias, qp, kp, vp)
    return out.reshape(b, n_pad, h, d_pad)[:, :n, :, :d]


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
# minor-dim transposes ([B,N,H,D] -> [B,H,D,N]) feeding the einsums. All
# kernels read the projections' native [B, N, H, D] layout (padded+flattened
# to [B, N, H*Dp] so blocks meet Mosaic's 8/128 tiling) and never
# materialize probabilities in HBM.
#
# Structure (classic two-pass flash backward, VMEM-bounded at any N):
#   fwd:  one pass per q-block over resident K/V; writes O and the per-row
#         softmax stats (row max m, normalizer l) into a small f32 side
#         array (lanes 0:32 = m, 32:64 = l).
#   bwd dQ:  per q-block, fori_loop over KEY chunks (temps are
#         [block_q, chunk] — a few hundred KB, never the full row set);
#         D = rowsum(dO*O) is local to the block. Recomputes nothing global.
#   bwd dK/dV: per k-block, fori_loop over QUERY chunks using the STORED
#         f32 m/l (exact fwd probabilities by construction).
#
# Dropout (torch MultiheadAttention drops attention PROBABILITIES — the
# reference's token_dropout, cross_f_box_layers.py:50-58) uses a
# counter-based integer hash (murmur3 finalizer) over GLOBAL
# (query_idx, key_idx, batch*head, seed) coordinates, so every pass —
# whatever its blocking — regenerates the identical mask by construction:
# no RNG state, no saved mask bytes, works under interpret mode on CPU.
# --------------------------------------------------------------------------


def _dropout_keep_mask(rows: int, cols: int, row_off, col_off, seed, cell, rate: float):
    """[rows, cols] bool keep-mask at global offsets; drop probability = rate."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0) + jnp.asarray(row_off).astype(jnp.uint32)
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1) + jnp.asarray(col_off).astype(jnp.uint32)
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


def _fwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, scale, rate, block_q):
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    # Matmuls run in the INPUT dtype with f32 accumulation: bf16 model inputs
    # hit the MXU at its native rate (upcasting to f32 first quarters it);
    # f32 test inputs keep f32 exactness. All softmax math stays f32.
    s = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if rate > 0.0:
        cell = bi * pl.num_programs(1) + hi
        keep = _dropout_keep_mask(*p.shape, qi * block_q, 0, seed_ref[0, 0], cell, rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # Normalize the [BQ, D] output instead of the [BQ, N] probabilities (the
    # per-row 1/l commutes with the dropout mask and the row-sum matmul) —
    # saves a full-row VPU pass; the backward reconstructs p from the stored
    # (m, l) stats either way.
    o_ref[:] = (o / l).astype(o_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], 128), 1)
    lse_ref[:] = jnp.where(lane < 32, m, l)


def _bwd_dq_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                   lse_ref, dq_ref, *, scale, rate, block_q, chunk):
    """Per q-block dQ, streaming keys in `chunk`-wide slices so the live
    temporaries are [block_q, chunk] regardless of N. Softmax stats come from
    the forward's stored f32 (m, l) — no recompute pass. Matmuls run in the
    INPUT dtype with f32 accumulation (bf16 hits the MXU at native rate;
    f32 test inputs stay exact); only the softmax/scale math is f32."""
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cell = bi * pl.num_programs(1) + hi
    dt = q_ref.dtype
    q = q_ref[:]
    do = do_ref[:]
    # D_i = sum_d dO_id O_id = sum_j p~_ij dp~_ij (zero-padded lanes drop out).
    d_row = jnp.sum(do.astype(jnp.float32) * o_ref[:].astype(jnp.float32),
                    axis=-1, keepdims=True)
    n_pad = k_ref.shape[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    stats = lse_ref[:]  # [block_q, 128]: lanes 0:32 = m, 32:64 = l
    m, l = stats[:, 0:1], stats[:, 32:33]

    def grad_body(ci, dq):
        kc = k_ref[pl.ds(ci * chunk, chunk), :]
        vc = v_ref[pl.ds(ci * chunk, chunk), :]
        bc = bias_ref[:, pl.ds(ci * chunk, chunk)]
        s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale + bc
        p = jnp.exp(s - m) / l
        dpt = jax.lax.dot_general(do, vc, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _dropout_keep_mask(*p.shape, qi * block_q, ci * chunk,
                                      seed_ref[0, 0], cell, rate)
            dp = jnp.where(keep, dpt, 0.0) * inv
        else:
            dp = dpt
        ds = (p * (dp - d_row)).astype(dt)
        return dq + jax.lax.dot_general(ds, kc, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, n_pad // chunk, grad_body,
                           jnp.zeros((q.shape[0], q_ref.shape[1]), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(seed_ref, bias_ref, k_ref, v_ref, q_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, *, scale, rate, block_k, chunk):
    """Per k-block dK/dV, streaming queries in `chunk`-tall slices; exact fwd
    probabilities via the stored f32 (m, l) stats."""
    bi, hi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cell = bi * pl.num_programs(1) + hi
    dt = q_ref.dtype
    k = k_ref[:]
    v = v_ref[:]
    bias = bias_ref[:]  # [1, block_k]
    n_pad = q_ref.shape[0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    def body(ci, carry):
        dk, dv = carry
        qc = q_ref[pl.ds(ci * chunk, chunk), :]
        doc = do_ref[pl.ds(ci * chunk, chunk), :]
        oc = o_ref[pl.ds(ci * chunk, chunk), :]
        lsec = lse_ref[pl.ds(ci * chunk, chunk), :]
        m, l = lsec[:, 0:1], lsec[:, 32:33]
        s = jax.lax.dot_general(qc, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale + bias
        p = jnp.exp(s - m) / l  # [chunk, block_k]
        d_row = jnp.sum(doc.astype(jnp.float32) * oc.astype(jnp.float32),
                        axis=-1, keepdims=True)
        dpt = jax.lax.dot_general(doc, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _dropout_keep_mask(*p.shape, ci * chunk, ki * block_k,
                                      seed_ref[0, 0], cell, rate)
            pt = jnp.where(keep, p, 0.0) * inv
            dp = jnp.where(keep, dpt, 0.0) * inv
        else:
            pt, dp = p, dpt
        ds = (p * (dp - d_row)).astype(dt)
        dv = dv + jax.lax.dot_general(pt.astype(dt), doc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dk = dk + jax.lax.dot_general(ds, qc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
        return dk, dv

    zero = jnp.zeros((k.shape[0], k.shape[1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_pad // chunk, body, (zero, zero))
    # Accumulate in f32, store in the model dtype: writing bf16 halves the
    # dK/dV HBM write traffic (and the matching convert outside the kernel).
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _pad_flatten(x, n_pad, d_pad):
    """[B, N, H, D] -> [B, n_pad, H*d_pad]: pad N and the head dim to aligned
    sizes, then flatten heads into the lane axis so Pallas blocks over
    (block_q, d_pad) windows select a head via the last-dim block index —
    Mosaic's 8/128 block-tiling constraint is met without any [B,H,N,D]
    transpose materializing in HBM."""
    b, n, h, d = x.shape
    x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, d_pad - d)))
    return x.reshape(b, n_pad, h * d_pad)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_core(q, k, v, bias, seed, rate: float, block_q: int):
    out, _ = _flash_fwd(q, k, v, bias, seed, rate, block_q)
    return out


def _flash_fwd(q, k, v, bias, seed, rate: float, block_q: int):
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    d_pad = _round_up(d, 128)
    n_pad = _train_padded_len(n, block_q)
    qp, kp, vp = (_pad_flatten(x, n_pad, d_pad) for x in (q, k, v))
    bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=_NEG)
    nq = n_pad // block_q
    interpret = jax.default_backend() != "tpu"
    out, lse = pl.pallas_call(
        partial(_fwd_kernel, scale=scale, rate=rate, block_q=block_q),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, n_pad), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((None, block_q, d_pad), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, qi: (bi, 0, hi)),
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, qi: (bi, 0, hi)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda bi, hi, qi: (bi, qi, hi)),
            pl.BlockSpec((None, None, block_q, 128), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, h * d_pad), q.dtype),
            # Per-row f32 softmax stats: lanes 0:32 = running max m,
            # 32:64 = normalizer l (read back by the dK/dV pass).
            jax.ShapeDtypeStruct((b, h, n_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(seed, bias_p, qp, kp, vp)
    out = out.reshape(b, n_pad, h, d_pad)[:, :n, :, :d]
    return out, (q, k, v, bias, seed, out, lse)


def _flash_bwd(rate: float, block_q: int, res, dout):
    q, k, v, bias, seed, out, lse = res
    b, n, h, d = q.shape
    scale = 1.0 / (d**0.5)
    d_pad = _round_up(d, 128)
    n_pad = _train_padded_len(n, block_q)
    qp, kp, vp, dop, op = (_pad_flatten(x, n_pad, d_pad) for x in (q, k, v, dout, out))
    bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=_NEG)
    nq = n_pad // block_q
    # Stream the opposing sequence axis in the LARGEST chunk that keeps the
    # kernel VMEM-bounded: small (block_q-sized) chunks turn the backward
    # into many [128, 128]-output matmuls that leave the MXU idle between
    # loop iterations (measured 64-68 TFLOP/s); wide chunks keep it
    # streaming. n_pad is a block_q multiple, so divide by the smallest m
    # that brings the chunk to <=1024 columns (chunk 1600 blows the 16 MB
    # scoped-VMEM stack in the dK/dV pass: 18.1M measured; 1024 fits with
    # resident K/V + f32 temps at the MAX_NUM_PATCHES cap). The chunk must
    # be a multiple of 128: both backward kernels take chunk-wide dynamic
    # slices of the bias row along the LANE axis (bias_ref[:, ds(ci*chunk,
    # chunk)]), and Mosaic requires lane-dim slice offsets provably
    # 128-aligned (real-TPU compile rejects chunk 800 at n_pad 3200).
    chunk = n_pad
    m = 1
    while chunk > 1024:
        m += 1
        while n_pad % m or (n_pad // m) % 128:
            m += 1
        chunk = n_pad // m
    interpret = jax.default_backend() != "tpu"
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    bias_full = pl.BlockSpec((None, 1, n_pad), lambda bi, hi, qi: (bi, 0, 0))
    kv_full = pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, qi: (bi, 0, hi))
    qblk = pl.BlockSpec((None, block_q, d_pad), lambda bi, hi, qi: (bi, qi, hi))
    lse_qblk = pl.BlockSpec((None, None, block_q, 128), lambda bi, hi, qi: (bi, hi, qi, 0))
    dq = pl.pallas_call(
        partial(_bwd_dq_kernel, scale=scale, rate=rate, block_q=block_q, chunk=chunk),
        grid=(b, h, nq),
        in_specs=[smem, bias_full, qblk, kv_full, kv_full, qblk, qblk, lse_qblk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h * d_pad), q.dtype),
        interpret=interpret,
    )(seed, bias_p, qp, kp, vp, dop, op, lse)
    block_k = block_q
    kblk = pl.BlockSpec((None, block_k, d_pad), lambda bi, hi, ki: (bi, ki, hi))
    dk, dv = pl.pallas_call(
        partial(_bwd_dkv_kernel, scale=scale, rate=rate, block_k=block_k, chunk=chunk),
        grid=(b, h, n_pad // block_k),
        in_specs=[
            smem,
            pl.BlockSpec((None, 1, block_k), lambda bi, hi, ki: (bi, 0, ki)),
            kblk, kblk,
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, ki: (bi, 0, hi)),
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, ki: (bi, 0, hi)),
            pl.BlockSpec((None, n_pad, d_pad), lambda bi, hi, ki: (bi, 0, hi)),
            pl.BlockSpec((None, None, n_pad, 128), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_specs=[kblk, kblk],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, h * d_pad), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, h * d_pad), v.dtype),
        ],
        interpret=interpret,
    )(seed, bias_p, kp, vp, qp, dop, op, lse)
    import numpy as np

    unpad = lambda x: x.reshape(b, n_pad, h, d_pad)[:, :n, :, :d]  # noqa: E731
    zero_bias = jnp.zeros_like(bias)
    zero_seed = np.zeros(seed.shape, jax.dtypes.float0)
    return (unpad(dq), unpad(dk), unpad(dv), zero_bias, zero_seed)


_flash_attention_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_train(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: jnp.ndarray | None = None,
    dropout_rate: float = 0.0,
    seed=None,
    block_q: int | None = None,
) -> jnp.ndarray:
    """Differentiable fused attention with probability dropout.

    q/k/v: [B, N, H, D] (the projections' native layout); key_padding_mask:
    [B, N] bool, True = ignore; seed: int32 scalar/array varying per step
    (ignored when dropout_rate == 0). Returns [B, N, H, D].

    block_q: q-block rows per grid step (also the dK/dV pass's k-block).
    Default from TRANSFUSION_FLASH_BLOCK_Q (128); larger blocks raise
    arithmetic intensity per grid step at the cost of VMEM."""
    if block_q is None:
        import os

        block_q = int(os.environ.get("TRANSFUSION_FLASH_BLOCK_Q", "128"))
    b, n, h, d = q.shape
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, n), bool)
    bias = jnp.where(key_padding_mask, _NEG, 0.0).astype(jnp.float32)[:, None, :]
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1].reshape(1, 1)
    return _flash_attention_core(q, k, v, bias, seed, float(dropout_rate), int(block_q))
