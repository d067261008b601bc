"""GPT-2 and T5 encoder-only narration encoders.

The reference's alternative language towers
(``modeling/narration_embeds/narr_pooling_layers.py:260-406``): a distilgpt2
transformer with the LM head removed, and a T5 encoder stack (flan-t5 /
t5-wikihow variants), both mean-pooled with the attention mask, L2-normalized,
then projected by ``out_mlp``. Token mode for these encoders feeds the raw
last hidden states to the fusion stack.

Architectures match huggingface GPT2Model / T5EncoderModel so checkpoints
translate 1:1 (parity-tested against config-constructed torch models).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from transfusion_tpu.models.text_encoder import mean_pool


# --------------------------------------------------------------------- GPT-2


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 6  # distilgpt2
    num_heads: int = 12
    max_positions: int = 1024
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1


def gelu_new(x):
    """GPT-2's tanh-approximated gelu."""
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


class GPT2Block(nn.Module):
    cfg: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, deterministic):
        c = self.cfg
        b, l, d = x.shape
        head_dim = d // c.num_heads

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, l, c.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))
        mask = causal[None, None] & (attention_mask[:, None, None, :] > 0)
        scores = jnp.where(mask, scores, -1e9)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, d)
        attn = nn.Dense(d, dtype=self.dtype, name="c_proj")(ctx)
        x = x + nn.Dropout(c.dropout, deterministic=deterministic)(attn)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(h)
        h = gelu_new(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_proj")(h)
        return x + nn.Dropout(c.dropout, deterministic=deterministic)(h)


class GPT2Encoder(nn.Module):
    cfg: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        l = input_ids.shape[1]
        wte = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="wte")(input_ids)
        wpe = self.param("wpe", nn.initializers.normal(0.02), (c.max_positions, c.hidden_size))
        h = wte + wpe[None, :l].astype(self.dtype)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        for i in range(c.num_layers):
            h = GPT2Block(c, self.dtype, name=f"h_{i}")(h, attention_mask, deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_f")(h)


# ----------------------------------------------------------------------- T5


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    hidden_size: int = 512
    num_layers: int = 6
    num_heads: int = 8
    head_dim: int = 64
    ff_dim: int = 2048
    gated_ff: bool = False  # flan-t5 uses gated gelu; t5 v1.0 plain relu
    relative_buckets: int = 32
    relative_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dropout: float = 0.1


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def t5_relative_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional bucketing (T5 encoder)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, position_bias, deterministic):
        c = self.cfg
        b, l, d = x.shape
        inner = c.num_heads * c.head_dim

        h = RMSNorm(c.layer_norm_eps, name="ln_attn")(x)

        def proj(name, t):
            return nn.Dense(inner, use_bias=False, dtype=self.dtype, name=name)(t).reshape(
                b, l, c.num_heads, c.head_dim
            )

        q, k, v = proj("q", h), proj("k", h), proj("v", h)
        # T5 does NOT scale by sqrt(head_dim).
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if position_bias is None:
            rel = jnp.arange(l)[None, :] - jnp.arange(l)[:, None]  # memory - query
            buckets = t5_relative_bucket(rel, c.relative_buckets, c.relative_max_distance)
            table = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (c.relative_buckets, c.num_heads),
            )
            position_bias = table[buckets].transpose(2, 0, 1)[None].astype(scores.dtype)
        scores = scores + position_bias
        scores = jnp.where(attention_mask[:, None, None, :] > 0, scores, -1e9)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, inner)
        attn = nn.Dense(d, use_bias=False, dtype=self.dtype, name="o")(ctx)
        x = x + nn.Dropout(c.dropout, deterministic=deterministic)(attn)

        h = RMSNorm(c.layer_norm_eps, name="ln_ff")(x)
        if c.gated_ff:
            g = nn.gelu(nn.Dense(c.ff_dim, use_bias=False, dtype=self.dtype, name="wi_0")(h), approximate=True)
            u = nn.Dense(c.ff_dim, use_bias=False, dtype=self.dtype, name="wi_1")(h)
            h = g * u
        else:
            h = nn.relu(nn.Dense(c.ff_dim, use_bias=False, dtype=self.dtype, name="wi")(h))
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        h = nn.Dense(d, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x + nn.Dropout(c.dropout, deterministic=deterministic)(h), position_bias


class T5Encoder(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        h = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="shared")(input_ids)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        bias = None
        for i in range(c.num_layers):
            h, bias = T5Block(c, has_relative_bias=(i == 0), dtype=self.dtype, name=f"block_{i}")(
                h, attention_mask, bias if i > 0 else None, deterministic
            )
        h = RMSNorm(c.layer_norm_eps, name="final_norm")(h)
        return nn.Dropout(c.dropout, deterministic=deterministic)(h)


# ------------------------------------------------------- pooled narration API


class PooledLMEncoder(nn.Module):
    """GPT2Layer/T5WikiLayer-equivalent head: encoder -> (tokens | mean pool +
    L2 norm) -> out_mlp -> tanh? -> dropout (narr_pooling_layers.py:297-328,
    375-406)."""

    encoder: nn.Module
    out_mode: str = "tokens"
    out_mlp: int | None = None
    out_tanh: bool = False
    out_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        tokens = self.encoder(input_ids, attention_mask, deterministic)
        if self.out_mode == "embedding":
            out = mean_pool(tokens, attention_mask)
            out = out / jnp.clip(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        else:
            out = tokens
        if self.out_mlp and self.out_mlp != out.shape[-1]:
            out = nn.Dense(self.out_mlp, dtype=self.dtype, name="out_mlp")(out)
        if self.out_tanh:
            out = jnp.tanh(out)
        out = nn.Dropout(self.out_dropout, deterministic=deterministic)(out)
        return out, attention_mask
