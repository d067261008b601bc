"""BERT-style text encoder (MiniLM) + the narration pooling layer, in flax.

Covers the reference's ``SBertLayer``
(``modeling/narration_embeds/narr_pooling_layers.py:75-202``): a
sentence-transformers MiniLM encoder whose ``token_embeddings`` (out_mode
"tokens", the shipped config) or mean-pooled, L2-normalized sentence
embedding (out_mode "embedding") feed the fusion stack, followed by an
optional ``out_mlp`` projection (384 -> fusion dim) and dropout. Tokenization
happens host-side (``transfusion_tpu.data.tokenizer``); the encoder takes
``input_ids``/``attention_mask`` arrays.

Post-norm BERT semantics exactly match huggingface ``BertModel`` so MiniLM
checkpoints translate 1:1 (parity-tested against a config-constructed torch
BertModel).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1

    @classmethod
    def minilm_l12(cls) -> "BertConfig":
        return cls()

    @classmethod
    def minilm_l6(cls) -> "BertConfig":
        return cls(num_layers=6)


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, mask, deterministic):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        b, l, _ = hidden.shape

        def heads(name):
            x = nn.Dense(c.hidden_size, dtype=self.dtype, name=name)(hidden)
            return x.reshape(b, l, c.num_heads, head_dim)

        q, k, v = heads("query"), heads("key"), heads("value")
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
        scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(ctx)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, mask, deterministic):
        c = self.cfg
        attn = BertSelfAttention(c, self.dtype, name="attention")(hidden, mask, deterministic)
        attn = nn.Dropout(c.dropout, deterministic=deterministic)(attn)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="attention_norm")(hidden + attn)

        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(c.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_norm")(hidden + out)


class BertEncoder(nn.Module):
    """Returns per-token hidden states [B, L, H]."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        c = self.cfg
        l = input_ids.shape[1]
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02), (c.max_position_embeddings, c.hidden_size)
        )[:l]
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02), (c.type_vocab_size, c.hidden_size))[0]
        h = word + pos[None] + typ[None, None]
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="embeddings_norm")(h)
        h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        for i in range(c.num_layers):
            h = BertLayer(c, self.dtype, name=f"layer_{i}")(h, attention_mask, deterministic)
        return h


def mean_pool(token_embeddings, attention_mask):
    """sentence-transformers mean pooling with mask (Pooling module)."""
    m = attention_mask[..., None].astype(token_embeddings.dtype)
    summed = jnp.sum(token_embeddings * m, axis=1)
    count = jnp.clip(jnp.sum(m, axis=1), 1e-9)
    return summed / count


class NarrationEncoder(nn.Module):
    """SBertLayer equivalent: BERT tokens (or pooled embedding) -> out_mlp -> dropout.

    out_mode "tokens" returns per-token features + mask (the shipped fusion
    path); "embedding" returns the mean-pooled L2-normalized sentence vector.
    """

    cfg: BertConfig
    out_mode: str = "tokens"
    out_mlp: int | None = 896
    out_tanh: bool = False
    out_dropout: float = 0.1
    normalize: bool = True
    # Inline `word<type>` markers in the narration add learned per-type
    # vectors to the marked word's token embeddings after the encoder
    # (SBertLayer, narr_pooling_layers.py:100-110,119-186). The marker
    # parsing/token mapping is host-side (tokenizer.encode_batch_with_types);
    # here a [B, L, T] mask selects which params each token accumulates.
    type_embeddings: tuple = ()
    type_embedding_init_div: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True,
                 type_mask=None):
        tokens = BertEncoder(self.cfg, self.dtype, name="bert")(input_ids, attention_mask, deterministic)
        if self.type_embeddings and type_mask is not None:
            div = self.type_embedding_init_div
            table = jnp.stack([
                self.param(f"type_{name}",
                           nn.initializers.normal(1.0 / div), (self.cfg.hidden_size,))
                for name in self.type_embeddings
            ])  # [T, H]
            tokens = tokens + jnp.einsum(
                "blt,th->blh", type_mask.astype(tokens.dtype), table.astype(tokens.dtype)
            )
        if self.out_mode == "embedding":
            emb = mean_pool(tokens, attention_mask)
            if self.normalize:
                emb = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            out = emb
        else:
            out = tokens
        if self.out_mlp and self.out_mlp != self.cfg.hidden_size:
            out = nn.Dense(self.out_mlp, dtype=self.dtype, name="out_mlp")(out)
        if self.out_tanh:
            out = jnp.tanh(out)
        out = nn.Dropout(self.out_dropout, deterministic=deterministic)(out)
        return out, attention_mask
