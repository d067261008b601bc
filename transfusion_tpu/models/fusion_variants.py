"""Fusion architecture variants beyond the shipped symmetric encoder.

Covers the reference's alternative fusion families:
  * shared encoder across FPN levels (``CrossFusionBoxWrapperShared``,
    ``cross_f_box_wrapper.py:305-373``) — one transformer whose parameters
    serve every level's token sequence;
  * asymmetric QKV cross attention (``cross_qkv_layers.py:19-81`` +
    ``cross_f_box_asymm.py:10-121``) — interleaved updates where each
    modality queries the concatenated [vis, lang] memory through its own
    cross-attention layer stack;
  * vision-features "early fusion" (``cross_f_box_vis_language_wrapper.py``)
    — precomputed clip features (SlowFast 2304-d / ResNet50 2048-d) are
    L2-normalized, projected to the token dim, and fused with the patch
    tokens before the language fusion stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.models.fusion import (
    EncoderLayer,
    FusionLevelConfig,
    PositionalEmbedding,
    MAX_NUM_PATCHES,
)


class QKVEncoderLayer(nn.Module):
    """Post-norm cross-attention block: q from one stream, k/v from a memory
    (QKVEncoder, cross_qkv_layers.py:19-81)."""

    dim: int
    num_heads: int
    ff_multiplier: float = 1.0
    dropout: float = 0.1
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, memory, key_padding_mask=None, deterministic=True):
        b, lq, d = q_in.shape
        lk = memory.shape[1]
        head_dim = self.dim // self.num_heads

        def proj(name, t, l):
            return nn.Dense(self.dim, dtype=self.dtype, name=name)(t).reshape(b, l, self.num_heads, head_dim)

        q = proj("q_proj", q_in, lq)
        k = proj("k_proj", memory, lk)
        v = proj("v_proj", memory, lk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], -1e9, scores)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, d)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(ctx)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(q_in + nn.Dropout(self.dropout, deterministic=deterministic)(attn))

        h = nn.Dense(int(self.dim * self.ff_multiplier), dtype=self.dtype, name="linear1")(x)
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" else nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + nn.Dropout(self.dropout, deterministic=deterministic)(h))


@dataclass(frozen=True)
class AsymmetricConfig:
    token_dim: int = 896
    vis_layers: int = 3
    lang_layers: int = 2
    num_heads: int = 4
    ff_multiplier: float = 1.0
    vis_dropout: float = 0.1
    lang_dropout: float = 0.1
    patch_dropout: float = 0.1
    pos_embedding: str = "sin1d"
    activation: str = "relu"
    patch_h: int = 4
    patch_w: int = 4


class AsymmetricCrossFusionLevel(nn.Module):
    """Interleaved asymmetric fusion of one level (cross_f_box_asymm.py:74-121).

    Both streams repeatedly query the concatenated [vis, lang] memory; the
    visual stream runs ``vis_layers`` updates, language ``lang_layers``
    (vis_layers >= lang_layers as the reference assumes).
    """

    cfg: AsymmetricConfig
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lang_tokens, lang_mask, deterministic: bool = True,
                 visual_features=None):
        if visual_features is not None:
            # The reference's clip-feature wrapper subclasses only the
            # cross_transformer wrapper (cross_f_box_vis_language_wrapper.py);
            # build_transfusion_config rejects the combination up front.
            raise ValueError("asymmetric fusion does not take visual_features")
        cfg = self.cfg
        b, h, w, c = feat.shape
        ph, pw = cfg.patch_h, cfg.patch_w
        vis = nn.Conv(cfg.token_dim, (ph, pw), strides=(ph, pw), use_bias=False,
                      padding="VALID", dtype=self.dtype, name="patch_to_token")(feat)
        gh, gw = vis.shape[1:3]
        n = gh * gw
        vis = vis.reshape(b, n, cfg.token_dim)
        vis = PositionalEmbedding(cfg.pos_embedding, MAX_NUM_PATCHES, cfg.token_dim, name="pos")(vis)
        vis = vis + self.param("image_kind", nn.initializers.normal(1.0), (1, 1, cfg.token_dim))
        vis = nn.Dropout(cfg.patch_dropout, deterministic=deterministic)(vis)
        lang = lang_tokens + self.param("lang_kind", nn.initializers.normal(1.0), (1, 1, cfg.token_dim))

        pad = jnp.concatenate([jnp.zeros((b, n), bool), lang_mask == 0], axis=1)

        vis_layers = [
            QKVEncoderLayer(cfg.token_dim, cfg.num_heads, cfg.ff_multiplier, cfg.vis_dropout,
                            cfg.activation, self.dtype, name=f"vis_{i}")
            for i in range(cfg.vis_layers)
        ]
        lang_layers = [
            QKVEncoderLayer(cfg.token_dim, cfg.num_heads, cfg.ff_multiplier, cfg.lang_dropout,
                            cfg.activation, self.dtype, name=f"lang_{i}")
            for i in range(cfg.lang_layers)
        ]

        memory = jnp.concatenate([vis, lang], axis=1)
        lang = lang_layers[0](lang, memory, pad, deterministic)
        vis = vis_layers[0](vis, memory, pad, deterministic)
        for i in range(1, cfg.lang_layers):
            memory = jnp.concatenate([vis, lang], axis=1)
            vis = vis_layers[i](vis, memory, pad, deterministic)
            lang = lang_layers[i](lang, memory, pad, deterministic)
        for i in range(cfg.lang_layers, cfg.vis_layers):
            memory = jnp.concatenate([vis, lang], axis=1)
            vis = vis_layers[i](vis, memory, pad, deterministic)

        vis = nn.Dropout(cfg.patch_dropout, deterministic=deterministic)(vis)
        vis = nn.Dense(ph * pw * self.out_channels, dtype=self.dtype, name="back_proj")(vis)
        fused = vis.reshape(b, gh, gw, ph, pw, self.out_channels)
        fused = fused.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * ph, gw * pw, self.out_channels)
        if (gh * ph, gw * pw) != (h, w):
            fused = jnp.pad(fused, ((0, 0), (0, h - gh * ph), (0, w - gw * pw), (0, 0)))
        return fused, lang


class VisualFeatureFusion(nn.Module):
    """Early vision-vision fusion with precomputed clip features
    (cross_f_box_vis_language_wrapper.py:52-73): the clip feature sequence
    [B, T, F] (SlowFast 2304 / R50 2048) is L2-normalized, linearly projected
    to the token dim with a temporal positional embedding, then jointly
    encoded with the level's patch tokens. Returns the fused patch tokens
    (still in token space — language fusion follows)."""

    token_dim: int
    num_layers: int = 2
    num_heads: int = 4
    ff_multiplier: float = 2.0
    dropout: float = 0.1
    pos_embedding: str = "learned"
    max_frames: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patch_tokens, clip_features, deterministic: bool = True):
        norm = clip_features / jnp.clip(
            jnp.linalg.norm(clip_features, axis=-1, keepdims=True), 1e-12
        )
        aux = nn.Dense(self.token_dim, use_bias=False, dtype=self.dtype, name="proj")(norm)
        aux = PositionalEmbedding(self.pos_embedding, self.max_frames, self.token_dim, name="pos")(aux)

        n = patch_tokens.shape[1]
        x = jnp.concatenate([patch_tokens, aux], axis=1)
        for i in range(self.num_layers):
            x = EncoderLayer(self.token_dim, self.num_heads, self.ff_multiplier,
                             self.dropout, "gelu", self.dtype, name=f"layer_{i}")(
                x, deterministic=deterministic
            )
        return x[:, :n], x[:, n:]


class SpaceTimeFusionLayer(nn.Module):
    """Factorized spatial-then-temporal attention over [B, T, S, D] token
    grids (``SpaceTimeFusionLayer``, cross_f_box_layers.py:169-215): a full
    encoder layer over the spatial axis at each timestep, an extra residual
    (the reference adds the already-residual encoder output to its input —
    reproduced), then the same over the temporal axis at each spatial site.

    NOTE the reference reshapes the temporal output straight to
    [b, T, S, d] without undoing its [b, S, T, d] transpose
    (cross_f_box_layers.py:207-209) — silently axis-scrambled whenever
    T != S; this implementation transposes back (the intended ViViT
    factorization, exact for the reference's only exercised case T == S).
    """

    dim: int
    num_heads: int = 4
    ff_multiplier: float = 2.0
    dropout: float = 0.1
    activation: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, s, d = x.shape
        h = EncoderLayer(self.dim, self.num_heads, self.ff_multiplier, self.dropout,
                         self.activation, self.dtype, name="spatial")(
            x.reshape(b * t, s, d), deterministic=deterministic)
        x = x + h.reshape(b, t, s, d)

        xt = x.transpose(0, 2, 1, 3).reshape(b * s, t, d)
        h = EncoderLayer(self.dim, self.num_heads, self.ff_multiplier, self.dropout,
                         self.activation, self.dtype, name="temporal")(
            xt, deterministic=deterministic)
        out = (xt + h).reshape(b, s, t, d).transpose(0, 2, 1, 3)
        return out


class SpaceTimeFusionModule(nn.Module):
    """``SpaceTimeFusionModule`` (cross_f_box_layers.py:218-268): positional +
    image-kind embeddings, N stacked SpaceTimeFusionLayers, optional final LN.
    Operates on [B, T, S, D]. Unreachable from the shipped egonao wrapper
    (the reference calls its fusion encoders with 4 positional args while this
    module's forward accepts 2 — a TypeError in the reference itself); kept
    as the flow/ViViT-style primitive it is."""

    dim: int
    num_layers: int = 2
    num_heads: int = 4
    ff_multiplier: float = 2.0
    token_dropout: float = 0.1
    patch_dropout: float = 0.1
    activation: str = "relu"
    pos_embedding: str = "sin1d"
    final_norm: str = "ln"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, s, d = x.shape
        pos = PositionalEmbedding(self.pos_embedding, MAX_NUM_PATCHES, self.dim, name="pos")
        x = pos(x.reshape(b, t * s, d)).reshape(b, t, s, d)
        img_kind = self.param("image_kind", nn.initializers.normal(1.0), (1, 1, 1, self.dim))
        x = x + img_kind
        x = nn.Dropout(self.patch_dropout, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            x = SpaceTimeFusionLayer(
                self.dim, self.num_heads, self.ff_multiplier, self.token_dropout,
                self.activation, self.dtype, name=f"layer_{i}",
            )(x, deterministic=deterministic)
        if self.final_norm == "ln":
            x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return x


class SpaceTimeFusionLevel(nn.Module):
    """The fusion YAML's ``type: space_time`` box-path encoder, fitted to the
    per-level interface (``get_cross_box_encoder`` dispatch,
    cross_f_box_wrapper.py:24-37, selected at :88-91).

    The reference's own wiring of this type is dead code: the wrapper calls
    every encoder with (vis, lang, mask, vis_tokens_mask=...) while
    ``SpaceTimeFusionModule.forward`` accepts (x, flow_tokens_att_maks) — a
    TypeError in the reference itself (cross_f_box_layers.py:262; wrapper
    call at cross_f_box_wrapper.py:190-198). The intended semantics, and what
    this level implements: the patch grid is factorized as rows x columns and
    encoded by SpaceTimeFusionModule (spatial-then-"temporal" attention — the
    ViViT factorization the module was built for); the module consumes NO
    language input (its forward has no language parameters), so the language
    tokens pass through unchanged and the encoded grid re-projects onto the
    feature map exactly like the cross_transformer level."""

    cfg: FusionLevelConfig
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, lang_tokens, lang_mask, deterministic: bool = True,
                 visual_features=None):
        if visual_features is not None:
            raise ValueError("space_time fusion does not take visual_features")
        cfg = self.cfg
        b, h, w, c = feat.shape
        ph, pw = cfg.patch_h, cfg.patch_w
        vis = nn.Conv(cfg.token_dim, (ph, pw), strides=(ph, pw), use_bias=False,
                      padding="VALID", dtype=self.dtype, name="patch_to_token")(feat)
        gh, gw = vis.shape[1:3]
        x = SpaceTimeFusionModule(
            dim=cfg.token_dim, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            ff_multiplier=cfg.ff_multiplier, token_dropout=cfg.token_dropout,
            patch_dropout=cfg.patch_dropout, activation=cfg.activation,
            pos_embedding=cfg.pos_embedding, final_norm=cfg.final_norm,
            dtype=self.dtype, name="encoder",
        )(vis.reshape(b, gh, gw, cfg.token_dim), deterministic=deterministic)
        vis_out = x.reshape(b, gh * gw, cfg.token_dim)

        # RegroupPatchesLayerBox fold, as in CrossFusionLevel.
        vis_out = nn.Dropout(cfg.backproj_dropout, deterministic=deterministic)(vis_out)
        vis_out = nn.Dense(ph * pw * self.out_channels, dtype=self.dtype, name="back_proj")(vis_out)
        fused = vis_out.reshape(b, gh, gw, ph, pw, self.out_channels)
        fused = fused.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * ph, gw * pw, self.out_channels)
        if (gh * ph, gw * pw) != (h, w):
            fused = jnp.pad(fused, ((0, 0), (0, h - gh * ph), (0, w - gw * pw), (0, 0)))
        return fused, lang_tokens
