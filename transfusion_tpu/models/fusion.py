"""Per-FPN-level vision-language cross fusion.

The core contribution of the reference
(``modeling/cross_fusion/ego_fusion/cross_f_box_wrapper.py:165-230`` +
``cross_f_box_layers.py:13-108``): each selected backbone feature map is

  1. conv-patchified into tokens (kernel = stride = patch size, no bias);
  2. given sinusoidal (or learned) positional embeddings + a learned
     image-kind embedding, while language tokens get a lang-kind embedding;
  3. concatenated with the language tokens and run through a joint
     post-norm Transformer encoder with a padding mask over the padded
     language positions (and optionally a local visual attention mask);
  4. split back; visual tokens get a final LayerNorm and are re-projected to
     a feature map (dropout -> Linear(token_dim, ph*pw*C) -> fold), which
     REPLACES the backbone feature before the FPN.

Shapes are static per resize bucket; the sin1d table is precomputed at
``MAX_NUM_PATCHES`` and sliced (the same slice trick the reference uses at
``cross_fusion/utils.py:209-214``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.ops.layer_norm import FusedLayerNorm

MAX_NUM_PATCHES = 8192  # cross_f_box_wrapper.py:21


def sin1d_table(n: int, dim: int) -> np.ndarray:
    """Classic sine/cosine positional table [n, dim] (cross_fusion/utils.py:267-273)."""
    position = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe = np.zeros((n, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def sin2d_table(h: int, w: int, dim: int) -> np.ndarray:
    """2D sine/cosine table [h*w, dim] (``get_sin2d_embed``,
    cross_fusion/utils.py:276-303, w_hmap_emb=False): first half of the
    channels encodes the column, second half the row. NOTE the reference's
    *box*-path sin2d branch is dead code (utils.py:188-190 reads undefined
    ``self.feature_h`` -> AttributeError); the live use is the legacy heatmap
    path, whose table this reproduces minus the prepended heatmap-token row."""
    if dim % 4 != 0:
        raise ValueError("sin2d requires dim % 4 == 0")
    half = dim // 2
    div = np.exp(np.arange(0, half, 2, dtype=np.float32) * (-math.log(10000.0) / half))
    pe = np.zeros((dim, h, w), np.float32)
    pos_w = np.arange(w, dtype=np.float32)[:, None]
    pos_h = np.arange(h, dtype=np.float32)[:, None]
    pe[0:half:2] = np.sin(pos_w * div).T[:, None, :].repeat(h, axis=1)
    pe[1:half:2] = np.cos(pos_w * div).T[:, None, :].repeat(h, axis=1)
    pe[half::2] = np.sin(pos_h * div).T[:, :, None].repeat(w, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div).T[:, :, None].repeat(w, axis=2)
    return pe.reshape(dim, -1).T


def visual_token_mask(gh: int, gw: int, mask_type: str) -> np.ndarray | None:
    """[N, N] bool, True = blocked (``get_visual_token_mask``,
    cross_fusion/utils.py:9-32): under ``local_k`` a visual token attends to
    the Chebyshev-``k`` window around itself (the reference's border clamping
    reduces to intersecting the window with the grid). ``global`` -> None.
    Static per (grid, type) like the reference's cache_masks dict."""
    if mask_type == "global":
        return None
    if "local" not in mask_type:
        raise NotImplementedError(f"unknown vis_mask_type {mask_type}")
    k = int(mask_type.split("_")[-1])
    rows = np.arange(gh * gw) // gw
    cols = np.arange(gh * gw) % gw
    near_r = np.abs(rows[:, None] - rows[None, :]) <= k
    near_c = np.abs(cols[:, None] - cols[None, :]) <= k
    return ~(near_r & near_c)


class PositionalEmbedding(nn.Module):
    kind: str  # "sin1d" | "learned" | "zero"
    num_patches: int
    dim: int

    @nn.compact
    def __call__(self, x, grid_hw: tuple | None = None):
        n = x.shape[1]
        if self.kind == "sin1d":
            table = jnp.asarray(sin1d_table(self.num_patches, self.dim))
        elif self.kind == "sin2d":
            if grid_hw is None:
                raise ValueError("sin2d positional embedding needs grid_hw")
            table = jnp.asarray(sin2d_table(grid_hw[0], grid_hw[1], self.dim))
        elif self.kind == "learned":
            table = self.param("pos_embedding", nn.initializers.normal(1.0), (self.num_patches, self.dim))
        elif self.kind == "zero":
            table = self.param("pos_embedding", nn.initializers.zeros, (self.num_patches, self.dim))
        else:
            raise ValueError(f"unknown pos embedding {self.kind}")
        return x + table[None, :n].astype(x.dtype)


class EncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer, post-norm, batch_first semantics."""

    dim: int
    num_heads: int
    ff_multiplier: float = 2.0
    dropout: float = 0.1
    activation: str = "gelu"
    dtype: Any = jnp.float32
    # Route attention through the Pallas flash kernel family
    # (ops.attention.flash_attention_train — differentiable, layout-native
    # [B, L, H, D], in-kernel dropout). Config-selectable via
    # FusionConfig.use_flash_attention; default ON since the round-3 rebuild:
    # +12% train throughput at B8 flagship (34.09 vs 30.46 f/s/chip) and
    # neutral at eval (63.43 vs 63.55). Sequences below 2048 always take
    # XLA's fused path (gate below).
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, deterministic=True):
        # Megatron activation layout under an active {data, model} mesh
        # (identity otherwise): block IO replicated on 'model', q/k/v
        # head-sharded, MLP hidden sharded — matching the row/col weight
        # pairing in parallel.mesh._is_model_shardable so the partitioner
        # never falls back to replicating the fusion activations (the round-3
        # "Involuntary full rematerialization" XLA warning).
        from transfusion_tpu.parallel.mesh import active_mesh, constrain_activation as _csa

        mesh = active_mesh()
        tp_active = mesh is not None and mesh.shape.get("model", 1) > 1
        # Constraints are identity unless the model axis is live: the pure-dp
        # path (the benched single/multi-chip configs) compiles byte-identical.
        constrain_activation = _csa if tp_active else (lambda t, *spec: t)

        b, l, d = x.shape
        head_dim = self.dim // self.num_heads
        x = constrain_activation(x, "data", None, None)

        def proj(name, inp):
            return nn.Dense(self.dim, dtype=self.dtype, name=name)(inp).reshape(b, l, self.num_heads, head_dim)

        q, k, v = proj("q_proj", x), proj("k_proj", x), proj("v_proj", x)
        # Flash pays off only when the [B, H, L, L] probability tensor is
        # big enough to be the wall: at level-1 lengths (~832) the three
        # kernel launches + recompute cost ~18 ms/step while XLA's fused
        # attention is a few ms (profiled), so short sequences keep XLA.
        # Under tensor parallelism (model axis > 1) attention stays on XLA's
        # path: the Pallas kernel is a single-device program, while XLA
        # shards the [B,H,L,L] work by the q/k/v head sharding below.
        q = constrain_activation(q, "data", None, "model", None)
        k = constrain_activation(k, "data", None, "model", None)
        v = constrain_activation(v, "data", None, "model", None)
        if attn_mask is None and self.use_flash and l >= 2048 and not tp_active:
            from transfusion_tpu.ops.attention import flash_attention_train

            # Layout-native fused attention: consumes the projections'
            # [B, L, H, D] directly (no HBM transpose, no [B,H,L,L]
            # probability tensor — the two walls in the train-step profile),
            # with in-kernel probability dropout on the training path
            # (torch MultiheadAttention semantics).
            rate = 0.0 if deterministic else self.dropout
            seed = None
            if rate > 0.0:
                import jax

                seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32).astype(jnp.int32)
            ctx = flash_attention_train(
                q, k, v, key_padding_mask, dropout_rate=rate, seed=seed
            ).reshape(b, l, d)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
            if key_padding_mask is not None:
                # True = ignore (torch convention).
                scores = jnp.where(key_padding_mask[:, None, None, :], -1e9, scores)
            if attn_mask is not None:
                # [L, L] bool, True = blocked.
                scores = jnp.where(attn_mask[None, None], -1e9, scores)
            probs = nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, d)
        attn_out = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(ctx)
        attn_out = nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
        # FusedLayerNorm: MXU row statistics + fused residual add (XLA's
        # cross-lane LN reductions profiled at 4.3 ms/step on the level-0
        # stream — ops/layer_norm.py).
        x = FusedLayerNorm(dtype=self.dtype, name="norm1")(
            x, residual=attn_out, deterministic=deterministic
        )
        x = constrain_activation(x, "data", None, None)

        h = nn.Dense(int(self.dim * self.ff_multiplier), dtype=self.dtype, name="linear1")(x)
        h = constrain_activation(h, "data", None, "model")
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" else nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = FusedLayerNorm(dtype=self.dtype, name="norm2")(
            x, residual=h, deterministic=deterministic
        )
        return constrain_activation(out, "data", None, None)


@dataclass(frozen=True)
class FusionLevelConfig:
    token_dim: int = 896
    num_layers: int = 4
    num_heads: int = 4
    ff_multiplier: float = 2.0
    token_dropout: float = 0.15
    patch_dropout: float = 0.1
    backproj_dropout: float = 0.1
    pos_embedding: str = "sin1d"
    final_norm: str = "ln"
    activation: str = "gelu"
    patch_h: int = 4
    patch_w: int = 4
    vis_mask_type: str = "global"
    use_flash_attention: bool = False


class CrossFusionLevel(nn.Module):
    """Fuse one feature level with language tokens; returns the replaced map.

    Feature map [B, H, W, C] -> tokens [(H/ph)*(W/pw), token_dim] -> joint
    encoder with language -> re-projected [B, H, W, C].
    """

    cfg: FusionLevelConfig
    out_channels: int
    dtype: Any = jnp.float32
    # When set, these encoder layers are used instead of per-level ones —
    # the shared-encoder variant (CrossFusionBoxWrapperShared,
    # cross_f_box_wrapper.py:305-373) passes one stack to every level.
    shared_layers: Any = None
    # Optional early vision-vision fusion with precomputed clip features
    # (VisLangFusionBoxWrapper): a VisualFeatureFusion module.
    vis_fusion: Any = None

    @nn.compact
    def __call__(self, feat, lang_tokens, lang_mask, deterministic: bool = True,
                 visual_features=None):
        cfg = self.cfg
        b, h, w, c = feat.shape
        ph, pw = cfg.patch_h, cfg.patch_w

        vis = nn.Conv(
            cfg.token_dim, (ph, pw), strides=(ph, pw), use_bias=False,
            padding="VALID", dtype=self.dtype, name="patch_to_token",
        )(feat)
        gh, gw = vis.shape[1:3]
        n = gh * gw
        vis = vis.reshape(b, n, cfg.token_dim)

        vis = PositionalEmbedding(cfg.pos_embedding, MAX_NUM_PATCHES, cfg.token_dim, name="pos")(
            vis, grid_hw=(gh, gw)
        )
        img_kind = self.param("image_kind", nn.initializers.normal(1.0), (1, 1, cfg.token_dim))
        lang_kind = self.param("lang_kind", nn.initializers.normal(1.0), (1, 1, cfg.token_dim))
        vis = vis + img_kind
        vis = nn.Dropout(cfg.patch_dropout, deterministic=deterministic)(vis)
        if self.vis_fusion is not None and visual_features is not None:
            vis, _ = self.vis_fusion(vis, visual_features, deterministic)
        lang = lang_tokens + lang_kind

        x = jnp.concatenate([vis, lang], axis=1)
        # Padding mask: visual tokens never padded; lang padded where mask==0.
        pad = jnp.concatenate(
            [jnp.zeros((b, n), bool), lang_mask == 0], axis=1
        )
        attn_mask = None
        vis_mask = visual_token_mask(gh, gw, cfg.vis_mask_type)
        if vis_mask is not None:
            # Joint [L, L] mask (cross_f_box_layers.py:88-97): vis->vis uses
            # the local window, vis->lang and lang->* fully attend. Static per
            # resize bucket, so it folds into the compiled program.
            l_lang = lang.shape[1]
            total = n + l_lang
            joint = np.zeros((total, total), bool)
            joint[:n, :n] = vis_mask
            attn_mask = jnp.asarray(joint)

        if self.shared_layers is not None:
            for layer in self.shared_layers:
                x = layer(x, key_padding_mask=pad, attn_mask=attn_mask, deterministic=deterministic)
        else:
            for i in range(cfg.num_layers):
                x = EncoderLayer(
                    cfg.token_dim, cfg.num_heads, cfg.ff_multiplier, cfg.token_dropout,
                    cfg.activation, self.dtype, use_flash=cfg.use_flash_attention,
                    name=f"layer_{i}",
                )(x, key_padding_mask=pad, attn_mask=attn_mask, deterministic=deterministic)

        vis_out = x[:, :n]
        lang_out = x[:, n:]
        if cfg.final_norm == "ln":
            vis_out = FusedLayerNorm(dtype=self.dtype, name="final_norm")(
                vis_out, deterministic=deterministic
            )

        # RegroupPatchesLayerBox: dropout -> linear -> fold (utils.py:84-119).
        vis_out = nn.Dropout(cfg.backproj_dropout, deterministic=deterministic)(vis_out)
        vis_out = nn.Dense(ph * pw * self.out_channels, dtype=self.dtype, name="back_proj")(vis_out)
        # Pin the fold/transpose input to batch-only sharding (identity with
        # no mesh): back_proj's kernel is row-sharded under tp and ZeRO-3
        # sharded under fsdp, and without this anchor XLA propagates the
        # WEIGHT sharding into the activation's channel dim, then hits
        # "Involuntary full rematerialization" re-sharding the 6-dim
        # transpose below (the round-3 dryrun tail warning).
        from transfusion_tpu.parallel.mesh import constrain_activation

        vis_out = constrain_activation(vis_out, "data", None, None)
        fused = vis_out.reshape(b, gh, gw, ph, pw, self.out_channels)
        fused = fused.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * ph, gw * pw, self.out_channels)
        fused = constrain_activation(fused, "data", None, None, None)
        if (gh * ph, gw * pw) != (h, w):
            # Feature maps whose sides aren't patch multiples keep their tail
            # unfused; pad back (reference sizes are always multiples).
            fused = jnp.pad(fused, ((0, 0), (0, h - gh * ph), (0, w - gw * pw), (0, 0)))
        return fused, lang_out


class PoolPredictor(nn.Module):
    """LM auxiliary head (modeling/cross_fusion/ego_fusion/lm_layers.py:30-81):
    masked max/mean pool over fused language tokens -> LN -> noun/verb logits
    (background classes excluded)."""

    num_nouns: int  # already excludes bg
    num_verbs: int  # already excludes bg (0 disables the verb head)
    pooling: str = "mean"
    use_ln: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang_tokens, lang_mask=None):
        x = lang_tokens
        if lang_mask is not None:
            x = x * lang_mask[..., None].astype(x.dtype)
        feats = jnp.max(x, axis=1) if self.pooling == "max" else jnp.mean(x, axis=1)
        if self.use_ln:
            feats = nn.LayerNorm(dtype=self.dtype, name="ln")(feats)
        noun_logits = nn.Dense(self.num_nouns, dtype=self.dtype, name="mlp_noun")(feats)
        verb_logits = (
            nn.Dense(self.num_verbs, dtype=self.dtype, name="mlp_verb")(feats)
            if self.num_verbs
            else None
        )
        return {"noun_logits": noun_logits, "verb_logits": verb_logits}
