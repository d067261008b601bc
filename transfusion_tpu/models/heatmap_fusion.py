"""Legacy snao heatmap experiment family: cross-fusion over trunk features
producing a spatial next-active-object heatmap plus noun/verb/ttc heads.

TPU-native rebuild of ``modeling/cross_fusion/cross_f_wrapper.py``
(CrossFusionWrapper, cross_f_wrapper.py:140-257) over the fusion token
modules in ``modeling/cross_fusion/cross_f_layers.py`` (CrossTransformerModule
:21-160 / CrossTransformerTokenModule :163-229) and
``modeling/cross_fusion/cross_qkv_layers.py`` (AsymmetricCrossFTokenModule
:84-221 / AsymmetricCrossFModule :223-356), with the ``last_stage`` /
classifier-head semantics of ``modeling/commons.py`` (NaoABC :44-167,
NaoWrapperBase :170-219).

NOTE ON REACHABILITY: in the reference snapshot the snao experiment is dead
code — ``runner/utils/factories.py:11-20`` raises NotImplementedError for
every experiment except "egonao", so no shipped config can construct this
wrapper. It is rebuilt here with the intended semantics so the historic
heatmap family is available, with the reference's wiring bugs fixed and
cited:

* ``CrossTransformerModule.forward`` builds its padding mask from
  ``x.shape[1]`` AFTER the language tokens were concatenated and then
  appends the language mask again (cross_f_layers.py:219-222) — the mask is
  ``lang_len`` too long and torch would reject it. We build it from the
  visual length.
* ``AsymmetricCrossFModule.forward`` passes the padding mask to layer 0 and
  to the vis-only tail layers but drops it in the middle interleaved loop
  (cross_qkv_layers.py:317-336) — padded language keys leak into attention
  for layers 1..lang_layers-1. We mask every layer.

Differences by design (TPU): NHWC feature maps, patchify via a strided
reshape (not unfold), static shapes per resize bucket, and one flax module
instead of a wrapper mutating a wrapped torch model (``del
self.nao_model.heatmap_head`` etc.).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from transfusion_tpu.models.fusion import PositionalEmbedding
from transfusion_tpu.models.fusion_variants import QKVEncoderLayer
from transfusion_tpu.models.fusion import EncoderLayer
from transfusion_tpu.models.misc_layers import get_upsample_l


@dataclass(frozen=True)
class HeatmapFusionConfig:
    """CROSS_LAYER_ARGS / DEF_NARR_EMBED_ARGS (cross_f_wrapper.py:16-54).

    The reference dict literal assigns ``type`` twice — "cross_transformer"
    then "asymmetric" — so the effective default is asymmetric.
    """

    fusion_type: str = "asymmetric"  # "asymmetric" | "cross_transformer"
    narr_out_mode: str = "embedding"  # "embedding" | "token_embeddings"
    token_dim: int = 300  # narr_embed_args["size"] overrides token_dim
    patch_h: int = 2
    patch_w: int = 2
    patch_dropout: float = 0.2
    vis_layers: int = 3
    lang_layers: int = 2
    num_layers: int = 2  # joint-encoder depth (cross_transformer)
    num_heads: int = 2
    ff_multiplier: float = 2.0
    vis_dropout: float = 0.1
    lang_dropout: float = 0.1
    token_dropout: float = 0.1
    back_to_img_fn: str = "regroup_gated"  # "token"|"regroup"|"regroup_gated"
    extra: bool = True
    elu_last: bool = False
    pos_embedding: str = "learned"
    activation: str = "gelu"
    lang_to_hmap: bool = False
    heatmap_upscale: float = 1.0
    class_upscale: float = 1.0
    backproj_dropout: float = 0.1  # run_config["hmap_dropout"]
    # Head / criterion wiring (NaoWrapperBase.__init__, commons.py:176-196).
    noun_classes: int = 0
    verb_classes: int = 0
    ttc_pred: bool = False
    kl_div: bool = False
    w_sigmoid: bool = False
    class_dropout: float = 0.2
    ttc_dropout: float = 0.2
    upsample_kind: str = "bilinear"
    dtype: Any = jnp.float32

    @property
    def classifying(self) -> bool:
        return self.noun_classes > 0 or self.verb_classes > 0


def _head(x, classes, dropout, deterministic, name, activ=None, dtype=jnp.float32):
    """get_dnn (commons.py:18-30): Dropout -> Linear [-> activation]."""
    x = nn.Dropout(dropout, deterministic=deterministic, name=f"{name}_drop")(x)
    x = nn.Dense(classes, dtype=dtype, name=name)(x)
    if activ == "softplus":
        x = nn.softplus(x)
    return x


class _RegroupHead(nn.Module):
    """hmap_token_postprocess (cross_f_wrapper.py:96-136 dispatch over
    utils.py RegroupPatchesLayer:65-81 / ...Extra:122-144 / GatedExtra:147-169
    / BackProjectLayer:251-263): patch tokens -> per-patch pixels -> [H, W]."""

    cfg: HeatmapFusionConfig
    feature_h: int
    feature_w: int

    @nn.compact
    def __call__(self, tokens, cls_f, deterministic: bool = True):
        cfg = self.cfg
        ph, pw = cfg.patch_h, cfg.patch_w
        gh, gw = self.feature_h // ph, self.feature_w // pw
        fat = int(cfg.heatmap_upscale * cfg.token_dim)
        if cfg.back_to_img_fn == "token":
            # BackProjectLayer: one token -> the whole map.
            x = nn.Dropout(cfg.backproj_dropout, deterministic=deterministic)(tokens)
            x = nn.Dense(self.feature_h * self.feature_w, dtype=cfg.dtype, name="back_proj")(x)
            return x.reshape(-1, self.feature_h, self.feature_w)
        if cfg.back_to_img_fn == "regroup":
            if cfg.extra:
                x = nn.Dense(fat, dtype=cfg.dtype, name="linear_1")(tokens)
                if not cfg.elu_last:
                    x = 1.0 + nn.elu(x)
                x = nn.Dropout(cfg.backproj_dropout, deterministic=deterministic)(x)
                x = nn.Dense(ph * pw, dtype=cfg.dtype, name="linear_2")(x)
                if cfg.elu_last:
                    x = 1.0 + nn.elu(x)
            else:
                x = nn.Dropout(cfg.backproj_dropout, deterministic=deterministic)(tokens)
                x = nn.Dense(ph * pw, dtype=cfg.dtype, name="linear")(x)
                x = 1.0 + nn.elu(x)  # get_regroup_acti_f default "elu"
        elif cfg.back_to_img_fn == "regroup_gated":
            # Gate the upscaled patch features by the class token
            # (RegroupPatchesGatedLayerExtra, utils.py:147-169).
            gate = nn.sigmoid(nn.Dense(fat, dtype=cfg.dtype, name="cls_f_linear")(cls_f))
            x = nn.Dense(fat, dtype=cfg.dtype, name="linear_1")(tokens)
            x = x * gate[:, None, :]
            x = nn.Dropout(cfg.backproj_dropout, deterministic=deterministic)(x)
            x = nn.Dense(ph * pw, dtype=cfg.dtype, name="linear_2")(x)
            x = 1.0 + nn.elu(x)
        else:
            raise ValueError(f"back_to_img_fn {cfg.back_to_img_fn} not recognized")
        b = x.shape[0]
        x = x.reshape(b, gh, gw, ph, pw)
        return x.transpose(0, 1, 3, 2, 4).reshape(b, gh * ph, gw * pw)


class HeatmapCrossFusion(nn.Module):
    """The full snao forward: trunk features + narration tokens ->
    {"heatmap", "noun_logits", "verb_logits", "ttc"}
    (CrossFusionWrapper.forward, cross_f_wrapper.py:221-240 +
    CrossFNaoABC.last_stage :76-91).

    ``feat`` is the trunk's final NHWC feature map; ``lang_tokens`` is
    [B, T, token_dim] (T == 1 in "embedding" mode — the pooled narration
    vector, cross_f_wrapper.py:228-230); ``lang_mask`` is [B, T] with 1 =
    real token (ignored / all-real in embedding mode).
    """

    cfg: HeatmapFusionConfig

    @nn.compact
    def __call__(self, feat, lang_tokens, lang_mask=None, im_size=None,
                 deterministic: bool = True):
        cfg = self.cfg
        b, h, w, c = feat.shape
        ph, pw = cfg.patch_h, cfg.patch_w
        if h % ph or w % pw:
            raise ValueError("feature dims must be divisible by the patch size")
        n = (h // ph) * (w // pw)
        t = lang_tokens.shape[1]
        if lang_mask is None:
            lang_mask = jnp.ones((b, t), jnp.int32)

        # In "embedding" mode the *TokenModule variants run with no class
        # token and read class features off the language token
        # (cross_f_layers.py:197,227; cross_qkv_layers.py:122,221); in
        # "token_embeddings" mode the joint module appends one.
        classif_token = cfg.narr_out_mode != "embedding" and (
            cfg.classifying or cfg.ttc_pred)

        vis = nn.Conv(cfg.token_dim, (ph, pw), strides=(ph, pw), use_bias=False,
                      padding="VALID", dtype=cfg.dtype, name="patch_to_token")(feat)
        vis = vis.reshape(b, n, cfg.token_dim)
        hmap_tok = self.param("heatmap_token", nn.initializers.normal(1.0),
                              (1, 1, cfg.token_dim))
        vis = jnp.concatenate([jnp.broadcast_to(hmap_tok, (b, 1, cfg.token_dim)).astype(vis.dtype), vis], axis=1)
        if classif_token:
            cls_tok = self.param("class_token", nn.initializers.normal(1.0),
                                 (1, 1, cfg.token_dim))
            vis = jnp.concatenate([vis, jnp.broadcast_to(cls_tok, (b, 1, cfg.token_dim)).astype(vis.dtype)], axis=1)
        n_vis = vis.shape[1]

        vis = PositionalEmbedding(cfg.pos_embedding, n_vis, cfg.token_dim, name="pos")(vis)
        img_kind = self.param("image_kind", nn.initializers.normal(1.0), (1, 1, cfg.token_dim))
        lang_kind = self.param("lang_kind", nn.initializers.normal(1.0), (1, 1, cfg.token_dim))
        vis = vis + img_kind
        vis = nn.Dropout(cfg.patch_dropout, deterministic=deterministic)(vis)
        lang = lang_tokens.astype(vis.dtype) + lang_kind

        # True = padded (torch key_padding_mask convention).
        pad = jnp.concatenate([jnp.zeros((b, n_vis), bool), lang_mask == 0], axis=1)

        if cfg.fusion_type == "cross_transformer":
            x = jnp.concatenate([vis, lang], axis=1)
            for i in range(cfg.num_layers):
                x = EncoderLayer(cfg.token_dim, cfg.num_heads, cfg.ff_multiplier,
                                 cfg.token_dropout, cfg.activation, cfg.dtype,
                                 name=f"layer_{i}")(
                    x, key_padding_mask=pad, deterministic=deterministic)
            vis_out, lang_out = x[:, :n_vis], x[:, n_vis:]
        elif cfg.fusion_type == "asymmetric":
            # Both streams query the concatenated [vis, lang] memory;
            # lang_to_hmap=False hides the heatmap token from the language
            # queries (cross_qkv_layers.py:177-181).
            vis_layers = [QKVEncoderLayer(cfg.token_dim, cfg.num_heads, cfg.ff_multiplier,
                                          cfg.vis_dropout, cfg.activation, cfg.dtype,
                                          name=f"vis_{i}") for i in range(cfg.vis_layers)]
            lang_layers = [QKVEncoderLayer(cfg.token_dim, cfg.num_heads, cfg.ff_multiplier,
                                           cfg.lang_dropout, cfg.activation, cfg.dtype,
                                           name=f"lang_{i}") for i in range(cfg.lang_layers)]

            def step(i, vis, lang):
                mem = jnp.concatenate([vis, lang], axis=1)
                new_vis = vis_layers[i](vis, mem, pad, deterministic)
                new_lang = lang
                if i < cfg.lang_layers:
                    if cfg.lang_to_hmap:
                        new_lang = lang_layers[i](lang, mem, pad, deterministic)
                    else:
                        new_lang = lang_layers[i](lang, mem[:, 1:], pad[:, 1:], deterministic)
                return new_vis, new_lang

            # Layer 0 updates lang BEFORE vis reads the memory is NOT the
            # reference order: it computes both from the same memory
            # (cross_qkv_layers.py:295-305) — preserved by evaluating both
            # streams against the pre-update concat in ``step``.
            for i in range(cfg.vis_layers):
                vis, lang = step(i, vis, lang)
            vis_out, lang_out = vis, lang
        else:
            raise ValueError(f"{cfg.fusion_type=} not implemented")

        if cfg.back_to_img_fn == "token":
            hmap_in = vis_out[:, 0]
        else:
            hmap_in = vis_out[:, 1:n + 1]

        if classif_token:
            cls_f = vis_out[:, n + 1]
        else:
            # Embedding mode: class features come off the language stream
            # (first/only token — cross_qkv_layers.py:221 ``.squeeze()``,
            # :351 ``language_f[:, 0]``).
            cls_f = lang_out[:, 0]

        heatmap = _RegroupHead(cfg, h, w, name="hmap_head")(hmap_in, cls_f, deterministic)

        # class_token_postprocess (cross_f_wrapper.py:197-207): only with
        # ``extra`` and any head on.
        if cfg.extra and (cfg.classifying or cfg.ttc_pred):
            cdim = int(cfg.class_upscale * cfg.token_dim)
            cls_f = nn.Dense(cdim, dtype=cfg.dtype, name="class_post_linear")(cls_f)
            cls_f = nn.gelu(cls_f, approximate=False)
            cls_f = nn.LayerNorm(dtype=cfg.dtype, name="class_post_ln")(cls_f)

        noun_logits = _head(cls_f, cfg.noun_classes, cfg.class_dropout, deterministic,
                            "noun_classifier", dtype=cfg.dtype) if cfg.noun_classes else None
        verb_logits = _head(cls_f, cfg.verb_classes, cfg.class_dropout, deterministic,
                            "verb_classifier", dtype=cfg.dtype) if cfg.verb_classes else None
        ttc = (_head(cls_f, 1, cfg.ttc_dropout, deterministic, "ttc_predictor",
                     activ="softplus", dtype=cfg.dtype)[:, 0] if cfg.ttc_pred else None)

        # last_stage (commons.py:130-150 via cross_f_wrapper.py:76-91):
        # optional sigmoid, upsample to the input resolution, kl_div ->
        # log-softmax over the flattened map.
        x = heatmap
        if cfg.w_sigmoid:
            x = nn.sigmoid(x)
        if im_size is not None and tuple(im_size) != (h, w):
            up = get_upsample_l(cfg.upsample_kind)(1)
            x = up(x[..., None].astype(jnp.float32), tuple(im_size))[..., 0]
        if cfg.kl_div:
            bh, hh, wh = x.shape
            x = nn.log_softmax(x.reshape(bh, -1).astype(jnp.float32), axis=-1).reshape(bh, hh, wh)
        return {"heatmap": x, "noun_logits": noun_logits,
                "verb_logits": verb_logits, "ttc": ttc}
