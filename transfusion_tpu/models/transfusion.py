"""The full TransFusion model: detector + narration encoder + per-level fusion.

Equivalent of ``CrossFusionBoxWrapper``
(``modeling/cross_fusion/ego_fusion/cross_f_box_wrapper.py:41-258``) around
the Faster R-CNN core: backbone features for the configured FPN levels are
replaced by the vision-language fusion output before the FPN/RPN/RoI stages,
and an optional LM auxiliary head predicts noun/verb from the fused language
tokens of the last fused level.

The model is a single flax module so one ``apply`` drives the whole jit'd
step; language tokenization happens host-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from transfusion_tpu.models.detector import DetectorConfig, FasterRCNN
from transfusion_tpu.models.fusion import CrossFusionLevel, FusionLevelConfig, PoolPredictor
from transfusion_tpu.models.resnet import RESNET50_CHANNELS
from transfusion_tpu.models.text_encoder import BertConfig, NarrationEncoder


@dataclass(frozen=True)
class FusionConfig:
    # Box-path encoder family, the fusion YAML's top-level ``type:`` key
    # (``get_cross_box_encoder``, cross_f_box_wrapper.py:24-37, dispatched at
    # :88-91): "cross_transformer" | "space_time" | "asymmetric".
    fusion_type: str = "cross_transformer"
    # narr_out_mode == "embedding" selects the single-class-token encoder
    # variants (cross_f_box_wrapper.py:90). For cross_transformer the token
    # variant differs from the full module only in dropping the padding mask
    # — a no-op here since the single pooled token's mask is all-ones — and
    # in its torch ctor being broken anyway (CrossTransformerTokenModule
    # passes final_ln to a parent that takes final_norm,
    # cross_f_box_layers.py:130-144: TypeError); recorded for parity.
    class_token_only: bool = False
    fpn_features: tuple = (0, 1, 2, 3)
    patch_h: tuple = (4, 4, 2, 1)
    patch_w: tuple = (4, 4, 2, 1)
    num_layers: tuple = (4, 4, 4, 4)
    token_dim: int = 896
    num_heads: int = 4
    ff_multiplier: float = 2.0
    token_dropout: float = 0.15
    patch_dropout: float = 0.1
    backproj_dropout: float = 0.1
    pos_embedding: str = "sin1d"
    final_norm: str = "ln"
    activation: str = "gelu"
    vis_mask_type: str = "global"
    forward_language_f: Any = False  # False | "direct" | "sum"
    replace_fpn_features: bool = True
    share_encoders: bool = False  # one transformer stack across all levels
    use_flash_attention: bool = False  # Pallas attention kernel (eval path)
    # Asymmetric-family knobs (cross_f_box_asymm.py:13-30 ctor defaults);
    # lang_layers/vis_dropout/lang_dropout ride the fusion YAML's args block.
    asymm_lang_layers: int = 2
    asymm_vis_dropout: float = 0.1
    asymm_lang_dropout: float = 0.1


@dataclass(frozen=True)
class TransFusionConfig:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    bert: BertConfig = field(default_factory=BertConfig.minilm_l12)
    # Language tower family (LM_TO_TEXT_POOLING, run_experiment.py:53-61):
    # "sbert" -> BERT/MiniLM; "gpt2" -> distilgpt2 causal encoder;
    # "t5" -> T5 encoder stack; "identity" -> precomputed language features
    # from the batch (IdentityLayer / NarrEmbeddingWrapper paths,
    # narr_pooling_layers.py:23-33,36-49). gpt2/t5 carry their own config.
    text_encoder: str = "sbert"
    # narr_out_mode (fusion config): "tokens" feeds per-token features to the
    # fusion; "embedding" uses one pooled sentence vector as a single
    # language token with no padding mask (cross_f_box_wrapper.py:185-191).
    narr_out_mode: str = "tokens"
    gpt2: Any = None  # lm_encoders.GPT2Config when text_encoder == "gpt2"
    t5: Any = None    # lm_encoders.T5Config when text_encoder == "t5"
    out_mlp: int | None = 896
    out_tanh: bool = False
    out_dropout: float = 0.1
    lm_on: bool = False
    lm_pooling: str = "mean"
    lm_use_ln: bool = True
    # lm_args.multi (get_lm_layer, lm_layers.py:5-27): False -> single
    # PoolPredictor on the last fused level; True -> one shared predictor
    # averaged over every level's fused language tokens; "sep" -> a separate
    # predictor per level, averaged.
    lm_multi: Any = False
    # lm_args.use_lm_f (cross_f_box_wrapper.py:80-81,223-225): classify the
    # narration-encoder tokens instead of the fused ones (disables multi).
    lm_use_f: bool = False
    # Inline narration type embeddings (SBert path only,
    # narr_pooling_layers.py:100-110).
    type_embeddings: tuple = ()
    type_embedding_init_div: float = 1.0
    use_language: bool = True
    # Precomputed clip-feature early fusion (VisLangFusionBoxWrapper,
    # cross_f_box_vis_language_wrapper.py): batch["visual_features"] [B, T, F]
    # fuses with each level's patch tokens before the language stage.
    use_visual_features: bool = False
    visual_feature_layers: int = 2
    # Transformer TTC head over postprocessed detections (ttc_hand_head.use:
    # True — roi_wrappers.py:289-304, faster_rcnn_wrapper.py:219-263).
    ttc_hand: Any = None  # models.ttc_head.TTCHeadConfig when enabled
    max_ttc_boxes: int = 5  # ttc_hand_head.max_ttc_boxes_per_image
    # Rematerialize the fusion levels in the backward pass (jax.checkpoint):
    # trades recompute for activation memory, the standard TPU lever for
    # growing the per-chip train batch past what the 896-dim joint attention
    # activations allow.
    remat_fusion: bool = False
    dtype: Any = jnp.float32


def _mean_lm_outs(outs: list) -> dict:
    """Average per-scale LM logits (MultiPoolPredictor[Sep],
    lm_layers.py:84-125)."""
    noun = sum(o["noun_logits"] for o in outs) / len(outs)
    verb = None
    if outs[0]["verb_logits"] is not None:
        verb = sum(o["verb_logits"] for o in outs) / len(outs)
    return {"noun_logits": noun, "verb_logits": verb}


class TransFusion(nn.Module):
    cfg: TransFusionConfig

    def setup(self):
        c = self.cfg
        self.rcnn = FasterRCNN(c.detector)
        if c.use_language:
            if c.text_encoder == "identity":
                self.narr_encoder = None
            elif c.text_encoder == "gpt2":
                from transfusion_tpu.models.lm_encoders import GPT2Encoder, PooledLMEncoder

                # Params land under narr_encoder/encoder/... (attribute
                # adoption), keeping freeze-path matching uniform.
                self.narr_encoder = PooledLMEncoder(
                    GPT2Encoder(c.gpt2, dtype=c.dtype),
                    out_mode=c.narr_out_mode, out_mlp=c.out_mlp, out_tanh=c.out_tanh,
                    out_dropout=c.out_dropout, dtype=c.dtype,
                )
            elif c.text_encoder == "t5":
                from transfusion_tpu.models.lm_encoders import PooledLMEncoder, T5Encoder

                self.narr_encoder = PooledLMEncoder(
                    T5Encoder(c.t5, dtype=c.dtype),
                    out_mode=c.narr_out_mode, out_mlp=c.out_mlp, out_tanh=c.out_tanh,
                    out_dropout=c.out_dropout, dtype=c.dtype,
                )
            else:
                self.narr_encoder = NarrationEncoder(
                    c.bert,
                    out_mode=c.narr_out_mode,
                    out_mlp=c.out_mlp,
                    out_tanh=c.out_tanh,
                    out_dropout=c.out_dropout,
                    type_embeddings=c.type_embeddings,
                    type_embedding_init_div=c.type_embedding_init_div,
                    dtype=c.dtype,
                )
            shared_layers = None
            if c.fusion.share_encoders:
                from transfusion_tpu.models.fusion import EncoderLayer

                shared_layers = tuple(
                    EncoderLayer(
                        c.fusion.token_dim, c.fusion.num_heads, c.fusion.ff_multiplier,
                        c.fusion.token_dropout, c.fusion.activation, c.dtype,
                        use_flash=c.fusion.use_flash_attention,
                        name=f"shared_layer_{i}",
                    )
                    for i in range(c.fusion.num_layers[0])
                )
            levels = []
            vis_fusion_mods = {}
            if c.use_visual_features:
                from transfusion_tpu.models.fusion_variants import VisualFeatureFusion

                for lvl in c.fusion.fpn_features:
                    vis_fusion_mods[lvl] = VisualFeatureFusion(
                        token_dim=c.fusion.token_dim,
                        num_layers=c.visual_feature_layers,
                        num_heads=c.fusion.num_heads,
                        dtype=c.dtype,
                        name=f"vis_fusion_{lvl}",
                    )
            if c.detector.backbone.startswith("mobilenet"):
                from transfusion_tpu.models.mobilenet import MOBILENET_CHANNELS as CHANNELS
            else:
                CHANNELS = RESNET50_CHANNELS
            for i, lvl in enumerate(c.fusion.fpn_features):
                level_cfg = FusionLevelConfig(
                    token_dim=c.fusion.token_dim,
                    num_layers=c.fusion.num_layers[i],
                    num_heads=c.fusion.num_heads,
                    ff_multiplier=c.fusion.ff_multiplier,
                    token_dropout=c.fusion.token_dropout,
                    patch_dropout=c.fusion.patch_dropout,
                    backproj_dropout=c.fusion.backproj_dropout,
                    pos_embedding=c.fusion.pos_embedding,
                    final_norm=c.fusion.final_norm,
                    activation=c.fusion.activation,
                    patch_h=c.fusion.patch_h[i],
                    patch_w=c.fusion.patch_w[i],
                    vis_mask_type=c.fusion.vis_mask_type,
                    use_flash_attention=c.fusion.use_flash_attention,
                )
                # get_cross_box_encoder dispatch (cross_f_box_wrapper.py:24-37)
                # on the fusion YAML's type: key.
                ftype = c.fusion.fusion_type
                if ftype == "cross_transformer":
                    levels.append(
                        CrossFusionLevel(
                            level_cfg, CHANNELS[str(lvl)], dtype=c.dtype,
                            shared_layers=shared_layers,
                            vis_fusion=vis_fusion_mods.get(lvl),
                            name=f"fusion_{lvl}",
                        )
                    )
                elif ftype == "asymmetric":
                    from transfusion_tpu.models.fusion_variants import (
                        AsymmetricConfig,
                        AsymmetricCrossFusionLevel,
                    )

                    # The reference's num_layers[i] maps onto the asymmetric
                    # module's vis_layers slot (the wrapper forwards
                    # num_layers=... into the ctor, cross_f_box_wrapper.py:108
                    # — whose torch signature rejects it, another dead seam;
                    # the intended meaning is the visual depth).
                    levels.append(
                        AsymmetricCrossFusionLevel(
                            AsymmetricConfig(
                                token_dim=c.fusion.token_dim,
                                vis_layers=c.fusion.num_layers[i],
                                lang_layers=c.fusion.asymm_lang_layers,
                                num_heads=c.fusion.num_heads,
                                ff_multiplier=c.fusion.ff_multiplier,
                                vis_dropout=c.fusion.asymm_vis_dropout,
                                lang_dropout=c.fusion.asymm_lang_dropout,
                                patch_dropout=c.fusion.patch_dropout,
                                pos_embedding=c.fusion.pos_embedding,
                                activation=c.fusion.activation,
                                patch_h=c.fusion.patch_h[i],
                                patch_w=c.fusion.patch_w[i],
                            ),
                            CHANNELS[str(lvl)], dtype=c.dtype,
                            name=f"fusion_{lvl}",
                        )
                    )
                elif ftype == "space_time":
                    from transfusion_tpu.models.fusion_variants import SpaceTimeFusionLevel

                    levels.append(
                        SpaceTimeFusionLevel(
                            level_cfg, CHANNELS[str(lvl)], dtype=c.dtype,
                            name=f"fusion_{lvl}",
                        )
                    )
                else:
                    raise ValueError(f"cross_type={ftype!r} not implemented")
            self.fusion_levels = levels
        if c.ttc_hand is not None:
            from transfusion_tpu.models.ttc_head import TTCPredictionHead

            self.ttc_hand_head = TTCPredictionHead(c.ttc_hand, dtype=c.dtype)
        if c.use_language:
            if c.lm_on:
                mk_pool = lambda name=None: PoolPredictor(  # noqa: E731
                    num_nouns=c.detector.roi.num_nouns - 1,
                    num_verbs=c.detector.roi.num_verbs - 1,
                    pooling=c.lm_pooling,
                    use_ln=c.lm_use_ln,
                    dtype=c.dtype,
                    name=name,
                )
                if c.lm_multi == "sep" and not c.lm_use_f:
                    self.lm_layers = [
                        mk_pool(f"lm_layer_{i}") for i in range(len(c.fusion.fpn_features))
                    ]
                else:
                    self.lm_layer = mk_pool()

    def __call__(self, batch: dict, train: bool = False):
        """batch: image [B,H,W,3], image_hw tuple, optional input_ids/attention_mask,
        optional targets dict. Returns the reference output contract
        {"roi_outputs", "proposals", "image_sizes"[, "lm"]}."""
        c = self.cfg
        fpn_feats, lang_ctx = self._trunk(batch, train)
        outputs = self.rcnn.apply_rpn_roi(
            fpn_feats, batch["image_hw"], batch.get("targets"), train
        )

        if c.use_language and c.lm_on:
            outputs["lm"] = self._lm_outputs(lang_ctx)

        if c.ttc_hand is not None and train and "hand_boxes" in batch:
            # Training second pass (ego_nao_trainer.py:326-360): postprocess
            # detections (no gradient flows through argmax/NMS), run the
            # transformer head on their box features + hand history, and
            # expose the per-detection TTCs for the criterion.
            from transfusion_tpu.models.detector import detections_from_outputs

            # The reference runs postprocess under no_grad, so the head's
            # inputs (box features, det boxes) are detached — the ttc
            # criterion trains only the head (ego_nao_trainer.py:325 comment).
            dets = jax.tree.map(jax.lax.stop_gradient, detections_from_outputs(
                outputs, c.detector, training=True
            ))
            roi_sg = dict(outputs["roi_outputs"],
                          box_features=jax.lax.stop_gradient(outputs["roi_outputs"]["box_features"]))
            second = self.predict_ttc(
                dets, roi_sg, batch, batch["image_hw"], training=True
            )
            k = min(c.max_ttc_boxes, second["ttcs"].shape[1])
            outputs["ttc_hand"] = {
                "ttcs": second["ttcs"][:, :k],
                "valid": second["valid"][:, :k],
            }
        return outputs

    def eval_with_losses(self, batch: dict):
        """One deterministic eval forward producing BOTH the detection outputs
        (full proposal set, for postprocess/metrics) and a loss-path output
        (target-assigned RPN labels + sampled RoIs) so ``evaluate`` can log
        real validation losses. The heavy trunk (backbone + fusion + FPN) is
        computed once and shared by both RoI branches. The reference's
        validation_step logs constant-zero losses dotted with the normalized
        weight vector (ego_nao_trainer.py:407-427); here the same weighting is
        applied to actually-computed losses."""
        c = self.cfg
        fpn_feats, lang_ctx = self._trunk(batch, train=False)
        out_eval = self.rcnn.apply_rpn_roi(fpn_feats, batch["image_hw"], None, train=False)
        out_loss = self.rcnn.apply_rpn_roi(
            fpn_feats, batch["image_hw"], batch["targets"], train=False, sample=True
        )
        if c.use_language and c.lm_on:
            lm = self._lm_outputs(lang_ctx)
            out_eval["lm"] = lm
            out_loss["lm"] = lm
        return {"eval": out_eval, "loss": out_loss}

    def _trunk(self, batch: dict, train: bool):
        """Backbone features -> per-level language fusion -> FPN. Returns
        (fpn_feats, lang_ctx) where lang_ctx carries the fused language
        tokens for the LM auxiliary head."""
        c = self.cfg
        feats = self.rcnn.forward_features(batch["image"], train)

        lang_out = None
        mscale_lang = []
        if c.use_language:
            if c.text_encoder == "identity":
                # Precomputed language features straight from the batch
                # (IdentityLayer / NarrEmbeddingWrapper,
                # narr_pooling_layers.py:23-49).
                lang_tokens = batch["language_f"].astype(c.dtype)
                lang_mask = batch.get(
                    "language_mask",
                    jnp.ones(lang_tokens.shape[:2] if lang_tokens.ndim == 3
                             else (lang_tokens.shape[0], 1), jnp.int32),
                )
            else:
                narr_kwargs = {}
                if c.text_encoder == "sbert" and c.type_embeddings and "type_mask" in batch:
                    narr_kwargs["type_mask"] = batch["type_mask"]
                lang_tokens, lang_mask = self.narr_encoder(
                    batch["input_ids"], batch["attention_mask"], deterministic=not train,
                    **narr_kwargs,
                )
            if lang_tokens.ndim == 2:
                # embedding mode: one pooled sentence vector becomes a single
                # fully-attended language token (cross_f_box_wrapper.py:185-191).
                lang_tokens = lang_tokens[:, None]
                lang_mask = jnp.ones((lang_tokens.shape[0], 1), jnp.int32)
            language_f = lang_tokens
            for i, lvl in enumerate(c.fusion.fpn_features):
                key = str(lvl)
                level = self.fusion_levels[i]
                vis_f = batch.get("visual_features") if c.use_visual_features else None
                if c.remat_fusion and train:
                    fused, lang_out = nn.remat(
                        lambda mdl, f, lf, lm, vf: mdl(f, lf, lm, False, vf)
                    )(level, feats[key], language_f, lang_mask, vis_f)
                else:
                    fused, lang_out = level(
                        feats[key], language_f, lang_mask, not train, vis_f
                    )
                mscale_lang.append(lang_out)
                if c.fusion.forward_language_f == "direct":
                    language_f = lang_out
                elif c.fusion.forward_language_f == "sum":
                    language_f = language_f + lang_out
                if c.fusion.replace_fpn_features:
                    feats[key] = fused

        fpn_feats = self.rcnn.apply_fpn(feats)
        lang_ctx = None
        if c.use_language:
            lang_ctx = {"language_f": language_f, "lang_out": lang_out,
                        "mscale_lang": mscale_lang, "lang_mask": lang_mask}
        return fpn_feats, lang_ctx

    def _lm_outputs(self, lang_ctx: dict) -> dict:
        """get_lm_layer dispatch (lm_layers.py:5-27) + use_lm_f
        (cross_f_box_wrapper.py:223-225)."""
        c = self.cfg
        mask_b = lang_ctx["lang_mask"].astype(bool)
        if c.lm_use_f:
            return self.lm_layer(lang_ctx["language_f"], mask_b)
        if c.lm_multi == "sep":
            outs = [layer(f, mask_b) for layer, f in zip(self.lm_layers, lang_ctx["mscale_lang"])]
            return _mean_lm_outs(outs)
        if c.lm_multi:
            outs = [self.lm_layer(f, mask_b) for f in lang_ctx["mscale_lang"]]
            return _mean_lm_outs(outs)
        return self.lm_layer(lang_ctx["lang_out"], mask_b)

    def predict_ttc(self, dets: dict, roi_outputs: dict, batch: dict, image_hw,
                    training: bool = False) -> dict:
        """The detection second pass of the transformer TTC head
        (``dets_from_outs``, faster_rcnn_wrapper.py:219-263): for the top
        ``max_ttc_boxes`` detections per image, gather their RoI box features,
        normalize their boxes, attach the batch's hand box/pose history, and
        predict TTCs. The reference applies softplus both inside the head
        (ttc_pred.py:158) and again on its output (faster_rcnn_wrapper.py:253)
        — reproduced; MIN_TTC clamp in eval under additional_postprocessing.

        Returns dets with the first ``max_ttc_boxes`` TTC slots replaced
        (invalid slots and slots beyond the cap keep their values)."""
        c = self.cfg
        k = min(c.max_ttc_boxes, dets["boxes"].shape[1])
        bf = roi_outputs["box_features"]  # [B, R, repr]
        bsz = bf.shape[0]
        idx = dets["prop_idx"][:, :k]
        feats = jnp.take_along_axis(bf, idx[..., None], axis=1)  # [B, k, repr]
        wh = jnp.asarray([image_hw[1], image_hw[0], image_hw[1], image_hw[0]], jnp.float32)
        # Detections are at bucket resolution; normalized coordinates match
        # the reference's orig-resolution normalization exactly (the resize is
        # a per-axis linear map).
        obj = dets["boxes"][:, :k].astype(jnp.float32) / wh
        inputs = {
            "box_features": feats.reshape(bsz * k, -1),
            "object_boxes": obj.reshape(bsz * k, 1, 4),
            "hand_boxes": jnp.repeat(batch["hand_boxes"], k, axis=0),
            "hand_poses": jnp.repeat(batch["hand_poses"], k, axis=0),
        }
        ttc = self.ttc_hand_head(inputs, deterministic=not training)  # softplus'd
        ttc = jax.nn.softplus(ttc)  # the reference's second softplus
        if not training and c.detector.roi.additional_postprocessing:
            ttc = jnp.maximum(ttc, c.detector.roi.min_ttc)
        ttc = ttc.reshape(bsz, k)
        valid_k = dets["valid"][:, :k]
        new_ttcs = dets["ttcs"].at[:, :k].set(
            jnp.where(valid_k, ttc.astype(dets["ttcs"].dtype), dets["ttcs"][:, :k])
        )
        return dict(dets, ttcs=new_ttcs)


def build_transfusion_config(
    config: dict,
    num_nouns: int,
    num_verbs: int,
    dtype=jnp.float32,
) -> TransFusionConfig:
    """Map a derived reference-format config dict (see config.derive) onto
    TransFusionConfig. Mirrors get_model/get_fusion_model wiring
    (``modeling/model_factory.py:28-115``)."""
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig

    run = config["run"]
    model = config["model"]
    rcnn_kwargs = model.get("rcnn_kwargs", {})
    narr = run["narration_embeds"]
    narr_args = narr["args"]
    fusion_cfg = run["narr_fusion"]

    # Transformer TTC head (model.ttc_hand_head + run.hand_args —
    # model_factory.py:40-43, roi_wrappers.py:289-304).
    ttc_hand_cfg = None
    max_ttc_boxes = 5
    tth = model.get("ttc_hand_head") or {}
    if run["criterion"].get("ttc", 0) and tth.get("use"):
        from transfusion_tpu.models.ttc_head import TTCHeadConfig

        hand_args = run.get("hand_args") or {}
        if not hand_args.get("use"):
            # The reference reads run.hand_args unconditionally here
            # (model_factory.py:40-43) and its collate would feed None hand
            # tensors — fail loudly instead of training the head on nothing.
            raise ValueError("model.ttc_hand_head.use requires run.hand_args.use")
        ttc_hand_cfg = TTCHeadConfig(
            feat_dim=tth.get("feat_dim", 1024),
            ff_dim=tth.get("ff_dim", 1024),
            num_heads=tth.get("num_heads", 4),
            num_layers=tth.get("num_layers", 4),
            dropout=tth.get("dropout", 0.1),
            num_steps=hand_args.get("num_steps", 5),
            emb_steps_hand=tth.get("emb_steps_hand", 100),
            emb_steps_object=tth.get("emb_steps_object", 100),
            hand_feat_dim=hand_args.get("hand_feat_dim", 63),
            object_feat_dim=model["representation_size"],
        )
        max_ttc_boxes = tth.get("max_ttc_boxes_per_image", 5)

    roi = RoIConfig(
        num_nouns=num_nouns,
        num_verbs=num_verbs,
        representation_size=model["representation_size"],
        batch_size_per_image=rcnn_kwargs.get("box_batch_size_per_image", 512),
        score_thresh=rcnn_kwargs.get("box_score_thresh", 0.05),
        box_1_dropout=model.get("box_1_dropout", 0.0),
        box_2_dropout=model.get("box_2_dropout", 0.0),
        classif_dropout=run.get("class_dropout", 0.0),
        ttc_on=bool(run["criterion"].get("ttc", 0)),
        ttc_hand=ttc_hand_cfg is not None,
        additional_postprocessing=model.get("additional_postprocessing", False),
    )
    rpn = RPNConfig(score_thresh=rcnn_kwargs.get("rpn_score_thresh", 0.0))
    det = DetectorConfig(
        roi=roi,
        rpn=rpn,
        backbone=model.get("type", "res50"),
        trainable_bn=bool((model.get("batch_norm") or {}).get("use", False)),
        bn_momentum=(model.get("batch_norm") or {}).get("momentum", 0.1),
        # Additive knob (not in the reference schema): exact space-to-depth
        # stem; checkpoints fold via resnet.fold_stem_to_s2d.
        s2d_stem=bool(model.get("s2d_stem", False)),
        stride_in_1x1=model.get("adapt_to_detectron", False),
        # Additive knob (not in the reference schema): shrink the backbone
        # for smoke tests; defaults to ResNet-50.
        stage_sizes=tuple(model.get("stage_sizes", (3, 4, 6, 3))),
        dtype=dtype,
    )

    # Language tower dispatch (LM_TO_TEXT_POOLING + LANG_MODEL_FEATURE_SIZES,
    # run_experiment.py:43-61): sbert variants -> BERT/MiniLM stack, distilgpt2
    # -> GPT-2 causal encoder, t5-*/flan-t5-* -> T5 encoder stack.
    model_v = narr_args.get("model_v", "all-MiniLM-L12-v2")
    text_encoder = "sbert"
    gpt2_cfg = t5_cfg = None
    bert = BertConfig.minilm_l12()
    # Non-learnable text pooling (precomputed sbert vectors / slowfast
    # pooling / glove-table ids) maps to the IdentityLayer path: language
    # features arrive precomputed in the batch (narr_pooling_layers.py:23-33).
    text_pooling = narr_args.get("text_pooling", "sbert_finetune")
    if narr_args.get("pooling") == "sbert" or text_pooling not in (
        "sbert_finetune", "gpt2", "t5-wikihow"
    ):
        text_encoder = "identity"
    elif model_v == "distilgpt2":
        from transfusion_tpu.models.lm_encoders import GPT2Config

        text_encoder = "gpt2"
        gpt2_cfg = GPT2Config()  # distilgpt2: 768 hidden, 6 layers, 12 heads
    elif model_v.startswith(("t5-", "flan-t5-")):
        from transfusion_tpu.models.lm_encoders import T5Config

        text_encoder = "t5"
        t5_cfg = {
            # t5_urls (narr_pooling_layers.py:332-337): t5-small/-large are
            # the cnndm-wikihow finetunes of v1.0 T5 (relu FF); flan-t5 uses
            # gated gelu (v1.1 geometry).
            "t5-small": T5Config(),
            "t5-large": T5Config(hidden_size=1024, num_layers=24, num_heads=16, ff_dim=4096),
            "flan-t5-small": T5Config(hidden_size=512, num_layers=8, num_heads=6,
                                      ff_dim=1024, gated_ff=True),
            "flan-t5-large": T5Config(hidden_size=1024, num_layers=24, num_heads=16,
                                      ff_dim=2816, gated_ff=True),
        }[model_v]
    elif model_v == "minilm-tiny":
        bert = BertConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128)
    elif "L6" in model_v:
        bert = BertConfig.minilm_l6()

    fargs = fusion_cfg.get("args", {})
    # Box-path encoder family: the fusion YAML's type: key + the
    # class-token variant keyed on narr_out_mode == "embedding"
    # (get_cross_box_encoder, cross_f_box_wrapper.py:24-37, call at :88-91).
    fusion_type = fusion_cfg.get("type", "cross_transformer")
    if fusion_type not in ("cross_transformer", "space_time", "asymmetric"):
        # Mirrors get_cross_box_encoder's fail-loud default branch.
        raise ValueError(f"cross_type={fusion_type!r} not implemented")
    if fusion_type != "cross_transformer":
        if fusion_cfg.get("share_encoders"):
            raise ValueError(
                "share_encoders is a cross_transformer-wrapper feature "
                "(CrossFusionBoxWrapperShared, cross_f_box_wrapper.py:305)"
            )
        if narr.get("res50_f", False) or narr.get("slowfast_f_v", False):
            raise ValueError(
                "clip-feature fusion subclasses the cross_transformer wrapper "
                "only (cross_f_box_vis_language_wrapper.py)"
            )
    fus = FusionConfig(
        fusion_type=fusion_type,
        class_token_only=fusion_cfg.get("narr_out_mode", "tokens") == "embedding",
        asymm_lang_layers=fargs.get("lang_layers", 2),
        asymm_vis_dropout=fargs.get("vis_dropout", fargs.get("token_dropout", 0.1)),
        asymm_lang_dropout=fargs.get("lang_dropout", fargs.get("token_dropout", 0.1)),
        fpn_features=tuple(fusion_cfg.get("fpn_features", (0, 1, 2, 3))),
        patch_h=tuple(fusion_cfg.get("patch_h", (4, 4, 2, 1))),
        patch_w=tuple(fusion_cfg.get("patch_w", (4, 4, 2, 1))),
        num_layers=tuple(fargs.get("num_layers", (4, 4, 4, 4))),
        token_dim=fargs.get("input_f_size", 896),
        num_heads=fargs.get("num_heads", 4),
        ff_multiplier=fargs.get("fforward_multiplier", 2),
        token_dropout=fargs.get("token_dropout", 0.1),
        patch_dropout=fargs.get("patch_dropout", 0.1),
        backproj_dropout=fusion_cfg.get("backproj_dropout", 0.1),
        pos_embedding=fusion_cfg.get("pos_embedding", "sin1d"),
        final_norm=fargs.get("final_norm", "ln"),
        activation=fargs.get("activ_f", "gelu"),
        vis_mask_type=fusion_cfg.get("vis_mask_type", "global"),
        forward_language_f=fusion_cfg.get("forward_language_f", False),
        replace_fpn_features=fusion_cfg.get("replace_fpn_features", True),
        share_encoders=bool(fusion_cfg.get("share_encoders", False)),
        # Additive knob (not in the reference schema): route fusion attention
        # through the Pallas flash kernel. Default ON: at the round-3 lever
        # stack it wins training 34.09 vs 30.46 f/s/chip (B8 flagship, v5e)
        # and is neutral at eval (63.43 vs 63.55); sequences < 2048 stay on
        # XLA's fused attention regardless (models/fusion.py gate).
        use_flash_attention=bool(fargs.get("use_flash_attention", True)),
    )
    return TransFusionConfig(
        detector=det,
        fusion=fus,
        bert=bert,
        text_encoder=text_encoder,
        narr_out_mode=fusion_cfg.get("narr_out_mode", "tokens"),
        gpt2=gpt2_cfg,
        t5=t5_cfg,
        ttc_hand=ttc_hand_cfg,
        max_ttc_boxes=max_ttc_boxes,
        out_mlp=narr_args.get("out_mlp"),
        out_tanh=bool(narr_args.get("out_tanh", False)),
        out_dropout=narr_args.get("out_dropout", 0.1),
        lm_on=bool(run["criterion"].get("lm", 0)),
        lm_pooling=(fusion_cfg.get("lm_args") or {}).get("pooling", {}).get("type", "mean"),
        lm_use_ln=bool((fusion_cfg.get("lm_args") or {}).get("pooling", {}).get("ln", True)),
        lm_multi=(fusion_cfg.get("lm_args") or {}).get("multi", False),
        lm_use_f=bool((fusion_cfg.get("lm_args") or {}).get("use_lm_f", False)),
        type_embeddings=tuple(narr_args.get("type_embeddings") or ()),
        type_embedding_init_div=narr_args.get("type_embedding_init_div", 1.0),
        use_language=bool(narr.get("use", True)),
        # VisLangFusionBoxWrapper selection (model_factory.py:78-91).
        use_visual_features=bool(narr.get("res50_f", False) or narr.get("slowfast_f_v", False)),
        dtype=dtype,
    )
