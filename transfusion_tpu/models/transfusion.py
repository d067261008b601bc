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
import jax.numpy as jnp

from transfusion_tpu.models.detector import DetectorConfig, FasterRCNN
from transfusion_tpu.models.fusion import CrossFusionLevel, FusionLevelConfig, PoolPredictor
from transfusion_tpu.models.resnet import RESNET50_CHANNELS
from transfusion_tpu.models.text_encoder import BertConfig, NarrationEncoder


@dataclass(frozen=True)
class FusionConfig:
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


@dataclass(frozen=True)
class TransFusionConfig:
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    bert: BertConfig = field(default_factory=BertConfig.minilm_l12)
    out_mlp: int | None = 896
    out_tanh: bool = False
    out_dropout: float = 0.1
    lm_on: bool = False
    lm_pooling: str = "mean"
    lm_use_ln: bool = True
    use_language: bool = True
    # Precomputed clip-feature early fusion (VisLangFusionBoxWrapper,
    # cross_f_box_vis_language_wrapper.py): batch["visual_features"] [B, T, F]
    # fuses with each level's patch tokens before the language stage.
    use_visual_features: bool = False
    visual_feature_layers: int = 2
    # Rematerialize the fusion levels in the backward pass (jax.checkpoint):
    # trades recompute for activation memory, the standard TPU lever for
    # growing the per-chip train batch past what the 896-dim joint attention
    # activations allow.
    remat_fusion: bool = False
    dtype: Any = jnp.float32


class TransFusion(nn.Module):
    cfg: TransFusionConfig

    def setup(self):
        c = self.cfg
        self.rcnn = FasterRCNN(c.detector)
        if c.use_language:
            self.narr_encoder = NarrationEncoder(
                c.bert,
                out_mode="tokens",
                out_mlp=c.out_mlp,
                out_tanh=c.out_tanh,
                out_dropout=c.out_dropout,
                dtype=c.dtype,
            )
            shared_layers = None
            if c.fusion.share_encoders:
                from transfusion_tpu.models.fusion import EncoderLayer

                shared_layers = tuple(
                    EncoderLayer(
                        c.fusion.token_dim, c.fusion.num_heads, c.fusion.ff_multiplier,
                        c.fusion.token_dropout, c.fusion.activation, c.dtype,
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
                )
                levels.append(
                    CrossFusionLevel(
                        level_cfg, RESNET50_CHANNELS[str(lvl)], dtype=c.dtype,
                        shared_layers=shared_layers,
                        vis_fusion=vis_fusion_mods.get(lvl),
                        name=f"fusion_{lvl}",
                    )
                )
            self.fusion_levels = levels
            if c.lm_on:
                self.lm_layer = PoolPredictor(
                    num_nouns=c.detector.roi.num_nouns - 1,
                    num_verbs=c.detector.roi.num_verbs - 1,
                    pooling=c.lm_pooling,
                    use_ln=c.lm_use_ln,
                    dtype=c.dtype,
                )

    def __call__(self, batch: dict, train: bool = False):
        """batch: image [B,H,W,3], image_hw tuple, optional input_ids/attention_mask,
        optional targets dict. Returns the reference output contract
        {"roi_outputs", "proposals", "image_sizes"[, "lm"]}."""
        c = self.cfg
        feats = self.rcnn.forward_features(batch["image"])

        lang_out = None
        if c.use_language:
            lang_tokens, lang_mask = self.narr_encoder(
                batch["input_ids"], batch["attention_mask"], deterministic=not train
            )
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
                if c.fusion.forward_language_f == "direct":
                    language_f = lang_out
                elif c.fusion.forward_language_f == "sum":
                    language_f = language_f + lang_out
                if c.fusion.replace_fpn_features:
                    feats[key] = fused

        fpn_feats = self.rcnn.apply_fpn(feats)
        outputs = self.rcnn.apply_rpn_roi(
            fpn_feats, batch["image_hw"], batch.get("targets"), train
        )

        if c.use_language and c.lm_on:
            outputs["lm"] = self.lm_layer(lang_out, lang_mask.astype(bool))
        return outputs


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
        additional_postprocessing=model.get("additional_postprocessing", False),
    )
    rpn = RPNConfig(score_thresh=rcnn_kwargs.get("rpn_score_thresh", 0.0))
    det = DetectorConfig(
        roi=roi,
        rpn=rpn,
        stride_in_1x1=model.get("adapt_to_detectron", False),
        # Additive knob (not in the reference schema): shrink the backbone
        # for smoke tests; defaults to ResNet-50.
        stage_sizes=tuple(model.get("stage_sizes", (3, 4, 6, 3))),
        dtype=dtype,
    )

    model_v = narr_args.get("model_v", "all-MiniLM-L12-v2")
    if model_v == "minilm-tiny":
        bert = BertConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128)
    elif "L6" in model_v:
        bert = BertConfig.minilm_l6()
    else:
        bert = BertConfig.minilm_l12()

    fargs = fusion_cfg.get("args", {})
    fus = FusionConfig(
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
    )
    return TransFusionConfig(
        detector=det,
        fusion=fus,
        bert=bert,
        out_mlp=narr_args.get("out_mlp"),
        out_tanh=bool(narr_args.get("out_tanh", False)),
        out_dropout=narr_args.get("out_dropout", 0.1),
        lm_on=bool(run["criterion"].get("lm", 0)),
        use_language=bool(narr.get("use", True)),
        # VisLangFusionBoxWrapper selection (model_factory.py:78-91).
        use_visual_features=bool(narr.get("res50_f", False) or narr.get("slowfast_f_v", False)),
        dtype=dtype,
    )
