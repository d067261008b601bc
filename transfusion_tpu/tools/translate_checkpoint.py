"""torch -> flax checkpoint translation.

Covers the reference's checkpoint lineage (SURVEY.md §5): the detectron2-
translated Ego4D baselines (``checkpoints/translated_ego4d{v2}.pth``) loaded
with the wrapper-prefix renames (``rcnn_factory.py:85-108``), huggingface
MiniLM weights for the narration encoder, and fully-trained reference
lightning checkpoints (fusion stacks included).

Layout conventions translated:
  * conv: OIHW -> HWIO;
  * linear: [out, in] -> [in, out] (transposed);
  * the box head's fc6 consumes flattened pooled features — torch flattens
    NCHW (c, y, x) while this stack flattens NHWC (y, x, c), so fc6's input
    columns are permuted accordingly;
  * fusion back-projection linears produce fold patches — torch's fold
    expects (C, ph, pw) channel blocks, ours (ph, pw, C), so output rows are
    permuted;
  * torch MultiheadAttention in_proj splits into q/k/v.

``translate_reference_checkpoint`` fills a flax param template from a torch
state dict and returns (params, report) where the report lists unmatched
keys on both sides — partial checkpoints (backbone-only, no-fusion) load
cleanly.
"""

from __future__ import annotations

import os
import re
from typing import Any

import numpy as np


def strip_wrapper_prefixes(state_dict: dict) -> dict:
    """rcnn_factory.py:86-92 key surgery (plus the lightning 'model.' prefix)."""
    out = {}
    for k, v in state_dict.items():
        k = k.replace("model.rcnn_model.rcnn_to_wrap.", "")
        k = k.replace("model.rcnn_model.", "")
        if k.startswith("model."):
            k = k[len("model."):]
        k = k.replace("rpn.rpn_wrap.", "rpn.")
        k = k.replace("roi_heads.roi_head_wrap.", "roi_heads.")
        out[k] = v
    return out


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def linear_kernel(t) -> np.ndarray:
    return _np(t).T


def fc6_kernel(t, pooled: int = 7, channels: int = 256) -> np.ndarray:
    """Permute fc6 input columns from (c, y, x) to (y, x, c) flattening."""
    w = _np(t)  # [out, c*p*p]
    out = w.shape[0]
    w = w.reshape(out, channels, pooled, pooled).transpose(0, 2, 3, 1).reshape(out, -1)
    return w.T


def backproj_kernel(t, out_channels: int, ph: int, pw: int) -> np.ndarray:
    """Fusion back-projection: torch fold rows (C, ph, pw) -> ours (ph, pw, C)."""
    w = _np(t)  # [C*ph*pw, token_dim]
    w = w.reshape(out_channels, ph, pw, -1).transpose(1, 2, 0, 3).reshape(out_channels * ph * pw, -1)
    return w.T


def _set(tree: dict, path: list[str], value: np.ndarray, report: dict):
    node = tree
    for p in path[:-1]:
        if p not in node:
            report["missing_target"].append("/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing_target"].append("/".join(path))
        return
    if tuple(node[leaf].shape) != tuple(value.shape):
        report["shape_mismatch"].append(("/".join(path), tuple(node[leaf].shape), tuple(value.shape)))
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report["translated"] += 1


_BN_MAP = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}


def translate_rcnn_keys(key: str, value, rcnn: dict, report: dict) -> bool:
    """Translate one torchvision-detection key into the FasterRCNN subtree."""
    m = re.fullmatch(r"backbone\.body\.conv1\.weight", key)
    if m:
        _set(rcnn, ["backbone", "stem", "conv", "kernel"], conv_kernel(value), report)
        return True
    m = re.fullmatch(r"backbone\.body\.bn1\.(\w+)", key)
    if m and m.group(1) in _BN_MAP:
        _set(rcnn, ["backbone", "stem", "bn", _BN_MAP[m.group(1)]], _np(value), report)
        return True
    m = re.fullmatch(r"backbone\.body\.layer(\d)\.(\d+)\.conv(\d)\.weight", key)
    if m:
        s, b, c = m.groups()
        _set(rcnn, ["backbone", f"layer{s}_{b}", f"conv{c}", "conv", "kernel"], conv_kernel(value), report)
        return True
    m = re.fullmatch(r"backbone\.body\.layer(\d)\.(\d+)\.bn(\d)\.(\w+)", key)
    if m and m.group(4) in _BN_MAP:
        s, b, c, f = m.groups()
        _set(rcnn, ["backbone", f"layer{s}_{b}", f"conv{c}", "bn", _BN_MAP[f]], _np(value), report)
        return True
    m = re.fullmatch(r"backbone\.body\.layer(\d)\.(\d+)\.downsample\.0\.weight", key)
    if m:
        s, b = m.groups()
        _set(rcnn, ["backbone", f"layer{s}_{b}", "downsample", "conv", "kernel"], conv_kernel(value), report)
        return True
    m = re.fullmatch(r"backbone\.body\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)", key)
    if m and m.group(3) in _BN_MAP:
        s, b, f = m.groups()
        _set(rcnn, ["backbone", f"layer{s}_{b}", "downsample", "bn", _BN_MAP[f]], _np(value), report)
        return True
    # FPN: torchvision 0.10 uses inner_blocks.{i}.{weight,bias}; newer wraps
    # a Conv2d at .0 (the reference load_state_dict surgery handles both —
    # ego_nao_trainer.py:67-69).
    m = re.fullmatch(r"backbone\.fpn\.(inner|layer)_blocks\.(\d)(?:\.0)?\.(weight|bias)", key)
    if m:
        kind, i, f = m.groups()
        name = f"{kind}_{i}"
        _set(rcnn, ["fpn", name, "kernel" if f == "weight" else "bias"],
             conv_kernel(value) if f == "weight" else _np(value), report)
        return True
    m = re.fullmatch(r"rpn\.head\.(conv|cls_logits|bbox_pred)(?:\.0\.0)?\.(weight|bias)", key)
    if m:
        layer, f = m.groups()
        _set(rcnn, ["rpn_head", layer, "kernel" if f == "weight" else "bias"],
             conv_kernel(value) if f == "weight" else _np(value), report)
        return True
    m = re.fullmatch(r"roi_heads\.box_head\.fc(6|7)\.(weight|bias)", key)
    if m:
        i, f = m.groups()
        if f == "weight":
            w = fc6_kernel(value) if i == "6" else linear_kernel(value)
        else:
            w = _np(value)
        _set(rcnn, ["box_head", f"fc{i}", "kernel" if f == "weight" else "bias"], w, report)
        return True
    m = re.fullmatch(r"roi_heads\.(noun_classifier|verb_classifier|ttc_pred_layer)\.(weight|bias)", key)
    if m:
        head, f = m.groups()
        _set(rcnn, ["predictors", head, "kernel" if f == "weight" else "bias"],
             linear_kernel(value) if f == "weight" else _np(value), report)
        return True
    m = re.fullmatch(r"roi_heads\.box_regressor\.1\.(weight|bias)", key)
    if m:
        f = m.group(1)
        _set(rcnn, ["predictors", "box_regressor", "kernel" if f == "weight" else "bias"],
             linear_kernel(value) if f == "weight" else _np(value), report)
        return True
    return False


def translate_bert_keys(key: str, value, bert: dict, report: dict, prefix: str = "") -> bool:
    """Translate huggingface BertModel keys into the BertEncoder subtree."""
    key = key.removeprefix(prefix)
    mapping = [
        (r"embeddings\.word_embeddings\.weight", ["word_embeddings", "embedding"], _np),
        (r"embeddings\.position_embeddings\.weight", ["position_embeddings"], _np),
        (r"embeddings\.token_type_embeddings\.weight", ["token_type_embeddings"], _np),
        (r"embeddings\.LayerNorm\.weight", ["embeddings_norm", "scale"], _np),
        (r"embeddings\.LayerNorm\.bias", ["embeddings_norm", "bias"], _np),
    ]
    for pat, path, fn in mapping:
        if re.fullmatch(pat, key):
            _set(bert, path, fn(value), report)
            return True
    m = re.fullmatch(
        r"encoder\.layer\.(\d+)\.(attention\.self\.(?:query|key|value)|attention\.output\.dense|"
        r"attention\.output\.LayerNorm|intermediate\.dense|output\.dense|output\.LayerNorm)\.(weight|bias)",
        key,
    )
    if m:
        i, part, f = m.groups()
        layer = f"layer_{i}"
        if part.startswith("attention.self."):
            path = [layer, "attention", part.split(".")[-1]]
            w = linear_kernel(value) if f == "weight" else _np(value)
            _set(bert, path + ["kernel" if f == "weight" else "bias"], w, report)
        elif part == "attention.output.dense":
            w = linear_kernel(value) if f == "weight" else _np(value)
            _set(bert, [layer, "attention", "output", "kernel" if f == "weight" else "bias"], w, report)
        elif part == "attention.output.LayerNorm":
            _set(bert, [layer, "attention_norm", "scale" if f == "weight" else "bias"], _np(value), report)
        elif part == "intermediate.dense":
            w = linear_kernel(value) if f == "weight" else _np(value)
            _set(bert, [layer, "intermediate", "kernel" if f == "weight" else "bias"], w, report)
        elif part == "output.dense":
            w = linear_kernel(value) if f == "weight" else _np(value)
            _set(bert, [layer, "output", "kernel" if f == "weight" else "bias"], w, report)
        elif part == "output.LayerNorm":
            _set(bert, [layer, "output_norm", "scale" if f == "weight" else "bias"], _np(value), report)
        return True
    return False


def translate_gpt2_keys(key: str, value, gpt2: dict, report: dict) -> bool:
    """Translate huggingface GPT2Model keys into the GPT2Encoder subtree.

    The reference loads ``GPT2LMHeadModel.from_pretrained("distilgpt2")`` and
    drops the LM head (``narr_pooling_layers.py:270-276`` lm_head -> Identity),
    so both bare GPT2Model keys and ``transformer.``-prefixed LM-head keys are
    accepted. HF GPT-2 uses Conv1D layers whose weight is [in, out] — the flax
    Dense kernel layout — so attention/MLP weights copy WITHOUT transposition
    (unlike nn.Linear)."""
    key = key.removeprefix("transformer.")
    if key.startswith("lm_head.") or key.endswith((".attn.bias", ".attn.masked_bias")):
        report["skipped"].append(key)
        return True
    if key == "wte.weight":
        _set(gpt2, ["wte", "embedding"], _np(value), report)
        return True
    if key == "wpe.weight":
        _set(gpt2, ["wpe"], _np(value), report)
        return True
    m = re.fullmatch(r"ln_f\.(weight|bias)", key)
    if m:
        _set(gpt2, ["ln_f", "scale" if m.group(1) == "weight" else "bias"], _np(value), report)
        return True
    m = re.fullmatch(r"h\.(\d+)\.(ln_1|ln_2)\.(weight|bias)", key)
    if m:
        i, ln, f = m.groups()
        _set(gpt2, [f"h_{i}", ln, "scale" if f == "weight" else "bias"], _np(value), report)
        return True
    m = re.fullmatch(r"h\.(\d+)\.(attn\.c_attn|attn\.c_proj|mlp\.c_fc|mlp\.c_proj)\.(weight|bias)", key)
    if m:
        i, part, f = m.groups()
        name = {"attn.c_attn": "c_attn", "attn.c_proj": "c_proj",
                "mlp.c_fc": "mlp_fc", "mlp.c_proj": "mlp_proj"}[part]
        # Conv1D weight is already [in, out]; bias is [out].
        _set(gpt2, [f"h_{i}", name, "kernel" if f == "weight" else "bias"], _np(value), report)
        return True
    return False


def translate_t5_keys(key: str, value, t5: dict, report: dict) -> bool:
    """Translate huggingface T5EncoderModel (or the encoder half of
    T5ForConditionalGeneration — the reference's t5-wikihow finetune checkpoint
    shape, ``t5_adapter_no_loss.py``) keys into the T5Encoder subtree. All T5
    projections are bias-free nn.Linear ([out, in] -> transpose); the relative
    position bias table lives only in block 0."""
    if key.startswith(("decoder.", "lm_head.")):
        report["skipped"].append(key)
        return True
    if key in ("shared.weight", "encoder.embed_tokens.weight"):
        # shared.weight and the encoder's embed_tokens alias the same tensor;
        # translate the first seen, skip duplicates.
        if "_embed_done" in report:
            report["skipped"].append(key)
            return True
        report["_embed_done"] = True
        _set(t5, ["shared", "embedding"], _np(value), report)
        return True
    if key == "encoder.final_layer_norm.weight":
        _set(t5, ["final_norm", "scale"], _np(value), report)
        return True
    m = re.fullmatch(r"encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.([qkvo])\.weight", key)
    if m:
        i, p = m.groups()
        _set(t5, [f"block_{i}", p, "kernel"], linear_kernel(value), report)
        return True
    m = re.fullmatch(
        r"encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.relative_attention_bias\.weight", key
    )
    if m:
        _set(t5, [f"block_{m.group(1)}", "relative_attention_bias"], _np(value), report)
        return True
    m = re.fullmatch(r"encoder\.block\.(\d+)\.layer\.(0|1)\.layer_norm\.weight", key)
    if m:
        i, which = m.groups()
        _set(t5, [f"block_{i}", "ln_attn" if which == "0" else "ln_ff", "scale"], _np(value), report)
        return True
    m = re.fullmatch(r"encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.(wi|wi_0|wi_1|wo)\.weight", key)
    if m:
        i, p = m.groups()
        _set(t5, [f"block_{i}", p, "kernel"], linear_kernel(value), report)
        return True
    return False


def translate_lm_tower(state_dict: dict, encoder_params: Any, kind: str) -> tuple[Any, dict]:
    """Fill a GPT2Encoder / T5Encoder param tree from an HF state dict.

    ``kind``: "gpt2" or "t5". Accepts GPT2Model / GPT2LMHeadModel /
    T5EncoderModel / T5ForConditionalGeneration state dicts (the decoder and
    LM-head keys are skipped). Returns (new_params, report)."""
    import jax

    tree = jax.tree.map(np.asarray, encoder_params)
    report = {"translated": 0, "unmatched_source": [], "missing_target": [],
              "shape_mismatch": [], "skipped": []}
    fn = {"gpt2": translate_gpt2_keys, "t5": translate_t5_keys}[kind]
    for key, value in state_dict.items():
        if not fn(key, value, tree, report):
            report["unmatched_source"].append(key)
    report.pop("_embed_done", None)
    return tree, report


def translate_fusion_keys(key: str, value, params: dict, report: dict, fpn_features=(0, 1, 2, 3),
                          patch_hw=((4, 4), (4, 4), (2, 2), (1, 1)), channels=None) -> bool:
    """Translate reference CrossFusionBoxWrapper keys (cross_f_box_wrapper.py)."""
    if channels is None:
        # Backbone channels of the selected FPN features, indexed by level
        # position in the fusion stack.
        base = {0: 256, 1: 512, 2: 1024, 3: 2048}
        channels = tuple(base[f] for f in fpn_features)
    def level_name(i):
        return f"fusion_{fpn_features[int(i)]}"

    m = re.fullmatch(r"patches_to_token\.(\d)\.weight", key)
    if m:
        _set(params, [level_name(m.group(1)), "patch_to_token", "kernel"], conv_kernel(value), report)
        return True
    m = re.fullmatch(r"tokens_to_features\.(\d)\.linear\.(weight|bias)", key)
    if m:
        i, f = m.groups()
        lvl = int(i)
        if f == "weight":
            ph, pw = patch_hw[lvl]
            w = backproj_kernel(value, channels[lvl], ph, pw)
        else:
            ph, pw = patch_hw[lvl]
            c = channels[lvl]
            b = _np(value).reshape(c, ph, pw).transpose(1, 2, 0).reshape(-1)
            w = b
        _set(params, [level_name(i), "back_proj", "kernel" if f == "weight" else "bias"], w, report)
        return True
    m = re.fullmatch(r"cross_fusion_encoders\.(\d)\.(image|lang)_kind_embedding", key)
    if m:
        i, kind = m.groups()
        _set(params, [level_name(i), f"{kind}_kind"], _np(value), report)
        return True
    m = re.fullmatch(
        r"cross_fusion_encoders\.(\d)\.t_encoder\.layers\.(\d+)\.(.+)", key
    )
    if m:
        i, li, rest = m.groups()
        layer = [level_name(i), f"layer_{li}"]
        if rest == "self_attn.in_proj_weight":
            w = _np(value)
            d = w.shape[0] // 3
            for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                _set(params, layer + [name, "kernel"], w[j * d : (j + 1) * d].T, report)
            return True
        if rest == "self_attn.in_proj_bias":
            w = _np(value)
            d = w.shape[0] // 3
            for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
                _set(params, layer + [name, "bias"], w[j * d : (j + 1) * d], report)
            return True
        sub = {
            "self_attn.out_proj.weight": (["out_proj", "kernel"], linear_kernel),
            "self_attn.out_proj.bias": (["out_proj", "bias"], _np),
            "linear1.weight": (["linear1", "kernel"], linear_kernel),
            "linear1.bias": (["linear1", "bias"], _np),
            "linear2.weight": (["linear2", "kernel"], linear_kernel),
            "linear2.bias": (["linear2", "bias"], _np),
            "norm1.weight": (["norm1", "scale"], _np),
            "norm1.bias": (["norm1", "bias"], _np),
            "norm2.weight": (["norm2", "scale"], _np),
            "norm2.bias": (["norm2", "bias"], _np),
        }
        if rest in sub:
            path, fn = sub[rest]
            _set(params, layer + path, fn(value), report)
            return True
        return False
    m = re.fullmatch(r"cross_fusion_encoders\.(\d)\.final_norm_layer\.(weight|bias)", key)
    if m:
        i, f = m.groups()
        _set(params, [level_name(i), "final_norm", "scale" if f == "weight" else "bias"], _np(value), report)
        return True
    # Narration encoder: sentence-transformers wraps hf bert at
    # narr_pooling_layer.encoder.0.auto_model.
    if key.startswith("narr_pooling_layer.encoder.0.auto_model."):
        sub = key.removeprefix("narr_pooling_layer.encoder.0.auto_model.")
        if sub == "embeddings.position_ids":
            report["skipped"].append(key)
            return True
        if sub.startswith("pooler."):
            report["skipped"].append(key)  # pooler unused in token mode
            return True
        bert = params.get("narr_encoder", {}).get("bert")
        if bert is None:
            report["missing_target"].append(key)
            return True
        return translate_bert_keys(sub, value, bert, report)
    # GPT-2 / T5 towers: GPT2Layer holds a GPT2LMHeadModel at .encoder
    # (narr_pooling_layers.py:273 -> keys narr_pooling_layer.encoder.
    # transformer.*), T5WikiLayer a Seq2Seq model at .encoder (keys
    # narr_pooling_layer.encoder.{shared,encoder.block...}, :353-355).
    # Our PooledLMEncoder adopts its tower under narr_encoder/encoder.
    if key.startswith("narr_pooling_layer.encoder."):
        sub = key.removeprefix("narr_pooling_layer.encoder.")
        tower = params.get("narr_encoder", {}).get("encoder")
        if tower is None:
            report["missing_target"].append(key)
            return True
        if sub.startswith("transformer.") or sub in ("lm_head.weight",):
            return translate_gpt2_keys(sub, value, tower, report)
        return translate_t5_keys(sub, value, tower, report)
    m = re.fullmatch(r"narr_pooling_layer\.out_mlp\.(weight|bias)", key)
    if m:
        f = m.group(1)
        _set(params, ["narr_encoder", "out_mlp", "kernel" if f == "weight" else "bias"],
             linear_kernel(value) if f == "weight" else _np(value), report)
        return True
    m = re.fullmatch(r"lm_layer\.(ln|mlp_noun|mlp_verb)\.(weight|bias)", key)
    if m:
        part, f = m.groups()
        if part == "ln":
            _set(params, ["lm_layer", "ln", "scale" if f == "weight" else "bias"], _np(value), report)
        else:
            _set(params, ["lm_layer", part, "kernel" if f == "weight" else "bias"],
                 linear_kernel(value) if f == "weight" else _np(value), report)
        return True
    return False


def translate_reference_checkpoint(state_dict: dict, params: Any, fpn_features=(0, 1, 2, 3),
                                   patch_hw=((4, 4), (4, 4), (2, 2), (1, 1))) -> tuple[Any, dict]:
    """Fill a TransFusion flax param tree from a reference torch state dict.

    Accepts raw lightning checkpoints (``state_dict`` inside), wrapper
    prefixes included. Returns (new_params, report).
    """
    import jax

    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    state_dict = strip_wrapper_prefixes(state_dict)

    tree = jax.tree.map(np.asarray, params)
    report = {"translated": 0, "unmatched_source": [], "missing_target": [],
              "shape_mismatch": [], "skipped": []}

    rcnn = tree.get("rcnn", tree)
    # Space-to-depth stem target (DetectorConfig.s2d_stem): stage a standard
    # stem for the key translation, fold it afterwards.
    s2d_target = "stem_s2d" in rcnn.get("backbone", {})
    if s2d_target:
        rcnn["backbone"]["stem"] = {
            "conv": {"kernel": np.zeros((7, 7, 3, 64), np.float32)},
            "bn": {k: np.zeros(64, np.float32) for k in ("scale", "bias", "mean", "var")},
        }
    for key, value in state_dict.items():
        if "num_batches_tracked" in key or key.endswith("position_ids"):
            report["skipped"].append(key)
            continue
        if translate_rcnn_keys(key, value, rcnn, report):
            continue
        if translate_fusion_keys(key, value, tree, report, fpn_features, patch_hw):
            continue
        report["unmatched_source"].append(key)

    report.pop("_embed_done", None)
    if s2d_target:
        from transfusion_tpu.models.resnet import fold_stem_to_s2d

        backbone = rcnn["backbone"]
        backbone["stem_s2d"]["kernel"] = fold_stem_to_s2d(backbone["stem"]["conv"]["kernel"])
        backbone["stem_bn"] = dict(backbone["stem"]["bn"])
        del backbone["stem"]
    return tree, report


def translate_minilm(state_dict: dict, bert_params: Any, prefix: str = "") -> tuple[Any, dict]:
    """Fill a BertEncoder param tree from a huggingface BertModel state dict."""
    import jax

    tree = jax.tree.map(np.asarray, bert_params)
    report = {"translated": 0, "unmatched_source": [], "missing_target": [],
              "shape_mismatch": [], "skipped": []}
    for key, value in state_dict.items():
        if key.endswith("position_ids") or "pooler" in key:
            report["skipped"].append(key)
            continue
        if not translate_bert_keys(key, value, tree, report, prefix):
            report["unmatched_source"].append(key)
    return tree, report


def main(argv=None):
    """CLI: translate a reference .pth checkpoint into an orbax directory.

    Usage: python -m transfusion_tpu.tools.translate_checkpoint \
        --checkpoint translated_ego4dv2.pth --config <run yml> \
        --num-nouns 88 --num-verbs 75 --out <dir>
    """
    import argparse
    import json

    import jax
    import orbax.checkpoint as ocp

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="torch .pth/.ckpt file")
    parser.add_argument("--config", required=True, help="reference run config YAML")
    parser.add_argument("--num-nouns", type=int, required=True)
    parser.add_argument("--num-verbs", type=int, required=True)
    parser.add_argument("--out", required=True, help="output orbax params dir")
    parser.add_argument("--image-hw", type=int, nargs=2, default=(256, 320),
                        help="init resolution (params are resolution-independent)")
    args = parser.parse_args(argv)

    import torch

    import jax.numpy as jnp

    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.models.transfusion import TransFusion, build_transfusion_config

    cfg_dict = derive_config(load_config(args.config))
    cfg = build_transfusion_config(cfg_dict, args.num_nouns, args.num_verbs)
    model = TransFusion(cfg)
    h, w = args.image_hw
    batch = {
        "image": jnp.zeros((1, h, w, 3), jnp.float32),
        "image_hw": (h, w),
        "input_ids": jnp.ones((1, 16), jnp.int32),
        "attention_mask": jnp.ones((1, 16), jnp.int32),
    }
    params = model.init({"params": jax.random.key(0)}, batch, False)["params"]

    sd = torch.load(args.checkpoint, map_location="cpu")
    new_params, report = translate_reference_checkpoint(
        sd, params,
        fpn_features=tuple(cfg.fusion.fpn_features),
        patch_hw=tuple(zip(cfg.fusion.patch_h, cfg.fusion.patch_w)),
    )
    ocp.StandardCheckpointer().save(os.path.abspath(args.out), new_params, force=True)
    # Provenance sidecar: restoring pretrained (vocab-aligned) tower weights
    # while a hash-fallback tokenizer is active would silently produce garbage
    # token ids — the trainer checks this marker and fails loudly.
    with open(os.path.join(os.path.abspath(args.out) + ".provenance.json"), "w") as fp:
        json.dump({"source": "torch_translation", "pretrained_language_tower": True,
                   "checkpoint": os.path.basename(args.checkpoint)}, fp)
    summary = {
        "translated": report["translated"],
        "unmatched_source": len(report["unmatched_source"]),
        "missing_target": len(report["missing_target"]),
        "shape_mismatch": report["shape_mismatch"][:10],
        "skipped": len(report["skipped"]),
    }
    print(json.dumps(summary, indent=1))
    if report["unmatched_source"]:
        print("unmatched (first 20):", report["unmatched_source"][:20])


if __name__ == "__main__":
    main()
