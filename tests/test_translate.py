"""Checkpoint translation: functional oracles for layout-sensitive pieces and
coverage over a synthetic reference state dict."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from transfusion_tpu.models.roi_heads import BoxHead
from transfusion_tpu.models.text_encoder import BertConfig, BertEncoder
from transfusion_tpu.tools.translate_checkpoint import (
    fc6_kernel,
    linear_kernel,
    strip_wrapper_prefixes,
    translate_minilm,
    translate_reference_checkpoint,
)


def test_fc6_permutation_functional(rng):
    """torch TwoMLP on NCHW-flattened pooled features == our BoxHead on NHWC
    after fc6 column permutation."""
    repr_size, c, p = 48, 16, 7
    fc6 = nn.Linear(c * p * p, repr_size)
    fc7 = nn.Linear(repr_size, repr_size)
    pooled = rng.normal(0, 1, (2, 5, c, p, p)).astype(np.float32)  # NCHW per roi

    with torch.no_grad():
        t = torch.from_numpy(pooled).flatten(start_dim=2)
        ref = torch.relu(fc7(torch.relu(fc6(t)))).numpy()

    head = BoxHead(representation_size=repr_size)
    pooled_nhwc = jnp.asarray(pooled.transpose(0, 1, 3, 4, 2))  # [B, R, P, P, C]
    params = head.init(jax.random.key(0), pooled_nhwc)["params"]
    params["fc6"]["kernel"] = jnp.asarray(fc6_kernel(fc6.weight, pooled=p, channels=c))
    params["fc6"]["bias"] = jnp.asarray(fc6.bias.detach().numpy())
    params["fc7"]["kernel"] = jnp.asarray(linear_kernel(fc7.weight))
    params["fc7"]["bias"] = jnp.asarray(fc7.bias.detach().numpy())
    got = np.asarray(head.apply({"params": params}, pooled_nhwc))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_strip_wrapper_prefixes():
    sd = {
        "model.rcnn_model.rcnn_to_wrap.backbone.body.conv1.weight": 1,
        "model.rcnn_model.rcnn_to_wrap.rpn.rpn_wrap.head.conv.weight": 2,
        "model.rcnn_model.rcnn_to_wrap.roi_heads.roi_head_wrap.box_head.fc6.weight": 3,
        "model.narr_pooling_layer.out_mlp.weight": 4,
    }
    out = strip_wrapper_prefixes(sd)
    assert out["backbone.body.conv1.weight"] == 1
    assert out["rpn.head.conv.weight"] == 2
    assert out["roi_heads.box_head.fc6.weight"] == 3
    assert out["narr_pooling_layer.out_mlp.weight"] == 4


def test_translate_minilm_via_hf(rng):
    import transformers

    hf = transformers.BertModel(
        transformers.BertConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, max_position_embeddings=40, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    ).eval()
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position_embeddings=40, dropout=0.0)
    enc = BertEncoder(cfg)
    ids = rng.integers(0, 120, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))["params"]

    sd = {k: v for k, v in hf.state_dict().items()}
    new_params, report = translate_minilm(sd, params)
    assert not report["unmatched_source"], report["unmatched_source"][:5]
    assert not report["missing_target"] and not report["shape_mismatch"]

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64)), torch.from_numpy(mask.astype(np.int64)))
    got = np.asarray(enc.apply({"params": jax.tree.map(jnp.asarray, new_params)},
                               jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref.last_hidden_state.numpy(), rtol=1e-4, atol=1e-4)


def test_translate_full_reference_checkpoint_coverage():
    """A synthetic torch state dict with reference key names translates into
    the flagship param tree with full coverage on matching shapes."""
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig as BC
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=7, num_verbs=5, representation_size=64,
                          batch_size_per_image=8, detections_per_img=4, ttc_on=True),
            rpn=RPNConfig(pre_nms_top_n_test=32, post_nms_top_n_test=16),
        ),
        fusion=FusionConfig(fpn_features=(2, 3), patch_h=(2, 1), patch_w=(2, 1),
                            num_layers=(1, 1), token_dim=32, num_heads=4),
        bert=BC(vocab_size=100, hidden_size=24, num_layers=1, num_heads=4,
                intermediate_size=48, max_position_embeddings=16),
        out_mlp=32,
        lm_on=True,
    )
    model = TransFusion(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_hw": (64, 64),
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.key(0)}, batch, False)["params"]

    # Build a synthetic torch state dict with the reference names/shapes for a
    # subset of weight families across all regions of the tree.
    rng = np.random.default_rng(1)
    t = lambda *s: torch.from_numpy(rng.normal(0, 0.02, s).astype(np.float32))
    sd = {
        "backbone.body.conv1.weight": t(64, 3, 7, 7),
        "backbone.body.bn1.weight": t(64),
        "backbone.body.bn1.running_var": torch.abs(t(64)) + 0.5,
        "backbone.body.layer2.0.conv2.weight": t(128, 128, 3, 3),
        "backbone.body.layer2.0.downsample.0.weight": t(512, 256, 1, 1),
        "backbone.body.layer2.0.downsample.1.running_mean": t(512),
        "backbone.fpn.inner_blocks.2.weight": t(256, 1024, 1, 1),
        "backbone.fpn.layer_blocks.0.0.weight": t(256, 256, 3, 3),
        "rpn.head.conv.weight": t(256, 256, 3, 3),
        "rpn.head.cls_logits.bias": t(3),
        "roi_heads.box_head.fc6.weight": t(64, 256 * 49),
        "roi_heads.box_head.fc7.weight": t(64, 64),
        "roi_heads.noun_classifier.weight": t(7, 64),
        "roi_heads.verb_classifier.bias": t(5),
        "roi_heads.box_regressor.1.weight": t(28, 64),
        "roi_heads.ttc_pred_layer.weight": t(1, 64),
        "patches_to_token.0.weight": t(32, 1024, 2, 2),
        "tokens_to_features.1.linear.weight": t(2048, 32),
        "cross_fusion_encoders.0.image_kind_embedding": t(1, 1, 32),
        "cross_fusion_encoders.0.t_encoder.layers.0.self_attn.in_proj_weight": t(96, 32),
        "cross_fusion_encoders.0.t_encoder.layers.0.self_attn.in_proj_bias": t(96),
        "cross_fusion_encoders.0.t_encoder.layers.0.self_attn.out_proj.weight": t(32, 32),
        "cross_fusion_encoders.0.t_encoder.layers.0.linear1.weight": t(64, 32),
        "cross_fusion_encoders.0.t_encoder.layers.0.norm2.weight": t(32),
        "cross_fusion_encoders.1.final_norm_layer.bias": t(32),
        "narr_pooling_layer.out_mlp.weight": t(32, 24),
        "narr_pooling_layer.encoder.0.auto_model.embeddings.word_embeddings.weight": t(100, 24),
        "narr_pooling_layer.encoder.0.auto_model.encoder.layer.0.intermediate.dense.weight": t(48, 24),
        "lm_layer.mlp_noun.weight": t(6, 32),
        "lm_layer.ln.weight": t(32),
        "some.unknown.key": t(3),
    }
    new_params, report = translate_reference_checkpoint(
        sd, params, fpn_features=(2, 3), patch_hw=((2, 2), (1, 1))
    )
    assert report["unmatched_source"] == ["some.unknown.key"], report["unmatched_source"]
    assert not report["missing_target"], report["missing_target"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert report["translated"] >= 28

    # Spot-check one translated value landed with the layout transform.
    got = new_params["rcnn"]["backbone"]["stem"]["conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), sd["backbone.body.conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6
    )


def test_translate_into_s2d_stem_target(rng):
    """Translating a standard checkpoint into an s2d_stem model folds the 7x7
    stem into the space-to-depth layout exactly (resnet.fold_stem_to_s2d)."""
    import torch

    from transfusion_tpu.models.resnet import ResNet, fold_stem_to_s2d

    std = ResNet(stage_sizes=(1,))
    s2d = ResNet(stage_sizes=(1,), s2d_stem=True)
    x = jnp.zeros((1, 32, 32, 3))
    p_std = std.init(jax.random.key(0), x)["params"]
    p_s2d = s2d.init(jax.random.key(1), x)["params"]

    w = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    sd = {
        "backbone.body.conv1.weight": torch.from_numpy(w),
        "backbone.body.bn1.weight": torch.from_numpy(np.ones(64, np.float32) * 1.5),
        "backbone.body.bn1.running_mean": torch.from_numpy(np.full(64, 0.1, np.float32)),
    }
    tree, report = translate_reference_checkpoint(sd, {"rcnn": {"backbone": p_s2d}})
    bb = tree["rcnn"]["backbone"]
    assert "stem" not in bb and "stem_s2d" in bb
    np.testing.assert_allclose(
        bb["stem_s2d"]["kernel"],
        fold_stem_to_s2d(w.transpose(2, 3, 1, 0)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(bb["stem_bn"]["scale"], 1.5)
    np.testing.assert_allclose(bb["stem_bn"]["mean"], 0.1)


def test_translate_gpt2_tower_via_hf(rng):
    """HF GPT2Model -> translate_lm_tower -> hidden-state parity (the
    reference's distilgpt2 tower loads from_pretrained,
    narr_pooling_layers.py:270-276)."""
    import transformers

    from transfusion_tpu.models.lm_encoders import GPT2Config, GPT2Encoder
    from transfusion_tpu.tools.translate_checkpoint import translate_lm_tower

    hf = transformers.GPT2Model(
        transformers.GPT2Config(
            vocab_size=130, n_positions=24, n_embd=32, n_layer=2, n_head=4,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
    ).eval()
    cfg = GPT2Config(vocab_size=130, hidden_size=32, num_layers=2, num_heads=4,
                     max_positions=24, dropout=0.0)
    enc = GPT2Encoder(cfg)
    ids = rng.integers(0, 130, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[1, 8:] = 0
    params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))["params"]

    new_params, report = translate_lm_tower(hf.state_dict(), params, "gpt2")
    assert not report["unmatched_source"], report["unmatched_source"][:5]
    assert not report["missing_target"] and not report["shape_mismatch"]

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": jax.tree.map(jnp.asarray, new_params)},
                               jnp.asarray(ids), jnp.asarray(mask)))
    for b in range(2):
        n = mask[b].sum()
        np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=1e-4, atol=1e-4)


def test_translate_t5_tower_via_hf(rng):
    """HF T5EncoderModel (plain relu, the t5-wikihow geometry) and the gated
    flan variant both translate with full coverage and hidden-state parity."""
    import transformers

    from transfusion_tpu.models.lm_encoders import T5Config, T5Encoder
    from transfusion_tpu.tools.translate_checkpoint import translate_lm_tower

    for proj, gated in (("relu", False), ("gated-gelu", True)):
        hf = transformers.T5EncoderModel(
            transformers.T5Config(
                vocab_size=110, d_model=24, d_kv=6, d_ff=40, num_layers=2,
                num_heads=4, dropout_rate=0.0, feed_forward_proj=proj,
            )
        ).eval()
        cfg = T5Config(vocab_size=110, hidden_size=24, num_layers=2, num_heads=4,
                       head_dim=6, ff_dim=40, gated_ff=gated, dropout=0.0)
        enc = T5Encoder(cfg)
        ids = rng.integers(0, 110, (2, 9)).astype(np.int32)
        mask = np.ones((2, 9), np.int32)
        mask[0, 5:] = 0
        params = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))["params"]

        new_params, report = translate_lm_tower(hf.state_dict(), params, "t5")
        assert not report["unmatched_source"], report["unmatched_source"][:5]
        assert not report["missing_target"] and not report["shape_mismatch"]

        with torch.no_grad():
            ref = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        got = np.asarray(enc.apply({"params": jax.tree.map(jnp.asarray, new_params)},
                                   jnp.asarray(ids), jnp.asarray(mask)))
        for b in range(2):
            n = mask[b].sum()
            np.testing.assert_allclose(got[b, :n], ref[b, :n], rtol=1e-3, atol=1e-4)


def test_full_checkpoint_routes_gpt2_tower_keys():
    """A lightning checkpoint carrying the GPT-2 tower at
    narr_pooling_layer.encoder.transformer.* lands in narr_encoder/encoder."""
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.lm_encoders import GPT2Config
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=7, num_verbs=5, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_test=32, post_nms_top_n_test=16),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=24, num_heads=2),
        text_encoder="gpt2",
        gpt2=GPT2Config(vocab_size=90, hidden_size=16, num_layers=1, num_heads=2,
                        max_positions=16),
        out_mlp=24,
    )
    model = TransFusion(cfg)
    batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "image_hw": (64, 64),
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.key(0)}, batch, False)["params"]

    rng = np.random.default_rng(0)
    t = lambda *s: torch.from_numpy(rng.normal(0, 0.02, s).astype(np.float32))
    emb = t(90, 16)
    sd = {
        "model.narr_pooling_layer.encoder.transformer.wte.weight": emb,
        "model.narr_pooling_layer.encoder.transformer.h.0.attn.c_attn.weight": t(16, 48),
        "model.narr_pooling_layer.encoder.transformer.h.0.ln_1.weight": t(16),
        "model.narr_pooling_layer.encoder.transformer.h.0.attn.bias": t(1, 1, 16, 16),
        "model.narr_pooling_layer.out_mlp.weight": t(24, 16),
    }
    new_params, report = translate_reference_checkpoint(sd, params, fpn_features=(3,),
                                                        patch_hw=((1, 1),))
    assert not report["unmatched_source"], report["unmatched_source"]
    assert not report["missing_target"] and not report["shape_mismatch"]
    np.testing.assert_allclose(
        np.asarray(new_params["narr_encoder"]["encoder"]["wte"]["embedding"]), emb.numpy()
    )
