"""Loss parity vs torch, schedule math, and the 8-device mesh train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from transfusion_tpu.models.roi_heads import IGNORE_VERB_IDX_BG
from transfusion_tpu.train import losses as L
from transfusion_tpu.train.optim import make_epoch_schedule, make_optimizer, param_group_label


def test_smooth_l1_matches_torch(rng):
    x = rng.normal(0, 1, (40,)).astype(np.float32)
    for beta in (1 / 9, 1.0, 2.0):
        ours = np.asarray(L.smooth_l1(jnp.asarray(x), beta))
        ref = F.smooth_l1_loss(
            torch.from_numpy(x), torch.zeros(40), beta=beta, reduction="none"
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_box_loss_matches_reference_formula(rng):
    b, s, c = 2, 16, 6
    box_reg = rng.normal(0, 1, (b, s, 4 * c)).astype(np.float32)
    labels = rng.integers(0, c, (b, s))
    labels[0, :3] = -1  # padding
    reg_t = rng.normal(0, 1, (b, s, 4)).astype(np.float32)

    ours = float(L.box_loss(jnp.asarray(box_reg), jnp.asarray(labels), jnp.asarray(reg_t)))

    # Reference math (losses.py:98-135) over the valid rows.
    total = 0.0
    count = 0
    for i in range(b):
        for j in range(s):
            lab = labels[i, j]
            if lab < 0:
                continue
            count += 1
            if lab > 0:
                d = box_reg[i, j].reshape(c, 4)[lab] - reg_t[i, j]
                total += F.smooth_l1_loss(
                    torch.from_numpy(d), torch.zeros(4), beta=1 / 9, reduction="sum"
                ).item()
    np.testing.assert_allclose(ours, total / max(count, 1), rtol=1e-4)


def test_weighted_ce_matches_torch(rng):
    logits = rng.normal(0, 1, (30, 7)).astype(np.float32)
    targets = rng.integers(0, 7, (30,))
    weights = rng.uniform(0.5, 2.0, 7).astype(np.float32)
    ours = float(
        L.weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights), jnp.ones(30, bool)
        )
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets), weight=torch.from_numpy(weights)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_verb_loss_bg_remap(rng):
    v = 5
    logits = rng.normal(0, 1, (10, v)).astype(np.float32)
    labels = np.array([1, 2, IGNORE_VERB_IDX_BG, 3, IGNORE_VERB_IDX_BG, 0, 1, -1, -1, 2])
    w = np.ones(v, np.float32)

    ours_bg = float(L.verb_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w), True))
    remapped = np.where(labels == IGNORE_VERB_IDX_BG, v - 1, labels)
    valid = labels >= 0
    ref_bg = F.cross_entropy(
        torch.from_numpy(logits[valid]), torch.from_numpy(remapped[valid])
    ).item()
    np.testing.assert_allclose(ours_bg, ref_bg, rtol=1e-5)

    ours_nobg = float(L.verb_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w), False))
    keep = valid & (labels != IGNORE_VERB_IDX_BG)
    ref_nobg = F.cross_entropy(torch.from_numpy(logits[keep]), torch.from_numpy(labels[keep])).item()
    np.testing.assert_allclose(ours_nobg, ref_nobg, rtol=1e-5)


def test_ttc_loss_row_selection(rng):
    preds = rng.uniform(0.1, 3, 8).astype(np.float32)
    targets = rng.uniform(0.1, 3, 8).astype(np.float32)
    verbs = np.array([1, IGNORE_VERB_IDX_BG, 2, -1, 3, IGNORE_VERB_IDX_BG, 0, 1])
    ours = float(L.ttc_loss(jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(verbs), beta=2.0))
    keep = (verbs >= 0) & (verbs != IGNORE_VERB_IDX_BG)
    ref = F.smooth_l1_loss(
        torch.from_numpy(preds[keep]), torch.from_numpy(targets[keep]), beta=2.0
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_class_weight_building():
    n, v = np.arange(1, 6, dtype=np.float64), np.arange(1, 4, dtype=np.float64)
    # v2 style: bg_weight 0.8, verb_bg True, all_class_w False.
    nw, vw = L.build_class_weights(n, v, 0.8, True, False)
    assert nw.shape == (5,) and vw.shape == (4,)
    assert float(nw[0]) == pytest.approx(0.8) and float(vw[-1]) == pytest.approx(0.8)
    assert np.all(np.asarray(nw[1:]) == 1.0)
    # bg_weight == 1: bg slots get the mean.
    nw2, vw2 = L.build_class_weights(n, v, 1.0, True, True)
    assert float(nw2[0]) == pytest.approx(np.asarray(nw2).mean(), rel=0.5)
    assert vw2.shape == (4,)


def test_warmup_multistep_schedule():
    cfg = {"use": True, "name": "warmup", "after_warmup": "multistep",
           "milestones": [5, 7], "gamma": 0.33, "total_epoch": 4, "multiplier": 3}
    sch = make_epoch_schedule(cfg, 2e-4, steps_per_epoch=10)
    lr = lambda e: float(sch(e * 10))
    assert lr(0) == pytest.approx(2e-4)
    assert lr(2) == pytest.approx(2e-4 * (2 * 2 / 4 + 1))
    assert lr(4) == pytest.approx(6e-4)  # multiplier reached
    assert lr(4 + 5) == pytest.approx(6e-4 * 0.33)  # first milestone (post-warmup epochs)
    assert lr(4 + 7) == pytest.approx(6e-4 * 0.33**2)


def test_param_group_labels():
    class K:
        def __init__(self, key):
            self.key = key

    assert param_group_label((K("rcnn"), K("backbone"), K("layer1_0"))) == "encoder"
    assert param_group_label((K("narr_encoder"), K("bert"))) == "encoder"
    assert param_group_label((K("rcnn"), K("predictors"), K("ttc_pred_layer"))) == "ttc"
    assert param_group_label((K("rcnn"), K("predictors"), K("noun_classifier"))) == "main"


def test_train_step_on_mesh():
    """End-to-end: tiny TransFusion, 8-device mesh, 2 steps, loss finite and
    params actually update; batch sharded over the data axis."""
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig
    from transfusion_tpu.parallel.mesh import make_mesh, param_shardings, replicated, shard_batch
    from transfusion_tpu.train.step import LossConfig, TrainState, init_state, make_train_step

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4, ttc_on=True),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
        lm_on=True,
    )
    model = TransFusion(cfg)
    rng = np.random.default_rng(0)
    bsz = 8
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (bsz, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, (bsz, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((bsz, 8), jnp.int32),
        "targets": {
            "boxes": jnp.asarray(np.tile([[10, 10, 40, 40]], (bsz, 1, 1)).astype(np.float32)),
            "nouns": jnp.full((bsz, 1), 2),
            "verbs": jnp.full((bsz, 1), 1),
            "ttcs": jnp.full((bsz, 1), 0.8, jnp.float32),
            "valid": jnp.ones((bsz, 1), bool),
        },
    }

    import optax

    tx, _ = make_optimizer({"name": "radam", "lr": 1e-3, "weight_decay": 1e-4,
                            "sep_encoders": {"div_rate": 4, "ttc_rate": 10}},
                           {"use": True, "name": "multistep", "milestones": [5], "gamma": 0.5},
                           steps_per_epoch=10, grad_clip=4.0, accumulate=1)
    state = init_state(model, tx, dict(batch, image_hw=(64, 64)), jax.random.key(0))

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sharded = shard_batch(mesh, batch)
        rep = replicated(mesh)
        state = jax.device_put(state, rep)
        loss_cfg = LossConfig(ttc_on=True, lm_on=True, ttc_beta=2.0,
                              rpn_batch_size_per_image=16, last_noun_idx=5)
        noun_w = jnp.ones(6)
        verb_w = jnp.ones(4)
        step = make_train_step(model, tx, loss_cfg, noun_w, verb_w, donate=False)
        loss_w = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 0.5])

        p0 = jax.tree.leaves(state.params)[0].copy()
        metrics_hist = []
        for i in range(2):
            state, metrics = step(state, sharded, jax.random.key(7), loss_w, (64, 64))
            metrics_hist.append({k: float(v) for k, v in metrics.items()})

    assert np.isfinite(metrics_hist[0]["loss"])
    assert np.isfinite(metrics_hist[1]["loss"])
    for k in ("bbox_loss", "noun_loss", "verb_loss", "ttc_loss", "lm_loss"):
        assert np.isfinite(metrics_hist[0][k]), k
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert int(state.step) == 2
    # Batch really sharded over 8 devices.
    assert len(sharded["image"].sharding.device_set) == 8


def test_criterion_weights_formula():
    """6-slot criterion vector honors obj_prop / obj_prop_rate / lm_decay
    (abc_nao_trainer.py:57-69,160-165)."""
    from transfusion_tpu.train.step import criterion_weights

    crit = {"bbox": 2.0, "obj_prop": 0.5, "noun": 1.0, "verb": 3.0, "ttc": 0.0,
            "lm": 1.0, "lm_decay": 0.5, "obj_prop_rate": 0.9}
    w0 = criterion_weights(crit, epoch=0)
    np.testing.assert_allclose(w0, [2.0, 1.0, 1.0, 3.0, 0.0, 1.0])
    w2 = criterion_weights(crit, epoch=2)
    np.testing.assert_allclose(w2, [2.0, 1.0 * 0.9**2, 1.0, 3.0, 0.0, 0.25])
    # Shipped-config semantics: obj_prop acts as an on/off gate at the bbox
    # weight (ego_nao_trainer.py:296-304), no decay.
    shipped = {"bbox": 1, "obj_prop": 1, "noun": 1, "verb": 1, "ttc": 1, "lm": 0}
    np.testing.assert_allclose(criterion_weights(shipped, 7), [1, 1, 1, 1, 1, 0])


def _tiny_transfusion():
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
    )
    return TransFusion(cfg)


def test_freeze_masks_grads_and_nan_guard():
    """Frozen subtrees keep exactly-zero RAdam moments through the frozen
    phase (reference: requires_grad=False, ego_nao_trainer.py:265-272), and a
    non-finite batch is skipped wholesale (params + opt state unchanged)."""
    from transfusion_tpu.train.step import LossConfig, init_state, make_train_step

    model = _tiny_transfusion()
    rng = np.random.default_rng(1)
    bsz = 2
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (bsz, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, (bsz, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((bsz, 8), jnp.int32),
        "targets": {
            "boxes": jnp.asarray(np.tile([[10, 10, 40, 40]], (bsz, 1, 1)).astype(np.float32)),
            "nouns": jnp.full((bsz, 1), 2),
            "verbs": jnp.full((bsz, 1), 1),
            "ttcs": jnp.full((bsz, 1), 0.8, jnp.float32),
            "valid": jnp.ones((bsz, 1), bool),
        },
    }
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-3, "weight_decay": 1e-4},
                           None, steps_per_epoch=10)
    state = init_state(model, tx, dict(batch, image_hw=(64, 64)), jax.random.key(0))
    loss_cfg = LossConfig(rpn_batch_size_per_image=16, last_noun_idx=5)
    step = make_train_step(model, tx, loss_cfg, jnp.ones(6), jnp.ones(4), donate=False)
    loss_w = jnp.asarray([1.0, 1, 1, 1, 0, 0])

    def is_frozen_path(path):
        return "backbone" in "/".join(str(getattr(p, "key", p)) for p in path)

    mult = jax.tree_util.tree_map_with_path(
        lambda p, _: 0.0 if is_frozen_path(p) else 1.0, state.params
    )
    frozen_p0 = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
        if is_frozen_path(path)
    }

    for i in range(2):
        state, metrics = step(state, batch, jax.random.key(3 + i), loss_w, (64, 64), mult)
    assert float(metrics["nonfinite_skipped"]) == 0.0

    # Frozen params unchanged and their moments exactly zero; at least one
    # unfrozen moment is non-zero.
    moments = jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
    saw_frozen = saw_live = False
    for path, leaf in moments:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if ".mu" not in joined and ".nu" not in joined and "mu/" not in joined \
                and not any(str(getattr(p, "key", p)) in ("mu", "nu") for p in path):
            continue
        if "backbone" in joined:
            assert np.all(np.asarray(leaf) == 0.0), joined
            saw_frozen = True
        elif np.any(np.asarray(leaf) != 0.0):
            saw_live = True
    assert saw_frozen and saw_live
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        joined = "/".join(str(getattr(p, "key", p)) for p in path)
        if is_frozen_path(path):
            np.testing.assert_array_equal(np.asarray(leaf), frozen_p0[joined])

    # NaN guard: a poisoned batch leaves params and opt state untouched.
    before = jax.tree.map(np.asarray, (state.params, state.opt_state))
    bad = dict(batch, image=batch["image"].at[0, 0, 0, 0].set(jnp.nan))
    state, metrics = step(state, bad, jax.random.key(9), loss_w, (64, 64), mult)
    assert float(metrics["nonfinite_skipped"]) == 1.0
    after = jax.tree.map(np.asarray, (state.params, state.opt_state))
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    assert int(state.step) == 3


def test_trainable_bn_swap_updates_stats(rng):
    """model.batch_norm.use (replace_frozen_bn, obj_detection/utils.py:3-57):
    the backbone runs live BatchNorm — batch_stats exist, update during a
    train step, and stay fixed in eval."""
    from transfusion_tpu.models.detector import DetectorConfig
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig
    from transfusion_tpu.models.text_encoder import BertConfig
    from transfusion_tpu.models.transfusion import FusionConfig, TransFusion, TransFusionConfig
    from transfusion_tpu.train.step import LossConfig, init_state, make_train_step

    cfg = TransFusionConfig(
        detector=DetectorConfig(
            roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                          batch_size_per_image=8, detections_per_img=4),
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32),
            trainable_bn=True, bn_momentum=0.1,
        ),
        fusion=FusionConfig(fpn_features=(3,), patch_h=(1,), patch_w=(1,),
                            num_layers=(1,), token_dim=16, num_heads=2),
        bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
                        intermediate_size=32, max_position_embeddings=16),
        out_mlp=16,
    )
    model = TransFusion(cfg)
    bsz = 2
    batch = {
        "image": jnp.asarray(rng.normal(0.5, 1.5, (bsz, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, (bsz, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((bsz, 8), jnp.int32),
        "targets": {
            "boxes": jnp.asarray(np.tile([[10, 10, 40, 40]], (bsz, 1, 1)).astype(np.float32)),
            "nouns": jnp.full((bsz, 1), 2),
            "verbs": jnp.full((bsz, 1), 1),
            "ttcs": jnp.full((bsz, 1), 0.8, jnp.float32),
            "valid": jnp.ones((bsz, 1), bool),
        },
    }
    tx, _ = make_optimizer({"name": "radam", "lr": 1e-3}, None, 10)
    state = init_state(model, tx, dict(batch, image_hw=(64, 64)), jax.random.key(0))
    assert state.batch_stats is not None
    bs0 = jax.tree.map(np.asarray, state.batch_stats)
    means0 = [l for l in jax.tree.leaves(bs0)]
    assert means0  # stats actually exist

    step = make_train_step(model, tx, LossConfig(rpn_batch_size_per_image=16, last_noun_idx=5),
                           jnp.ones(6), jnp.ones(4), donate=False)
    state, metrics = step(state, batch, jax.random.key(1), jnp.ones(6), (64, 64))
    assert np.isfinite(float(metrics["loss"]))
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(jax.tree.map(np.asarray, state.batch_stats)))
    )
    assert changed, "batch stats did not update during training"

    # Eval path consumes running stats without mutation.
    from transfusion_tpu.train.step import make_eval_step

    ev = make_eval_step(model, cfg.detector)
    dets = ev(state.params, {k: v for k, v in batch.items() if k != "targets"}, (64, 64),
              state.batch_stats)
    assert np.asarray(dets["boxes"]).shape[0] == bsz


def test_stop_grad_stages_equivalence():
    """The frozen-prefix tape cut (DetectorConfig.stop_grad_stages,
    ego_vis_det_ego4dv2.yml:2-3 trainable_layers 2 / train_ep -1) zeroes
    exactly the backbone grads and leaves every other grad bit-identical —
    i.e. it is the masked-grad freeze with the wasted backward deleted."""
    from dataclasses import replace

    from transfusion_tpu.train.step import LossConfig, init_state, make_train_step

    base = _tiny_transfusion()
    cut = type(base)(replace(base.cfg, detector=replace(base.cfg.detector, stop_grad_stages=5)))

    rng = np.random.default_rng(3)
    bsz = 2
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (bsz, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, (bsz, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((bsz, 8), jnp.int32),
        "targets": {
            "boxes": jnp.asarray(np.tile([[10, 10, 40, 40]], (bsz, 1, 1)).astype(np.float32)),
            "nouns": jnp.full((bsz, 1), 2),
            "verbs": jnp.full((bsz, 1), 1),
            "ttcs": jnp.full((bsz, 1), 0.8, jnp.float32),
            "valid": jnp.ones((bsz, 1), bool),
        },
    }
    from transfusion_tpu.train.step import compute_losses

    loss_cfg = LossConfig(rpn_batch_size_per_image=16, last_noun_idx=5)
    params = base.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        dict(batch, image_hw=(64, 64)), True,
    )

    def grads_of(model):
        def loss_fn(p):
            out = model.apply(
                p, dict(batch, image_hw=(64, 64)), True,
                rngs={"dropout": jax.random.key(7), "sampling": jax.random.key(8)},
            )
            losses, _ = compute_losses(out, batch, jax.random.key(9), loss_cfg,
                                       jnp.ones(6), jnp.ones(4))
            return jnp.sum(losses * jnp.asarray([1.0, 1, 1, 1, 0, 0]))

        return jax.grad(loss_fn)(params)

    g0, g5 = grads_of(base), grads_of(cut)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat5 = {
        "/".join(str(getattr(q, "key", q)) for q in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(g5)[0]
    }
    saw_backbone = saw_other = False
    for path, leaf in flat0:
        name = "/".join(str(getattr(q, "key", q)) for q in path)
        other = np.asarray(flat5[name], np.float32)
        mine = np.asarray(leaf, np.float32)
        if "backbone" in name:
            assert np.all(other == 0.0), name
            saw_backbone = saw_backbone or np.any(mine != 0)
        else:
            np.testing.assert_allclose(mine, other, rtol=1e-5, atol=1e-6, err_msg=name)
            saw_other = saw_other or np.any(mine != 0)
    assert saw_backbone and saw_other


def test_grad_accumulation_multisteps():
    """accumulate_grad_batches k (the v2 flagship trains with accumulate 2,
    ego_vis_det_ego4dv2.yml run block): params move only every k micro-steps,
    and the applied update equals one step on the MEAN of the k grads
    (optax.MultiSteps semantics = torch Lightning accumulate_grad_batches)."""
    import optax

    from transfusion_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((4,)) * 0.5}
    g1 = {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0])}
    g2 = {"w": jnp.asarray([-1.0, 4.0, 0.5, -3.0])}

    tx_acc, _ = make_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.0},
                               None, steps_per_epoch=10, accumulate=2)
    st = tx_acc.init(params)
    up1, st = tx_acc.update(g1, st, params)
    mid = optax.apply_updates(params, up1)
    np.testing.assert_array_equal(np.asarray(mid["w"]), np.asarray(params["w"]))

    up2, st = tx_acc.update(g2, st, mid)
    out = optax.apply_updates(mid, up2)

    tx_ref, _ = make_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.0},
                               None, steps_per_epoch=10, accumulate=1)
    str_ = tx_ref.init(params)
    gm = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    upr, _ = tx_ref.update(gm, str_, params)
    ref = optax.apply_updates(params, upr)
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(ref["w"]), rtol=1e-6)
