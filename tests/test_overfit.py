"""End-to-end learning proof: the ASSEMBLED system (real EgoNaoTrainer,
real datasets/loader/criterion/optimizer/metric) overfits a tiny learnable
synthetic dataset — train loss collapses and STA mAP on the training images
goes from ~0 at init to a strong value.

This is the one check the per-op parity suite cannot make: a sign flip in one
head's update direction, a wrong LR-group scale, or a target-assignment
off-by-one that keeps losses finite would pass every unit test but fail here.
Reference match: the training hot loop runner/nao/ego_nao_trainer.py:259-398.
"""

import os

import numpy as np
import pytest

from tests.fixtures import make_synthetic_ego4d

RUN_CFG = """
experiment: overfit
debug: False
no_workers: 2
no_threads: 2

model: "${CODE}/mini_model.yml"
pretrained: null
finetune: True

split:
  subset: 0
  version: 42
  type: group_stratified
  strat_col: null
  egtea_test: False
  all_samples_as_train: False
  all_samples_as_val: False

aug:
  resize_spec:
    - [64]
    - [64]
  channel_order: RGB
  crop_spec: [1, 1]
  brightness: 0.
  contrast: 0.
  saturation: 0.
  hue: 0.
  flip: False

dataset:
  name: ego4djpg
  subsample: null
  args:
    offset_s: .4
    label_merging: null
    label_cutoff:
      verb: 0
      noun: 0
      drop: False
      dampen_noun: 1.0
      dampen_verb: 1.0
    nao_version: 1
    coarse: False
    take_double: False
    use_external_label_mapping: False
    narr_structure: "{external_0}; {external_1}"
    narr_external_paths:
      - ${DATA}/Ego4d/v1/object_lang.json
      - ${DATA}/Ego4d/v1/action_lang.json
    narr_context_length: -1

run:
  normalization: ego4d_baseline
  replace_heads: False
  freeze_backbone_at_epoch: -1

  narration_embeds:
    use: True
    slowfast_f: False
    w_leak: False
    args:
      strategy: current
      pooling: max
      empty_prompt: null
      end_prompt: null
      final_concat: null
      finetune: False
      lang_dropout: 0.0
      size: 64
      out_mlp: 64
      out_tanh: False
      out_dropout: 0.0
      normalize: True
      train_ep: 0
      finetune_layers: 2
      model_v: "minilm-tiny"

  narr_fusion:
    config: ${CODE}/mini_fusion.yml
    fpn_features: [2, 3]
    replace_fpn_features: True

  hand_args:
    use: False

  seed: 7
  epochs: 1
  val_every: 1.0
  save_every: 1.0
  run_test: 0
  precision: 32
  accumulate_grad_batches: 1
  train_bs: 8
  val_bs: 8
  ckpt: null
  grad_clip: 4

  class_dropout: 0.0
  ttc_dropout: 0.0
  verb_bg: True
  ttc_bg: False
  ttc_bg_val: False

  bg_weight: 1.0
  all_class_w: False
  criterion:
    bbox: 1
    obj_prop: 1
    noun: 1
    verb: 1
    agg: mean

  tune_lr: False
  optimizer:
    name: radam
    lr: 1.e-3
    momentum: 0.9
    weight_decay: 0.
    sep_encoders:
      div_rate: 4

  scheduler:
    use: False
"""

# Backbone trains from epoch 0 with every stage unfrozen: the overfit must
# exercise the full tape, not just the heads. Trainable BatchNorm
# (replace_frozen_bn) — training from RANDOM init with FrozenBN leaves the
# trunk unnormalized (identity affine), activations explode (RPN logits
# ±270, deltas ±95 measured), and the L1-family losses then converge at
# ~lr/step; the reference only ever trains FrozenBN from PRETRAINED stats.
MODEL_CFG = """
type: res50
stage_sizes: [1, 1, 1, 1]
trainable_layers: 5
train_ep: 0
box_1_dropout: 0.
box_2_dropout: 0.
representation_size: 64
load_path: null
load_only_backbone: False
load_fpn_rpn: True
adapt_to_detectron: True
additional_postprocessing: True
batch_norm:
  use: True
  momentum: 0.1

fpn_return_layers: [1, 2, 3, 4]

verb_classifier:
  type: False
  representation_size: 512

rcnn_kwargs:
  box_score_thresh: 0.01
  rpn_score_thresh: 0.01
  rpn_batch_size_per_image: 16
  box_batch_size_per_image: 16

ttc_hand_head:
  use: False
"""

FUSION_CFG = """
model: cross_f
type: cross_transformer
share_encoders: False
narr_out_mode: tokens
patch_h: [4, 4, 2, 1]
patch_w: [4, 4, 2, 1]
backproj_dropout: 0.0
backproj_activ_f: null
patch_norm:
  visual: null
  language: null
pos_embedding: sin1d
forward_language_f: False
vis_mask_type: global

args:
  patch_dropout: 0.0
  num_layers: [1, 1, 1, 1]
  num_heads: 4
  fforward_multiplier: 2
  token_dropout: 0.0
  back_to_img_fn: regroup
  activ_f: gelu
  final_norm: ln

lm_args:
  pooling:
    type: mean
    ln: True
    repr_size: 0
  multi: False
  use_lm_f: True
"""

EPOCHS = 60  # train_bs 8 on 8 samples -> one full-batch step per epoch


@pytest.mark.slow
def test_assembled_system_overfits_learnable_synthetic(tmp_path, monkeypatch):
    code = tmp_path / "code"
    data = tmp_path / "data"
    code.mkdir()
    make_synthetic_ego4d(
        os.path.join(str(data), "Ego4d", "v1"),
        n_train=8, n_val=4, n_test=2, fh=216, fw=288, learnable=True,
    )
    (code / "mini_model.yml").write_text(MODEL_CFG)
    (code / "mini_fusion.yml").write_text(FUSION_CFG)
    (code / "run_cfg.yml").write_text(RUN_CFG)
    monkeypatch.setenv("CODE", str(code))
    monkeypatch.setenv("DATA", str(data))

    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.runner.trainer import EgoNaoTrainer

    config = derive_config(load_config(str(code / "run_cfg.yml")))
    trainer = EgoNaoTrainer(config, run_dir=str(tmp_path / "run"))

    # Epoch-0 sanity: random init scores (near) nothing on the train images.
    ep0 = trainer.evaluate(0, dataset=trainer.train_ds, source="trainset", export=False)
    map_init = ep0.metrics["map_box_noun_trainset"]

    # Snapshot params to verify the LR groups / unfreeze triggers bite.
    import jax

    trainer.ensure_state()
    p_init = jax.tree.map(np.asarray, trainer.state.params)

    losses = []
    for epoch in range(EPOCHS):
        m = trainer.train_epoch(epoch)
        losses.append(m["train_loss"])

    final = trainer.evaluate(EPOCHS, dataset=trainer.train_ds, source="trainset", export=False)
    map_final = final.metrics["map_box_noun_trainset"]

    print(f"overfit: loss {losses[0]:.3f} -> {losses[-1]:.3f}, "
          f"map_box_noun {map_init:.2f} -> {map_final:.2f}")

    # (a) the train loss falls by a large factor;
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    # (b) STA box+noun mAP on the training images goes from ~0 to strong.
    assert map_init < 10.0, map_init
    assert map_final >= 50.0, map_final

    # The epoch triggers moved BOTH the encoder groups: the backbone
    # (train_ep 0, trainable_layers 5) and the narration tower (train_ep 0).
    p_end = jax.tree.map(np.asarray, trainer.state.params)

    def moved(tree_a, tree_b, key):
        sub_a, sub_b = tree_a, tree_b
        for k in key.split("/"):
            sub_a, sub_b = sub_a[k], sub_b[k]
        leaves_a = jax.tree.leaves(sub_a)
        leaves_b = jax.tree.leaves(sub_b)
        return any(not np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))

    assert moved(p_init, p_end, "rcnn/backbone")
    assert moved(p_init, p_end, "narr_encoder")
    assert moved(p_init, p_end, "rcnn/predictors")


def test_lr_group_scaling_is_exact():
    """sep_encoders div_rate scales the encoder group's update by exactly
    1/div_rate relative to main (the reference's per-group LRs,
    ego_nao_trainer.py:440-497; expressed as update scaling in
    train/optim.scale_by_label — numerically identical for lr-linear rules)."""
    import jax.numpy as jnp

    from transfusion_tpu.train.optim import make_optimizer

    params = {
        "narr_encoder": {"w": jnp.ones((4, 4))},
        "rcnn": {"predictors": {"w": jnp.ones((4, 4))}},
    }
    tx, _ = make_optimizer(
        {"name": "radam", "lr": 1e-3, "sep_encoders": {"div_rate": 4}}, None, 10
    )
    state = tx.init(params)
    g = {
        "narr_encoder": {"w": jnp.full((4, 4), 0.5)},
        "rcnn": {"predictors": {"w": jnp.full((4, 4), 0.5)}},
    }
    for _ in range(3):
        updates, state = tx.update(g, state, params)
    enc = np.asarray(updates["narr_encoder"]["w"])
    main = np.asarray(updates["rcnn"]["predictors"]["w"])
    np.testing.assert_allclose(enc, main / 4.0, rtol=1e-6)
