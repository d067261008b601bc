"""End-to-end CLI integration: reference-schema configs + synthetic data ->
one training epoch with validation, JSON export, checkpoint, resume-eval."""

import json
import os

import numpy as np
import pytest

from tests.fixtures import make_synthetic_ego4d

RUN_CFG = """
experiment: egonao
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
    - [80]
  channel_order: BGR
  crop_spec: [.9, .9]
  brightness: 0.15
  contrast: 0.1
  saturation: 0.
  hue: 0.05
  flip: True

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
      dampen_noun: 0.2
      dampen_verb: 1.5
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
      lang_dropout: 0.1
      size: 64
      out_mlp: 64
      out_tanh: False
      out_dropout: 0.1
      normalize: True
      train_ep: 0
      model_v: "minilm-tiny"

  narr_fusion:
    config: ${CODE}/mini_fusion.yml
    fpn_features: [2, 3]
    replace_fpn_features: True

  hand_args:
    use: False

  flow_args:
    use: False
    norm: True
    clip: 0
    as_jpg: True

  seed: 42
  epochs: 1
  val_every: 1.0
  save_every: 1.0
  run_test: 0
  precision: 32
  accumulate_grad_batches: 1
  train_bs: 4
  val_bs: 4
  ckpt: null
  grad_clip: 4
  devices:
    devices: [0]
    acc: tpu

  class_dropout: 0.0
  ttc_dropout: 0.5
  verb_bg: True
  ttc_bg: False
  ttc_bg_val: False

  bg_weight: 0.8
  all_class_w: False
  criterion:
    bbox: 1
    obj_prop: 1
    noun: 1
    verb: 1
    ttc: 1
    lm: 1
    agg: mean
    ttc_beta: 2
    lm_decay: 0.8

  tune_lr: False
  optimizer:
    name: radam
    lr: 2.e-4
    momentum: 0.9
    weight_decay: 1.e-4
    sep_encoders:
      div_rate: 4
      ttc_rate: 10

  scheduler:
    use: True
    name: multistep
    after_warmup: multistep
    milestones: [5, 7]
    gamma: 0.33
    total_epoch: 4
    multiplier: 3
"""

MODEL_CFG = """
type: res50
stage_sizes: [1, 1, 1, 1]
trainable_layers: 2
train_ep: -1
box_1_dropout: 0.
box_2_dropout: 0.
representation_size: 64
load_path: null
load_only_backbone: False
load_fpn_rpn: True
adapt_to_detectron: True
additional_postprocessing: True
batch_norm:
  use: False
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
backproj_dropout: 0.1
backproj_activ_f: null
patch_norm:
  visual: null
  language: null
pos_embedding: sin1d
forward_language_f: False
vis_mask_type: global

args:
  patch_dropout: 0.1
  num_layers: [1, 1, 1, 1]
  num_heads: 4
  fforward_multiplier: 2
  token_dropout: 0.15
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


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    code = tmp_path_factory.mktemp("code")
    data = tmp_path_factory.mktemp("data")
    runs = tmp_path_factory.mktemp("runs")
    fixture_root = os.path.join(str(data), "Ego4d", "v1")
    make_synthetic_ego4d(fixture_root, n_train=8, n_val=4, n_test=2, fh=216, fw=288)
    (code / "mini_model.yml").write_text(MODEL_CFG)
    (code / "mini_fusion.yml").write_text(FUSION_CFG)
    cfg_path = code / "run_cfg.yml"
    cfg_path.write_text(RUN_CFG)
    return {"CODE": str(code), "DATA": str(data), "RUNS": str(runs), "config": str(cfg_path)}


DRIVER = """
import sys
from transfusion_tpu.runner import run_experiment

config, run_dir = sys.argv[1], sys.argv[2]
run_experiment.main(["--config", config, "--run-dir", run_dir, "--epochs", "1"])
# Resume-eval from the checkpoint in the same process (shares the jit cache;
# a second cold process would recompile everything for minutes on this box).
run_experiment.main([
    "--config", config, "--run-dir", run_dir + "_eval", "--run-val",
    "--resume-from", run_dir + "/checkpoints/epoch_0000",
    # --devices: restrict to the first 4 of the 8 virtual devices (the
    # reference's --gpu analog); --skip-ssl-verification: accepted + applied
    # (reference run_experiment.py:283,307-310).
    "--devices", "4", "--skip-ssl-verification",
])
"""


def _run_cli_driver(cli_env, run_dir):
    """Drive the real CLI in a fresh process (isolates XLA state — in-process
    invocation after dozens of prior compiled programs can abort the CPU
    runtime — and exercises the true user surface)."""
    import subprocess
    import sys

    # The driver subprocess gets the script's dir on sys.path, not pytest's
    # rootdir — put the repo root on PYTHONPATH so `transfusion_tpu` imports
    # whether or not the package is pip-installed in the environment.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        CODE=cli_env["CODE"],
        DATA=cli_env["DATA"],
        RUNS=cli_env["RUNS"],
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    driver = os.path.join(cli_env["CODE"], "cli_driver.py")
    with open(driver, "w") as fp:
        fp.write(DRIVER)
    proc = subprocess.run(
        [sys.executable, driver, cli_env["config"], run_dir],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]


@pytest.mark.slow
def test_cli_train_val_export_resume(cli_env):
    run_dir = os.path.join(cli_env["RUNS"], "itest")
    _run_cli_driver(cli_env, run_dir)

    # History recorded with train losses + val STA metrics.
    history = [json.loads(l) for l in open(os.path.join(run_dir, "history.jsonl"))]
    assert len(history) == 1
    rec = history[0]
    assert np.isfinite(rec["train_loss"])
    assert "map_box_noun_verb_val" in rec
    assert 0.0 <= rec["map_box_noun_verb_val"] <= 100.0

    # Challenge JSON exported with entries for every val uid.
    results_dir = os.path.join(run_dir, "results")
    files = os.listdir(results_dir)
    assert any("val_epoch0" in f for f in files)
    payload = json.load(open(os.path.join(results_dir, files[0])))
    assert payload["challenge"].startswith("ego4d_short_term")
    assert len(payload["results"]) == 4
    for entries in payload["results"].values():
        for e in entries:
            assert set(e) == {"box", "noun_category_id", "verb_category_id", "time_to_contact", "score"}

    # Checkpoint written; resume-eval (run inside the same driver) exported.
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "epoch_0000"))
    eval_results = os.listdir(os.path.join(run_dir + "_eval", "results"))
    assert any("val_epoch0" in f for f in eval_results)
