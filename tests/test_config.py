import os

import pytest

from tests.conftest import require_reference
from transfusion_tpu.config import derive_config, load_config
from transfusion_tpu.config.loader import expand_env


def test_expand_env():
    env = {"CODE": "/x/y", "DATA": "/d"}
    assert expand_env("${CODE}/runner", env) == "/x/y/runner"
    assert expand_env("$DATA/ego4d", env) == "/d/ego4d"
    assert expand_env("${MISSING}/z", env) == "/z"
    assert expand_env("no vars", env) == "no vars"


def test_load_simple_config(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("a: 1\nb: ${HOME}\nc:\n  - x\n  - ${HOME}/y\n")
    cfg = load_config(p)
    assert cfg["a"] == 1
    assert cfg["b"] == os.environ["HOME"]
    cfg.set("a", 2)
    assert cfg.yaml_config["a"] == 2


@pytest.mark.parametrize("name", ["ego_nao_res50_ego4d.yml", "ego_nao_res50_ego4dv2.yml"])
def test_reference_configs_load_unmodified(name, monkeypatch):
    """The public API accepts the existing reference YAMLs unmodified
    (BASELINE.md compatibility requirement)."""
    ref = require_reference()
    monkeypatch.setenv("CODE", ref)
    monkeypatch.setenv("DATA", "/tmp/data")
    monkeypatch.setenv("RUNS", "/tmp/runs")

    cfg = load_config(os.path.join(ref, "runner", "nao", "configs", name))
    cfg = derive_config(cfg)

    run = cfg["run"]
    # Derived fusion token dim: out_mlp overrides the raw LM size.
    expected_dim = 896 if "v2" in name else 712
    assert run["narr_fusion"]["args"]["input_f_size"] == expected_dim
    assert run["narration_embeds"]["args"]["size"] == 384
    assert run["narration_embeds"]["args"]["text_pooling"] == "sbert_finetune"
    # Fusion config merged in.
    assert run["narr_fusion"]["type"] == "cross_transformer"
    assert run["narr_fusion"]["patch_h"] == [4, 4, 2, 1]
    assert run["narr_fusion"]["args"]["num_layers"] == [4, 4, 4, 4]
    # Model tier resolved to a dict with detectron adaptation on.
    assert cfg["model"]["type"] == "res50"
    assert cfg["model"]["adapt_to_detectron"] is True
    assert cfg["model"]["rcnn_kwargs"]["box_batch_size_per_image"] == 128
    # Aug propagation.
    assert run["resize_spec"] == cfg["aug"]["resize_spec"]
    assert run["channel_order"] == "BGR"
    rep = 1280 if "v2" in name else 1024
    assert cfg["model"]["representation_size"] == rep
