"""Probe the overfit dynamics for tests/test_overfit.py threshold tuning."""
import os, sys, tempfile

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

from tests.fixtures import make_synthetic_ego4d
from tests import test_overfit as T

tmp = tempfile.mkdtemp()
code = os.path.join(tmp, "code"); os.makedirs(code)
data = os.path.join(tmp, "data")
make_synthetic_ego4d(os.path.join(data, "Ego4d", "v1"),
                     n_train=8, n_val=4, n_test=2, fh=216, fw=288, learnable=True)
open(os.path.join(code, "mini_model.yml"), "w").write(T.MODEL_CFG)
open(os.path.join(code, "mini_fusion.yml"), "w").write(T.FUSION_CFG)
run_cfg = T.RUN_CFG
lr = os.environ.get("PROBE_LR")
if lr:
    run_cfg = run_cfg.replace("lr: 1.e-3", f"lr: {lr}")
open(os.path.join(code, "run_cfg.yml"), "w").write(run_cfg)
os.environ["CODE"] = code
os.environ["DATA"] = data

from transfusion_tpu.config import derive_config, load_config
from transfusion_tpu.runner.trainer import EgoNaoTrainer

config = derive_config(load_config(os.path.join(code, "run_cfg.yml")))
trainer = EgoNaoTrainer(config, run_dir=os.path.join(tmp, "run"))

ep0 = trainer.evaluate(0, dataset=trainer.train_ds, source="t", export=False)
print("MAP init:", {k: round(v, 2) for k, v in ep0.metrics.items() if k.startswith("map")}, flush=True)

EPOCHS = int(os.environ.get("PROBE_EPOCHS", "150"))
for epoch in range(EPOCHS):
    m = trainer.train_epoch(epoch)
    if epoch % 5 == 0 or epoch == EPOCHS - 1:
        print(f"ep {epoch}: loss {m['train_loss']:.4f} bbox {m.get('train_bbox_loss', 0):.4f} "
              f"noun {m.get('train_noun_loss', 0):.4f} verb {m.get('train_verb_loss', 0):.4f} "
              f"obj {m.get('train_objectness_loss', 0):.4f}", flush=True)
    if epoch in (30, 60, 90, 120, EPOCHS - 1):
        r = trainer.evaluate(epoch, dataset=trainer.train_ds, source="t", export=False)
        print(f"  MAP@{epoch}:", {k: round(v, 2) for k, v in r.metrics.items() if k.startswith(("map", "ap"))}, flush=True)
