"""Dig into the RPN internals of the assembled trainer after a short overfit."""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from tests.fixtures import make_synthetic_ego4d
from tests import test_overfit as T

tmp = tempfile.mkdtemp()
code = os.path.join(tmp, "code"); os.makedirs(code)
data = os.path.join(tmp, "data")
make_synthetic_ego4d(os.path.join(data, "Ego4d", "v1"),
                     n_train=8, n_val=4, n_test=2, fh=216, fw=288, learnable=True)
open(os.path.join(code, "mini_model.yml"), "w").write(T.MODEL_CFG)
open(os.path.join(code, "mini_fusion.yml"), "w").write(T.FUSION_CFG)
open(os.path.join(code, "run_cfg.yml"), "w").write(T.RUN_CFG)
os.environ["CODE"] = code
os.environ["DATA"] = data

from transfusion_tpu.config import derive_config, load_config
from transfusion_tpu.runner.trainer import EgoNaoTrainer

config = derive_config(load_config(os.path.join(code, "run_cfg.yml")))
trainer = EgoNaoTrainer(config, run_dir=os.path.join(tmp, "run"))

EP = int(os.environ.get("PROBE_EPOCHS", "40"))
for epoch in range(EP):
    m = trainer.train_epoch(epoch)
    if epoch % 10 == 0:
        print(f"ep {epoch}: loss {m['train_loss']:.3f} rpnbox {m.get('train_loss_rpn_box_reg', -1):.4f} "
              f"obj {m.get('train_objectness_loss', -1):.4f}", flush=True)

# --- dissect one train batch
from transfusion_tpu.data.loader import DataLoader
loader = DataLoader(trainer.train_ds, 8, tokenizer=trainer.tokenizer, training=False,
                    seed=7, lang_max_length=trainer.tokenizer.max_length)
batch = next(iter(loader))
loader.close()
db = trainer._device_batch(batch)
hw = tuple(batch["image_hw"]) if "image_hw" in batch else (64, 64)
print("bucket", hw, flush=True)

model = trainer.model
params = trainer.state.params
variables = {"params": params}
mutable = False
if trainer.state.batch_stats is not None:
    variables["batch_stats"] = trainer.state.batch_stats
    mutable = ["batch_stats"]
out = model.apply(variables, dict(db, image_hw=hw), True,
                  rngs={"sampling": jax.random.key(0), "dropout": jax.random.key(1)},
                  mutable=mutable)
if mutable:
    out = out[0]
prop = out["proposals"]
obj = np.asarray(prop["objectness"]); dlt = np.asarray(prop["pred_bbox_deltas"])
labels = np.asarray(prop["labels"]); matches = np.asarray(prop["matches"])
anchors = np.asarray(prop["anchors"])
print("objectness mean/std/max", obj.mean(), obj.std(), np.abs(obj).max(), flush=True)
print("deltas absmax", np.abs(dlt).max(), "absmean", np.abs(dlt).mean(), flush=True)
print("labels pos/neg/ign per image:", (labels == 1).sum(1), (labels == 0).sum(1), (labels == -1).sum(1), flush=True)

from transfusion_tpu.ops import BoxCoder
coder = BoxCoder((1.0, 1.0, 1.0, 1.0))
gtb = np.asarray(db["targets"]["boxes"])
for i in range(2):
    pos = np.where(labels[i] == 1)[0]
    mg = gtb[i][matches[i][pos]]
    tgt = np.asarray(coder.encode(jnp.asarray(mg), jnp.asarray(anchors[pos])))
    pd = dlt[i][pos]
    print(f"img {i}: n_pos {len(pos)} | targets absmax {np.abs(tgt).max():.2f} "
          f"| pred absmax {np.abs(pd).max():.2f} | err absmax {np.abs(pd - tgt).max():.2f} "
          f"| err mean {np.abs(pd - tgt).mean():.3f}", flush=True)
    # per-positive-anchor errors
    err = np.abs(pd - tgt).sum(-1)
    print("   worst anchors:", anchors[pos[np.argsort(-err)[:3]]], "errs", np.sort(err)[-3:], flush=True)

# proposal quality
boxes = np.asarray(prop["boxes"]); pvalid = np.asarray(prop["valid"])
def iou(a, b):
    x1 = np.maximum(a[0], b[0]); y1 = np.maximum(a[1], b[1])
    x2 = np.minimum(a[2], b[2]); y2 = np.minimum(a[3], b[3])
    inter = max(0, x2-x1) * max(0, y2-y1)
    ar_a = (a[2]-a[0])*(a[3]-a[1]); ar_b = (b[2]-b[0])*(b[3]-b[1])
    return inter / (ar_a + ar_b - inter + 1e-9)
for i in range(4):
    gv = np.asarray(db["targets"]["valid"][i])
    g = gtb[i][gv][0]
    ious = [iou(b, g) for b in boxes[i][pvalid[i]][:50]]
    print(f"img {i}: gt {g} best proposal IoU (top50) {max(ious):.3f}", flush=True)
