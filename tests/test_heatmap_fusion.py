"""Legacy snao heatmap family: model forward, criterion oracle, train step,
dataset contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfusion_tpu.models.heatmap_fusion import HeatmapCrossFusion, HeatmapFusionConfig
from transfusion_tpu.train.losses import hmap_criterion


def _run(cfg, b=2, h=8, w=12, c=16, t=3, train=False):
    model = HeatmapCrossFusion(cfg)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    lang = jnp.asarray(rng.normal(size=(b, t, cfg.token_dim)), jnp.float32)
    mask = jnp.asarray([[1] * t, [1, 1, 0][:t]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feat, lang, mask, im_size=(32, 48))
    out = model.apply(params, feat, lang, mask, im_size=(32, 48),
                      deterministic=not train,
                      rngs={"dropout": jax.random.PRNGKey(1)} if train else None)
    return params, out


@pytest.mark.parametrize("ftype", ["asymmetric", "cross_transformer"])
@pytest.mark.parametrize("back_fn", ["token", "regroup", "regroup_gated"])
def test_forward_shapes(ftype, back_fn):
    cfg = HeatmapFusionConfig(fusion_type=ftype, back_to_img_fn=back_fn,
                              token_dim=32, num_heads=2, noun_classes=7,
                              verb_classes=5, ttc_pred=True)
    _, out = _run(cfg)
    assert out["heatmap"].shape == (2, 32, 48)
    assert out["noun_logits"].shape == (2, 7)
    assert out["verb_logits"].shape == (2, 5)
    assert out["ttc"].shape == (2,)
    assert (out["ttc"] >= 0).all()  # softplus head (commons.py:27-28)
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_token_embeddings_mode_uses_class_token():
    cfg = HeatmapFusionConfig(fusion_type="cross_transformer",
                              narr_out_mode="token_embeddings", token_dim=32,
                              num_heads=2, noun_classes=4)
    params, out = _run(cfg)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("class_token" in n for n in names)
    assert out["noun_logits"].shape == (2, 4)


def test_kl_div_normalizes():
    cfg = HeatmapFusionConfig(token_dim=32, num_heads=2, kl_div=True)
    _, out = _run(cfg)
    s = np.exp(np.asarray(out["heatmap"], np.float64)).reshape(2, -1).sum(-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_hmap_criterion_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    preds = rng.normal(size=(3, 8, 10)).astype(np.float32)
    targets = (rng.uniform(size=(3, 8, 10)) > 0.6).astype(np.float32)
    fg = np.full(3, 0.5, np.float32)
    bg = np.full(3, 0.5, np.float32)

    for crit, t_loss in [
        ({"mae": 1, "agg": "mean"}, torch.nn.L1Loss(reduction="none")),
        ({"mse": 1, "agg": "sum"}, torch.nn.MSELoss(reduction="none")),
        ({"ce": 1, "agg": "mean"}, torch.nn.BCEWithLogitsLoss(reduction="none")),
    ]:
        for pixel_w in [1, 3.0, "reg"]:
            got = hmap_criterion(crit, pixel_w)(
                jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(fg), jnp.asarray(bg))
            # torch oracle = the reference w_loss math (losses.py:69-98)
            lt = t_loss(torch.from_numpy(preds), torch.from_numpy(targets))
            tt = torch.from_numpy(targets).view(3, -1)
            lt = lt.view(3, -1)
            if pixel_w == "reg":
                lt = torch.where(tt > 0, lt * (1 - 0.5), lt * (1 - 0.5))
            elif pixel_w != 1:
                f, b_ = 1 - 1 / (1 + pixel_w), 1 / (1 + pixel_w)
                lt = torch.where(tt > 0, lt * f, lt * b_)
            want = lt.sum(-1).mean() if crit["agg"] == "sum" else lt.mean()
            np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_hmap_criterion_kl_div_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 6, 8)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits).reshape(2, -1)).reshape(2, 6, 8)
    t = rng.uniform(size=(2, 6, 8)).astype(np.float32)
    t = t / t.reshape(2, -1).sum(-1).reshape(2, 1, 1)
    got = hmap_criterion({"kl_div": 1, "agg": "mean"}, 1)(logp, jnp.asarray(t), None, None)
    want = torch.nn.KLDivLoss(reduction="none")(
        torch.from_numpy(np.asarray(logp)), torch.from_numpy(t)).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_train_step_decreases_loss():
    import optax

    cfg = HeatmapFusionConfig(token_dim=32, num_heads=2, noun_classes=4,
                              verb_classes=3, ttc_pred=True, kl_div=True)
    model = HeatmapCrossFusion(cfg)
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(2, 8, 12, 16)), jnp.float32)
    lang = jnp.asarray(rng.normal(size=(2, 1, 32)), jnp.float32)
    target = rng.uniform(size=(2, 32, 48)).astype(np.float32)
    target = jnp.asarray(target / target.reshape(2, -1).sum(-1).reshape(2, 1, 1))
    crit = hmap_criterion({"kl_div": 1, "agg": "sum"}, 1)

    params = model.init(jax.random.PRNGKey(0), feat, lang, im_size=(32, 48))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, feat, lang, im_size=(32, 48))
            return crit(out["heatmap"], target, None, None)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(8):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_snao_dataset_contract(tmp_path):
    from tests.fixtures import make_synthetic_ego4d
    from transfusion_tpu.data.annotations import load_sta_annotations
    from transfusion_tpu.data.dataset import EgoNaoDataset, build_narration_lookup
    from transfusion_tpu.data.labels import generated_label_mapping
    from transfusion_tpu.data.snao import SNaoDataset, snao_collate
    from transfusion_tpu.data.transforms import AugConfig

    fx = make_synthetic_ego4d(str(tmp_path))
    annots = load_sta_annotations(
        fx["root"], narr_structure="{external_0}",
        narr_external_paths=fx["externals"])
    nmap = generated_label_mapping(annots["all_nouns"].explode())
    vmap = generated_label_mapping(annots["all_verbs"].explode())
    base = EgoNaoDataset(
        annots=annots, frames_dir=fx["frames_dir"], noun_mapping=nmap,
        verb_mapping=vmap, aug=AugConfig(resize_spec=((96, 128),)),
        narration_lookup=build_narration_lookup(annots, "current"),
        uid_col="video_id",
    )
    ds = SNaoDataset(base, heatmap_type="gaussian")
    rng = np.random.default_rng(0)
    ex = ds.get_example(0, rng, (96, 128), training=False)
    assert ex["image"].shape == (96, 128, 3)
    assert ex["heatmap"].shape == (96, 128)
    assert 0.0 <= ex["heatmap"].max() <= 1.0 + 1e-5
    assert ex["fg_perc"] == np.float32(0.5)

    batch = snao_collate([ds.get_example(i, rng, (96, 128), False) for i in range(3)])
    assert batch["image"].shape == (3, 96, 128, 3)
    assert batch["heatmap"].shape == (3, 96, 128)
    assert batch["noun"].shape == (3,)
