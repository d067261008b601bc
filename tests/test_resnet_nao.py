"""Plain-ResNet snao model (ResnetWrapper equivalent) + multivar heatmap loss.

Oracles: torch.distributions.MultivariateNormal for the NLL; branch/shape
semantics from resnet_wrapper.py:112-210 and commons.py:100-149 (the snao
family is dead code in the reference, so there is no runnable oracle for the
full forward — see the module docstring of models/resnet_nao.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from transfusion_tpu.models.resnet_nao import ResnetNao, ResnetNaoConfig
from transfusion_tpu.train.losses import (mvn_nll, multivar_n_loss,
                                          sample_heatmap_coords)

TINY = dict(stage_sizes=(1, 1, 1, 1), hmap_dropout=0.0, class_dropout=0.0,
            ttc_dropout=0.0)


def _run(cfg, b=2, hw=64):
    model = ResnetNao(cfg)
    x = jax.random.normal(jax.random.key(1), (b, hw, hw, 3))
    variables = model.init(jax.random.key(0), x)
    return variables, model.apply(variables, x), x


def test_heatmap_only_mode_cuts_tail_stages():
    """cut_blocks_up_to (resnet_wrapper.py:149,192-193): with no classifier
    and no ttc the tail stages must not exist at all."""
    cfg = ResnetNaoConfig(heatmap_blocks=3, heatmap_pred=True, **TINY)
    variables, out, x = _run(cfg)
    params = variables["params"]
    assert "layer3_0" in params and "layer4_0" not in params
    # last_stage upsamples back to the input resolution (commons.py:136).
    assert out["heatmap"].shape == (2, 64, 64)
    assert out["noun_logits"] is None and out["ttc"] is None


def test_classifying_mode_keeps_tail_and_heads():
    cfg = ResnetNaoConfig(heatmap_blocks=3, heatmap_pred=True, noun_classes=7,
                          verb_classes=5, ttc_pred=True, **TINY)
    variables, out, x = _run(cfg)
    assert "layer4_0" in variables["params"]
    assert out["noun_logits"].shape == (2, 7)
    assert out["verb_logits"].shape == (2, 5)
    assert out["ttc"].shape == (2,)
    assert float(out["ttc"].min()) >= 0.0  # softplus head (commons.py:83)


def test_w_sigmoid_bounds_heatmap():
    cfg = ResnetNaoConfig(heatmap_blocks=2, w_sigmoid=True, **TINY)
    _, out, _ = _run(cfg)
    hm = np.asarray(out["heatmap"])
    assert hm.min() >= 0.0 and hm.max() <= 1.0


def test_kl_div_heatmap_is_log_distribution():
    """kl_div criterion -> log-softmax over the flattened map (the
    HeatmapCrossFusion convention shared by last_stage)."""
    cfg = ResnetNaoConfig(heatmap_blocks=2, kl_div=True, **TINY)
    _, out, _ = _run(cfg)
    p = np.exp(np.asarray(out["heatmap"], np.float64)).reshape(2, -1).sum(-1)
    np.testing.assert_allclose(p, 1.0, rtol=1e-4)


def test_multivar_returns_valid_scale_tril():
    """forward_multivar (commons.py:100-109, intended index split): lower
    triangular with positive diagonal at init (1 + offset_stds + elu)."""
    cfg = ResnetNaoConfig(heatmap_blocks=3, multivar_n=True,
                          resize_spec=(64, 64), **TINY)
    _, out, _ = _run(cfg)
    dist = out["heatmap"]
    assert dist["loc"].shape == (2, 2)
    st = np.asarray(dist["scale_tril"])
    assert st.shape == (2, 2, 2)
    assert np.all(st[:, 0, 1] == 0.0)
    assert np.all(st[:, 0, 0] > 0) and np.all(st[:, 1, 1] > 0)


def test_mvn_nll_matches_torch_oracle():
    rng = np.random.default_rng(0)
    loc = rng.normal(size=(3, 2)).astype(np.float32)
    raw = rng.normal(size=(3, 2, 2)).astype(np.float32)
    st = np.tril(raw)
    st[:, 0, 0] = np.abs(st[:, 0, 0]) + 0.5
    st[:, 1, 1] = np.abs(st[:, 1, 1]) + 0.5
    samples = rng.normal(size=(3, 11, 2)).astype(np.float32)

    ours = float(mvn_nll(jnp.asarray(loc), jnp.asarray(st), jnp.asarray(samples)))
    dist = torch.distributions.MultivariateNormal(
        loc=torch.from_numpy(loc), scale_tril=torch.from_numpy(st))
    # The reference scores [S, B, 2] batches (samples permuted to put the
    # sample axis first, losses.py:60-61); mean is permutation-invariant.
    theirs = float(-dist.log_prob(torch.from_numpy(samples).permute(1, 0, 2)).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_sample_heatmap_coords_follows_mass():
    """Samples are distinct (without replacement) and land only on nonzero
    heatmap mass, mapped into the +/-MAX_STD frame (losses.py:49-60)."""
    from transfusion_tpu.data.heatmaps import MAX_STD

    h, w = 16, 32
    hm = np.zeros((1, h, w), np.float32)
    hm[0, 2:6, 20:28] = 1.0  # top-right-ish blob
    coords = np.asarray(sample_heatmap_coords(jax.random.key(0), jnp.asarray(hm), 8))
    assert coords.shape == (1, 8, 2)
    # Distinct pixels.
    assert len({(round(float(y), 5), round(float(x), 5)) for y, x in coords[0]}) == 8
    sy = h / w
    ys, xs = coords[0, :, 0], coords[0, :, 1]
    # Blob rows 2..5 -> y in [-sy*MAX_STD, ~-sy*MAX_STD/4); cols 20..27 -> x > 0.
    assert np.all(ys < 0) and np.all(xs > 0)
    assert np.all(np.abs(ys) <= MAX_STD * sy) and np.all(np.abs(xs) <= MAX_STD)


def test_multivar_loss_end_to_end_decreases():
    """The assembled multivar objective is differentiable and one gradient
    step on the dist params reduces it."""
    cfg = ResnetNaoConfig(heatmap_blocks=3, multivar_n=True,
                          resize_spec=(64, 64), **TINY)
    model = ResnetNao(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    hm = np.zeros((2, 64, 64), np.float32)
    hm[:, 10:20, 40:50] = 1.0
    hm = jnp.asarray(hm)
    loss_fn = multivar_n_loss({"multivar_n": 1, "no_samples": 16})

    def objective(params):
        out = model.apply({"params": params}, x)
        return loss_fn(out["heatmap"], hm, jax.random.key(42))

    l0, grads = jax.value_and_grad(objective)(variables["params"])
    assert np.isfinite(l0)
    g = grads["dist_mlp"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    # Step only the distribution head (a full-tree step at a fixed lr can
    # overshoot through the conv stack; the claim under test is that the
    # dist params receive a useful gradient).
    stepped = dict(variables["params"])
    for k in ("dist_mlp", "offset_stds"):
        stepped[k] = jax.tree.map(lambda p, gr: p - 1e-3 * gr,
                                  variables["params"][k], grads[k])
    l1 = objective(stepped)
    assert float(l1) < float(l0)
