"""Fast-SCNN snao model (SCNNWrapper equivalent).

The wrapped ``modeling.fast_scnn`` is ABSENT from the reference snapshot
(scnn_wrapper.py:2 import fails), so there is no runnable oracle; the tests
pin the wrapper's integration contract instead: the fused map at 1/8 input
resolution (get_final_dsampled_size, scnn_wrapper.py:55-59), the classif
branch widths (scnn_wrapper.py:35-48), and the shared NaoWrapperBase
last_stage semantics (commons.py:111-149), which ResnetNao already
oracle-tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.models.scnn import ScnnFeatures, ScnnNao, ScnnNaoConfig

TINY = dict(hmap_dropout=0.0, class_dropout=0.0, ttc_dropout=0.0)


def _run(cfg, b=2, hw=64):
    model = ScnnNao(cfg)
    x = jax.random.normal(jax.random.key(1), (b, hw, hw, 3))
    variables = model.init(jax.random.key(0), x)
    return variables, model.apply(variables, x), x


def test_trunk_fuses_at_one_eighth_resolution():
    """get_final_dsampled_size (scnn_wrapper.py:55-59): the fused feature
    map sits at ceil(resize_spec / 8) with feature_fusion_c[-1] channels."""
    cfg = ScnnNaoConfig(**TINY)
    model = ScnnFeatures(cfg)
    x = jnp.zeros((1, 96, 192, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 12, 24, cfg.feature_fusion_c[-1])


def test_heatmap_only_mode_has_no_classif_branch():
    """is_classifying() gates bottleneck_1/2 construction entirely
    (scnn_wrapper.py:35-48)."""
    cfg = ScnnNaoConfig(heatmap_pred=True, **TINY)
    variables, out, x = _run(cfg)
    params = variables["params"]
    assert "heatmap_head" in params
    assert not any(k.startswith("bottleneck") for k in params)
    # last_stage upsamples back to the input resolution (commons.py:136).
    assert out["heatmap"].shape == (2, 64, 64)
    assert out["noun_logits"] is None and out["ttc"] is None


def test_classifying_mode_branch_widths_and_heads():
    """classif_branch (scnn_wrapper.py:76-82): in -> int(in*1.25) (stride 2)
    -> out_class_channels (stride 1) -> adaptive pool -> heads."""
    cfg = ScnnNaoConfig(heatmap_pred=True, noun_classes=7, verb_classes=5,
                        ttc_pred=True, **TINY)
    variables, out, x = _run(cfg)
    params = variables["params"]
    fuse = cfg.feature_fusion_c[-1]
    assert params["bottleneck_1_0"]["project"]["conv"]["kernel"].shape[-1] == int(fuse * 1.25)
    assert params["bottleneck_2_0"]["project"]["conv"]["kernel"].shape[-1] == 512
    assert out["noun_logits"].shape == (2, 7)
    assert out["verb_logits"].shape == (2, 5)
    assert out["ttc"].shape == (2,)
    assert float(out["ttc"].min()) >= 0.0  # softplus head (commons.py:83)


def test_w_sigmoid_and_kl_div_last_stage():
    cfg = ScnnNaoConfig(w_sigmoid=True, **TINY)
    _, out, _ = _run(cfg)
    hm = np.asarray(out["heatmap"])
    assert hm.min() >= 0.0 and hm.max() <= 1.0

    cfg = ScnnNaoConfig(kl_div=True, **TINY)
    _, out, _ = _run(cfg)
    p = np.exp(np.asarray(out["heatmap"], np.float64)).reshape(2, -1).sum(-1)
    np.testing.assert_allclose(p, 1.0, rtol=1e-4)


def test_multivar_head_shared_with_resnet_nao():
    """forward_multivar is the same code path ResnetNao oracle-tests
    (commons.py:100-109 is on the shared NaoWrapperBase)."""
    cfg = ScnnNaoConfig(multivar_n=True, **TINY)
    variables, out, _ = _run(cfg)
    dist = out["heatmap"]
    assert dist["loc"].shape == (2, 2)
    st = np.asarray(dist["scale_tril"])
    assert st.shape == (2, 2, 2)
    assert np.all(st[:, 0, 1] == 0.0)
    assert np.all(st[:, 0, 0] > 0) and np.all(st[:, 1, 1] > 0)
    assert "dist_mlp" in variables["params"]
