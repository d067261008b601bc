"""Backbone/FPN geometry + numerical parity against torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.torch_backbone_oracle import TFPN, TResNet
from transfusion_tpu.models.fpn import FPN
from transfusion_tpu.models.resnet import ResNet


def _copy_convnorm(tp, tmod):
    """Fill flax ConvNorm param dict from a torch TConvNorm (in place)."""
    tp["conv"]["kernel"] = jnp.asarray(tmod.conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    tp["bn"]["scale"] = jnp.asarray(tmod.bn.weight.numpy())
    tp["bn"]["bias"] = jnp.asarray(tmod.bn.bias.numpy())
    tp["bn"]["mean"] = jnp.asarray(tmod.bn.running_mean.numpy())
    tp["bn"]["var"] = jnp.asarray(tmod.bn.running_var.numpy())


@pytest.mark.parametrize("stride_in_1x1", [False, True])
def test_resnet_parity_small(rng, stride_in_1x1):
    stage_sizes = (2, 2)
    tmodel = TResNet(stage_sizes, stride_in_1x1).eval()
    model = ResNet(stage_sizes=stage_sizes, stride_in_1x1=stride_in_1x1)

    x = rng.normal(0, 1, (2, 3, 65, 97)).astype(np.float32)  # odd sizes on purpose
    params = model.init(jax.random.key(0), jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]

    _copy_convnorm(params["stem"], tmodel.stem)
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            fb = params[f"layer{stage + 1}_{b}"]
            tb = tmodel.stages[stage][b]
            _copy_convnorm(fb["conv1"], tb.conv1)
            _copy_convnorm(fb["conv2"], tb.conv2)
            _copy_convnorm(fb["conv3"], tb.conv3)
            if tb.downsample is not None:
                _copy_convnorm(fb["downsample"], tb.downsample)

    with torch.no_grad():
        ref = {k: v.numpy() for k, v in tmodel(torch.from_numpy(x)).items()}
    ours = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for k in ref:
        got = np.asarray(ours[k]).transpose(0, 3, 1, 2)
        assert got.shape == ref[k].shape, (k, got.shape, ref[k].shape)
        np.testing.assert_allclose(got, ref[k], rtol=1e-3, atol=1e-3)


def test_fpn_parity(rng):
    chans = [64, 128, 256]
    tfpn = TFPN(chans, out_channels=32).eval()
    fpn = FPN(out_channels=32)

    # Odd spatial sizes exercise the non-2x nearest-resize path.
    feats_t = {
        "0": rng.normal(0, 1, (1, 64, 25, 33)).astype(np.float32),
        "1": rng.normal(0, 1, (1, 128, 13, 17)).astype(np.float32),
        "2": rng.normal(0, 1, (1, 256, 7, 9)).astype(np.float32),
    }
    feats_j = {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in feats_t.items()}
    params = fpn.init(jax.random.key(0), feats_j)["params"]
    for i, k in enumerate(["0", "1", "2"]):
        params[f"inner_{k}"]["kernel"] = jnp.asarray(tfpn.inner[i].weight.detach().numpy().transpose(2, 3, 1, 0))
        params[f"inner_{k}"]["bias"] = jnp.asarray(tfpn.inner[i].bias.detach().numpy())
        params[f"layer_{k}"]["kernel"] = jnp.asarray(tfpn.layer[i].weight.detach().numpy().transpose(2, 3, 1, 0))
        params[f"layer_{k}"]["bias"] = jnp.asarray(tfpn.layer[i].bias.detach().numpy())

    with torch.no_grad():
        ref = {k: v.numpy() for k, v in tfpn({k: torch.from_numpy(v) for k, v in feats_t.items()}).items()}
    ours = fpn.apply({"params": params}, feats_j)

    for k in ref:
        got = np.asarray(ours[k]).transpose(0, 3, 1, 2)
        assert got.shape == ref[k].shape, (k, got.shape, ref[k].shape)
        np.testing.assert_allclose(got, ref[k], rtol=1e-4, atol=1e-4)


def test_resnet50_fpn_shapes():
    model = ResNet()
    fpn = FPN()
    x = jnp.zeros((1, 256, 320, 3))
    variables = jax.eval_shape(lambda k: model.init(k, x), jax.random.key(0))
    feats = jax.eval_shape(
        lambda: model.apply(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables), x
        )
    )
    assert feats["0"].shape == (1, 64, 80, 256)
    assert feats["1"].shape == (1, 32, 40, 512)
    assert feats["2"].shape == (1, 16, 20, 1024)
    assert feats["3"].shape == (1, 8, 10, 2048)

    fp_vars = jax.eval_shape(
        lambda k: fpn.init(k, jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feats)),
        jax.random.key(0),
    )
    out = jax.eval_shape(
        lambda: fpn.apply(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), fp_vars),
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feats),
        )
    )
    assert out["0"].shape == (1, 64, 80, 256)
    assert out["3"].shape == (1, 8, 10, 256)
    assert out["pool"].shape == (1, 4, 5, 256)


def test_mobilenet_stage_shapes(rng):
    """MobileNetV3-Large trunk: stage outputs at strides 4/8/16/32 with
    torchvision's returned_layers [1,2,3,4] channels (mobilenet_fpn_utils)."""
    import jax

    from transfusion_tpu.models.mobilenet import MOBILENET_CHANNELS, MobileNetV3Features

    x = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32))
    m = MobileNetV3Features()
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert set(out) == {"0", "1", "2", "3"}
    for lvl, stride in zip("0123", (4, 8, 16, 32)):
        h, w, c = out[lvl].shape[1:]
        assert (h, w) == (64 // stride, 96 // stride), lvl
        assert c == MOBILENET_CHANNELS[lvl], lvl


def test_mobilenet_inverted_residual_matches_torch(rng):
    """One SE inverted-residual block vs a torch re-statement of
    torchvision's InvertedResidual (expand -> depthwise -> SE -> project,
    residual on stride-1 same-channels)."""
    import jax
    import torch
    import torch.nn.functional as F

    from transfusion_tpu.models.mobilenet import InvertedResidual

    cin, exp, cout, k = 8, 16, 8, 3
    x = rng.normal(0, 1, (1, 10, 12, cin)).astype(np.float32)
    blk = InvertedResidual(k, exp, cout, True, "relu", 1)
    params = blk.init(jax.random.key(0), jnp.asarray(x))["params"]
    out = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))

    t = torch.from_numpy(x.transpose(0, 3, 1, 2))

    def conv(t, p, stride=1, groups=1):
        w = torch.from_numpy(np.asarray(p["conv"]["kernel"]).transpose(3, 2, 0, 1)).float()
        return F.conv2d(t, w, None, stride, (w.shape[-1] - 1) // 2, 1, groups)

    def bn(t, p):
        sc = torch.from_numpy(np.asarray(p["bn"]["scale"]))
        bi = torch.from_numpy(np.asarray(p["bn"]["bias"]))
        mu = torch.from_numpy(np.asarray(p["bn"]["mean"]))
        va = torch.from_numpy(np.asarray(p["bn"]["var"]))
        return (t - mu[None, :, None, None]) / torch.sqrt(va[None, :, None, None] + 1e-3) \
            * sc[None, :, None, None] + bi[None, :, None, None]

    h = F.relu(bn(conv(t, params["expand"]), params["expand"]))
    h = F.relu(bn(conv(h, params["depthwise"], groups=exp), params["depthwise"]))
    s = h.mean(dim=(2, 3), keepdim=True)
    w1 = torch.from_numpy(np.asarray(params["se"]["fc1"]["kernel"]).transpose(3, 2, 0, 1)).float()
    b1 = torch.from_numpy(np.asarray(params["se"]["fc1"]["bias"]))
    w2 = torch.from_numpy(np.asarray(params["se"]["fc2"]["kernel"]).transpose(3, 2, 0, 1)).float()
    b2 = torch.from_numpy(np.asarray(params["se"]["fc2"]["bias"]))
    s = F.conv2d(F.relu(F.conv2d(s, w1, b1)), w2, b2)
    h = h * F.hardsigmoid(s)
    h = bn(conv(h, params["project"]), params["project"])
    ref = (h + t).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_detector_with_mobilenet_backbone(rng):
    """model.type mobilenet builds and runs through FPN/RPN/RoI."""
    import jax

    from transfusion_tpu.models.detector import DetectorConfig, FasterRCNN
    from transfusion_tpu.models.roi_heads import RoIConfig
    from transfusion_tpu.models.rpn import RPNConfig

    cfg = DetectorConfig(
        roi=RoIConfig(num_nouns=6, num_verbs=4, representation_size=32,
                      batch_size_per_image=8, detections_per_img=4),
        rpn=RPNConfig(pre_nms_top_n_train=32, post_nms_top_n_train=16,
                      pre_nms_top_n_test=32, post_nms_top_n_test=16),
        backbone="mobilenet",
    )
    model = FasterRCNN(cfg)
    img = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, img, (64, 64), None, False)
    out = model.apply(params, img, (64, 64), None, False)
    assert "roi_outputs" in out and out["roi_outputs"]["class_logits"].shape[-1] == 6


def test_s2d_stem_exact_equivalence(rng):
    """The space-to-depth stem with folded weights reproduces the standard
    7x7/s2 stem bit-for-bit (MLPerf-ResNet trick; fold_stem_to_s2d)."""
    from transfusion_tpu.models.resnet import fold_stem_to_s2d

    std = ResNet(stage_sizes=(1, 1, 1, 1))
    s2d = ResNet(stage_sizes=(1, 1, 1, 1), s2d_stem=True)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32))
    p_std = std.init(jax.random.key(0), x)["params"]
    p_s2d = s2d.init(jax.random.key(1), x)["params"]

    # copy everything but the stem, then fold the stem weights
    for k in p_std:
        if k not in ("stem",):
            p_s2d[k] = p_std[k]
    p_s2d["stem_s2d"]["kernel"] = jnp.asarray(fold_stem_to_s2d(p_std["stem"]["conv"]["kernel"]))
    p_s2d["stem_bn"] = p_std["stem"]["bn"]

    out_std = std.apply({"params": p_std}, x)
    out_s2d = s2d.apply({"params": p_s2d}, x)
    for lvl in out_std:
        np.testing.assert_allclose(np.asarray(out_std[lvl]), np.asarray(out_s2d[lvl]),
                                   rtol=1e-5, atol=1e-5)
