"""ResNet-50 backbone with detectron2-style strides, NHWC, flax.linen.

Behavioral contract (checked against a torch oracle in tests):
  * torchvision bottleneck topology with FrozenBatchNorm after every conv
    (the reference freezes all backbone BN: ``rcnn_factory`` builds the
    torchvision ``resnet_fpn_backbone`` whose norm layers are FrozenBN);
  * ``stride_in_1x1=True`` moves the downsampling stride from conv2 (3x3)
    to conv1 (1x1) in the first block of layers 2-4 — the detectron2
    adaptation the reference applies for its translated Ego4D checkpoints
    (``modeling/obj_detection/rcnn_factory.py:156-165``);
  * explicit symmetric padding everywhere so geometry matches torch exactly
    (XLA 'SAME' pads asymmetrically for stride 2 — a silent parity killer).

Layout is NHWC and compute dtype is configurable (bf16 on TPU); parameters
stay f32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics: y = (x - mean) / sqrt(var + eps) * scale + bias.

    Stored as four per-channel vectors so torch checkpoints translate 1:1.
    The affine is constant during training (the reference never unfreezes
    backbone BN — ``modeling/commons.py:33-41`` freezes all-but-BN then BN
    stats stay frozen inside torchvision FrozenBatchNorm2d).
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # Pre-fold into a single multiply-add (XLA fuses this into the conv).
        mul = scale / jnp.sqrt(var + self.eps)
        add = bias - mean * mul
        return x * mul.astype(self.dtype) + add.astype(self.dtype)


class ConvNorm(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32
    # model.batch_norm.use (replace_frozen_bn, obj_detection/utils.py:3-57):
    # swap the frozen affine for a live BatchNorm with the configured
    # momentum. torch momentum m means new = (1-m)*old + m*batch; flax
    # momentum is the (1-m) factor.
    trainable_bn: bool = False
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.trainable_bn:
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 (x4) with optional projection shortcut."""

    mid: int
    stride: int = 1
    stride_in_1x1: bool = False
    project: bool = False
    dtype: Any = jnp.float32
    trainable_bn: bool = False
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.mid * 4
        s1, s2 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        cn = lambda f, k, s, name: ConvNorm(  # noqa: E731
            f, k, s, self.dtype, self.trainable_bn, self.bn_momentum, name=name
        )
        h = nn.relu(cn(self.mid, 1, s1, "conv1")(x, train))
        h = nn.relu(cn(self.mid, 3, s2, "conv2")(h, train))
        h = cn(out, 1, 1, "conv3")(h, train)
        if self.project:
            x = cn(out, 1, self.stride, "downsample")(x, train)
        return nn.relu(h + x)


class ResNet(nn.Module):
    """Returns feature dict {"0": C2, "1": C3, "2": C4, "3": C5} (strides 4..32)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    stride_in_1x1: bool = True  # detectron2 adaptation
    dtype: Any = jnp.float32
    trainable_bn: bool = False
    bn_momentum: float = 0.1
    # Space-to-depth stem (the MLPerf-ResNet TPU trick): the 7x7/s2 stem conv
    # is mathematically identical to a 4x4/s1 conv on the 2x2 space-to-depth
    # input with regrouped (zero-padded) weights — same FLOPs but a layout
    # the MXU tiles far better than a 3-channel 7x7. fold_stem_to_s2d
    # converts standard stem weights exactly.
    s2d_stem: bool = False
    # Frozen-prefix gradient cut: number of leading units [stem, layer1,
    # layer2, layer3, layer4] whose outputs are wrapped in stop_gradient.
    # torchvision's trainable_layers / the wrapper's train_ep freeze
    # (faster_rcnn_wrapper.py:135-146; ego_vis_det_ego4dv2.yml:2-3 has
    # trainable_layers 2, train_ep -1 = the body never unfreezes) is
    # implemented downstream by grad masking — exact, but the backward still
    # sweeps the largest-spatial convs and throws the result away. Cutting
    # the tape at the frozen boundary produces bit-identical updates
    # (nothing trainable sits upstream of the cut) and deletes that work.
    stop_grad_prefix: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d_stem:
            import os

            # Cast to compute dtype BEFORE the space-to-depth rearrangement:
            # XLA lowers the 6D reshape/transpose to physical layout copies,
            # and the stem conv casts its input anyway — casting first moves
            # half the bytes through those copies (numerics identical).
            x = x.astype(self.dtype)
            b, hh, ww, c = x.shape
            if os.environ.get("TRANSFUSION_S2D_SLICE", "0") == "1":
                # Same rearrangement as strided slices + channel concat
                # (channel order (p, q, c) matches fold_stem_to_s2d) — an
                # A/B against the 6D reshape/transpose, which XLA lowers to
                # three physical layout copies (~2.5 ms/step at eval B8).
                # Measured on-chip it LOSES (85.0 vs 87.1 f/s calibrated
                # eval): XLA's strided-slice lowering costs more than the
                # transpose copies. Kept as the documented dead end.
                x = jnp.concatenate(
                    [x[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)], axis=-1
                )
            else:
                x = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2, 4 * c)
            h = nn.Conv(
                64, (4, 4), strides=(1, 1), padding=((2, 1), (2, 1)),
                use_bias=False, dtype=self.dtype, name="stem_s2d",
            )(x)
            h = FrozenBatchNorm(64, dtype=self.dtype, name="stem_bn")(h) \
                if not self.trainable_bn else nn.BatchNorm(
                    use_running_average=not train, momentum=1.0 - self.bn_momentum,
                    epsilon=1e-5, dtype=self.dtype, name="stem_bn",
                )(h)
        else:
            h = ConvNorm(64, 7, 2, self.dtype, self.trainable_bn, self.bn_momentum, name="stem")(
                x, train
            )
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.stop_grad_prefix >= 1:
            h = jax.lax.stop_gradient(h)

        feats = {}
        mid = 64
        for stage, blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                h = Bottleneck(
                    mid=mid,
                    stride=stride if b == 0 else 1,
                    # detectron2 never puts the stride on the 1x1 in stage 1
                    # (it has stride 1 anyway); flag applies to stages 2-4.
                    stride_in_1x1=self.stride_in_1x1,
                    project=(b == 0),
                    dtype=self.dtype,
                    trainable_bn=self.trainable_bn,
                    bn_momentum=self.bn_momentum,
                    name=f"layer{stage + 1}_{b}",
                )(h, train)
            if stage + 1 < self.stop_grad_prefix:
                h = jax.lax.stop_gradient(h)
            feats[str(stage)] = h
            mid *= 2
        return feats


RESNET50_CHANNELS = {"0": 256, "1": 512, "2": 1024, "3": 2048}


def fold_stem_to_s2d(w):
    """Exactly regroup standard stem weights [7, 7, C, 64] into the
    space-to-depth stem's [4, 4, 4*C, 64]: output pixel i of the 7x7/s2 conv
    reads input u = 2i - 3 + dy; writing u = 2(a + i - 2) + p maps kernel tap
    dy = 2*alpha + p - 1 (alpha = a - i + 2 in [0, 4)), taps outside [0, 7)
    are zero. Same along x. s2d channel layout is (p, q, c) flattened."""
    import numpy as np

    kh, kw, c, o = w.shape
    assert (kh, kw) == (7, 7)
    out = np.zeros((4, 4, 4 * c, o), np.asarray(w).dtype)
    for alpha in range(4):
        for p in range(2):
            dy = 2 * alpha + p - 1
            if not 0 <= dy < 7:
                continue
            for beta in range(4):
                for q in range(2):
                    dx = 2 * beta + q - 1
                    if not 0 <= dx < 7:
                        continue
                    s = (p * 2 + q) * c
                    out[alpha, beta, s : s + c] = np.asarray(w)[dy, dx]
    return out
