"""Legacy upsample + heatmap-conditioning layers.

Flax equivalents of ``modeling/layers/upsample_layers.py`` (bilinear /
bicubic / nearest+conv upsamplers behind ``get_upsample_l``) and
``modeling/layers/heatmap_condition.py`` (1x1-conv and squeeze-excite
heatmap conditioning behind ``get_heatmap_cond_module``). Only the legacy
snao heatmap family uses them; provided as primitives so that experiment
family can be rebuilt. NHWC; ``size`` is (H, W).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x, size, method):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method=method)


class BilinearUpsample(nn.Module):
    in_channels: int = 0

    def __call__(self, x, size):
        # Exact torch F.interpolate(mode="bilinear", align_corners=True):
        # output i samples input at i * (in-1)/(out-1).
        b, h, w, c = x.shape
        H, W = size
        ys = jnp.linspace(0.0, h - 1.0, H)
        xs = jnp.linspace(0.0, w - 1.0, W)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (ys - y0)[None, :, None, None].astype(x.dtype)
        wx = (xs - x0)[None, None, :, None].astype(x.dtype)
        top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
        bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
        return top * (1 - wy) + bot * wy


class BicubicUpsample(nn.Module):
    in_channels: int = 0

    def __call__(self, x, size):
        # jax.image cubic uses the half-pixel convention (align_corners
        # False); the legacy heatmap path tolerates the boundary difference.
        return _resize(x, size, "cubic")


class NNConvUpsample2D(nn.Module):
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, size):
        x = _resize(x, size, "nearest")
        x = nn.Conv(self.in_channels, (4, 4), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(self.in_channels, (4, 4), padding="SAME", dtype=self.dtype, name="conv2")(x)
        return x


def get_upsample_l(kind: str):
    """upsample_layers.get_upsample_l (the 3d variant is flow-only legacy)."""
    table = {"bilinear": BilinearUpsample, "bicubic": BicubicUpsample, "nn2d": NNConvUpsample2D}
    if kind not in table:
        raise NotImplementedError(f"Upsample layer {kind} not implemented")
    return table[kind]


class SEBlock(nn.Module):
    in_channels: int
    r: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.in_channels // self.r, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Dense(self.in_channels, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class Conv2dHeatmapCondition(nn.Module):
    """1x1-type conditioning (heatmap_condition.py:14-27): concat heatmap
    channel, 5x5 conv back to the feature width, leaky-relu (+residual)."""

    in_feature_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, heatmap, with_res: bool = True):
        x = jnp.concatenate([features, heatmap], axis=-1)
        x = nn.Conv(self.in_feature_channels, (5, 5), padding="SAME", dtype=self.dtype,
                    name="conv2d")(x)
        if with_res:
            return nn.leaky_relu(x + features, 0.01)
        return nn.leaky_relu(x, 0.01)


class SqueezeHeatmapCondition(nn.Module):
    """se_block-type conditioning (heatmap_condition.py:39-48)."""

    in_feature_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, heatmap):
        x = Conv2dHeatmapCondition(self.in_feature_channels, self.dtype, name="conv2d")(
            features, heatmap, with_res=False
        )
        return features + SEBlock(self.in_feature_channels, r=1, dtype=self.dtype,
                                  name="se_block")(x)


def get_heatmap_cond_module(cond_module_args: dict, in_feature_channels: int):
    t = cond_module_args["type"]
    if t == "se_block":
        return SqueezeHeatmapCondition(in_feature_channels)
    if t == "1x1":
        return Conv2dHeatmapCondition(in_feature_channels)
    raise NotImplementedError(t)
