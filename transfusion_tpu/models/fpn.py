"""Feature Pyramid Network, NHWC flax.

Matches torchvision ``FeaturePyramidNetwork`` + ``LastLevelMaxPool`` (the
backbone the reference wraps): 1x1 lateral convs ("inner"), nearest-neighbor
top-down accumulation, 3x3 output convs ("layer"), and an extra stride-2
max-pool level appended under key "pool" that the RPN consumes
(``modeling/obj_detection/wrapper_utils.py:132-138`` runs the RPN head over
all returned maps).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_2x_to(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Nearest-neighbor resize to the lateral's spatial shape (torch
    ``interpolate(mode="nearest", size=...)`` semantics for exact-2x and
    odd-size cases alike)."""
    b, h, w, c = x.shape
    th, tw = target_hw
    if (th, tw) == (2 * h, 2 * w):
        # Fast path: pure reshape/broadcast, fuses on TPU.
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return x.reshape(b, 2 * h, 2 * w, c)
    rows = (jnp.arange(th) * h) // th
    cols = (jnp.arange(tw) * w) // tw
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32
    add_pool_level: bool = True

    @nn.compact
    def __call__(self, feats: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        keys = sorted(feats.keys(), key=int)  # "0".."3", shallow -> deep
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=self.dtype, name=f"inner_{k}")(feats[k])
            for k in keys
        ]
        # Top-down pathway.
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x_to(merged[i + 1], laterals[i].shape[1:3])
            merged[i] = laterals[i] + up

        out = {
            k: nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                dtype=self.dtype, name=f"layer_{k}",
            )(merged[i])
            for i, k in enumerate(keys)
        }
        if self.add_pool_level:
            # LastLevelMaxPool: kernel 1, stride 2 in torchvision.
            out["pool"] = nn.max_pool(out[keys[-1]], (1, 1), strides=(2, 2))
        return out
