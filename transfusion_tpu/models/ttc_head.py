"""Transformer TTC prediction head (the optional ``ttc_hand_head``).

Flax counterpart of ``modeling/ttc_pred.py:66-159``: a CLS token attends over
 (a) the detection's RoI box feature projected to the head dim,
 (b) quantized box-coordinate tokens — each of x0/y0/x1/y1 indexes a
     sinusoidal table row by ``floor(coord * emb_steps)`` and passes through a
     2-layer SiLU MLP, with coordinate-type embeddings added,
 (c) per-step hand box coordinate tokens with hand-side + type + step
     encodings, and
 (d) FrankMocap hand-pose tokens (63-d) embedded by a 2-layer SiLU MLP,
through a post-norm transformer encoder; softplus on the CLS output.

Note: the reference adds hand-side encodings with a batch-dimension indexing
bug (``ttc_pred.py:127-128`` slices dim 0 where the token dim was intended);
this implementation applies them to the token halves as intended.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from transfusion_tpu.models.fusion import EncoderLayer, sin1d_table


@dataclass(frozen=True)
class TTCHeadConfig:
    feat_dim: int = 1024
    ff_dim: int = 1024
    num_heads: int = 4
    num_layers: int = 4
    dropout: float = 0.1
    num_steps: int = 5          # hand history steps
    emb_steps_hand: int = 100   # coordinate quantization for hand boxes
    emb_steps_object: int = 100
    hand_feat_dim: int = 63
    object_feat_dim: int = 1024
    max_len: int = 5000


class CoordMLP(nn.Module):
    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.silu(h)
        return nn.Dense(self.feat_dim, dtype=self.dtype, name="fc2")(h)


class TTCPredictionHead(nn.Module):
    cfg: TTCHeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: dict, deterministic: bool = True):
        """inputs: box_features [B, Do], object_boxes [B, 1, 4] (normalized),
        hand_boxes [B, 2*steps, 4] (normalized), hand_poses [B, 2*steps, 63].
        Returns softplus TTC [B]."""
        cfg = self.cfg
        pe = jnp.asarray(sin1d_table(cfg.max_len, cfg.feat_dim), self.dtype)

        def quantized_coord_tokens(boxes, steps, name):
            idx = jnp.clip(jnp.floor(boxes * steps).astype(jnp.int32), 0, cfg.max_len - 1)
            b = idx.shape[0]
            toks = pe[idx.reshape(b, -1)]  # [B, T*4, D]
            return CoordMLP(cfg.feat_dim, self.dtype, name=name)(toks)

        tokens = []
        bsz = inputs["box_features"].shape[0]

        if cfg.object_feat_dim > 0:
            obj = nn.Dense(cfg.feat_dim, dtype=self.dtype, name="object_feat_embedder")(
                inputs["box_features"].astype(self.dtype)
            )
            tokens.append(obj[:, None, :])

        type_enc = jnp.concatenate(
            [
                self.param(f"{n}_type_enc", nn.initializers.normal(1.0), (1, cfg.feat_dim))
                for n in ("x0", "y0", "x1", "y1")
            ],
            axis=0,
        ).astype(self.dtype)  # [4, D]
        side_enc = self.param("hand_side_enc", nn.initializers.normal(1.0), (2, cfg.feat_dim)).astype(self.dtype)

        if cfg.emb_steps_object > 0:
            ob = quantized_coord_tokens(inputs["object_boxes"], cfg.emb_steps_object, "object_box_embedder")
            n4 = ob.shape[1] // 4
            ob = ob + jnp.tile(type_enc, (n4, 1))[None]
            tokens.append(ob)

        if cfg.emb_steps_hand > 0 and "hand_boxes" in inputs:
            hb = quantized_coord_tokens(inputs["hand_boxes"], cfg.emb_steps_hand, "hand_box_embedder")
            n_tok = hb.shape[1]
            side = jnp.repeat(side_enc, n_tok // 2, axis=0)[None]
            hb = hb + side + jnp.tile(type_enc, (n_tok // 4, 1))[None]
            # Temporal step encodings, repeated over the 4 coords per step.
            steps_pe = pe[cfg.emb_steps_hand : cfg.emb_steps_hand + cfg.num_steps]
            steps_pe = jnp.tile(jnp.repeat(steps_pe, 4, axis=0), (2, 1))[None]
            hb = hb + steps_pe[:, :n_tok]
            tokens.append(hb)

        if cfg.hand_feat_dim > 0 and "hand_poses" in inputs:
            hp = CoordMLP(cfg.feat_dim, self.dtype, name="hand_pose_embedder")(
                inputs["hand_poses"].astype(self.dtype)
            )
            n_tok = hp.shape[1]
            hp = hp + jnp.repeat(side_enc, n_tok // 2, axis=0)[None]
            steps_pe = jnp.tile(pe[cfg.emb_steps_hand : cfg.emb_steps_hand + cfg.num_steps], (2, 1))[None]
            hp = hp + steps_pe[:, :n_tok]
            tokens.append(hp)

        x = jnp.concatenate(tokens, axis=1)
        if cfg.num_layers > 0:
            cls = self.param("cls_token", nn.initializers.normal(1.0), (1, cfg.feat_dim)).astype(self.dtype)
            x = jnp.concatenate([jnp.tile(cls[None], (bsz, 1, 1)), x], axis=1)
            for i in range(cfg.num_layers):
                x = EncoderLayer(
                    cfg.feat_dim, cfg.num_heads, cfg.ff_dim / cfg.feat_dim, cfg.dropout,
                    "relu", self.dtype, name=f"layer_{i}",
                )(x, deterministic=deterministic)
            pre = nn.Dense(1, dtype=self.dtype, name="ttc_out")(x[:, 0])[:, 0]
        else:
            flat = nn.gelu(x.reshape(bsz, -1), approximate=False)
            pre = nn.Dense(1, dtype=self.dtype, name="ttc_out")(flat)[:, 0]
        return jax.nn.softplus(pre)
