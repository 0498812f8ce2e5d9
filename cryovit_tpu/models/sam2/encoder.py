"""SAM2 image encoder: Hiera trunk + FPN neck + sine position encodings.

Mirrors ``sam2`` ImageEncoder/FpnNeck (d_model 256, top-down pathway on the
two lowest-resolution levels, nearest-neighbor upsampling, scalp=1 dropping
the stride-32 level) so ``backbone_fpn``/``vision_pos_enc`` match the
reference's cached ``sam_features`` layout
(reference ``run/dino_features.py:67-106``).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cryovit_tpu.models.sam2.config import SAM2Config
from cryovit_tpu.models.sam2.hiera import Hiera

__all__ = ["ImageEncoder", "sine_position_encoding"]


def sine_position_encoding(h: int, w: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """2D sine position embedding ``(h, w, dim)`` (sam2 PositionEmbeddingSine)."""
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, axis=1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, axis=0)
    # normalize to 2π
    y = y / (y[-1:, :] + 1e-6) * 2 * math.pi
    x = x / (x[:, -1:] + 1e-6) * 2 * math.pi
    num_pos_feats = dim // 2
    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)


class ImageEncoder(nn.Module):
    """Hiera + FPN neck → (features, pos encodings) per retained level.

    Returns lists ordered high-res → low-res: strides 4, 8, 16 (the
    stride-32 level is consumed by the top-down path and then dropped,
    matching scalp=1).
    """

    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32
    # opt-in w8a8 qkv/mlp_fc1 projections in the trunk (hiera._Dense);
    # the FPN 1×1 convs are a negligible share and stay at ``dtype``
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, list[jnp.ndarray]]:
        cfg = self.cfg
        trunk_outs = Hiera(
            cfg.hiera, dtype=self.dtype, quant_int8=self.quant_int8, name="trunk"
        )(x)
        # lateral 1×1 convs, low-res → high-res processing with top-down adds
        n = len(trunk_outs)
        laterals = [
            nn.Conv(cfg.d_model, (1, 1), dtype=self.dtype, name=f"neck_conv{i}")(feat)
            for i, feat in enumerate(trunk_outs)
        ]
        # top-down: levels counted high-res=0 … low-res=n-1; top_down_levels
        # {n-2, n-1} receive accumulated coarser signal (fpn_top_down_levels
        # [2, 3] in sam2.1_hiera_l)
        outs: list[jnp.ndarray | None] = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            feat = laterals[i]
            if prev is not None and i >= n - 2:
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                feat = feat + up
            outs[i] = feat
            prev = feat

        keep = outs[: cfg.num_feature_levels]  # scalp: drop stride-32
        features = [f for f in keep]
        pos_enc = [
            jnp.asarray(
                sine_position_encoding(f.shape[1], f.shape[2], cfg.d_model),
                dtype=f.dtype,
            )[None].repeat(f.shape[0], axis=0)
            for f in features
        ]
        return {"backbone_fpn": features, "vision_pos_enc": pos_enc}
