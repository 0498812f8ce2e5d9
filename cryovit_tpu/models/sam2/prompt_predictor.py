"""3D U-Net prompt predictor for SAM2 (flax).

Parity target: reference ``models/sam2_blocks.py:14-223`` — a small 3D
U-Net over the level-0 (stride-4, 256-ch) backbone features predicting a
per-slice dense mask prompt and a normalized box per slice:

- ``PromptConvBlock``: Conv3d(k3, bias=False) + InstanceNorm3d
  (no affine, eps 1e-5) + exact GELU,
- ``PromptInConv``: 2 conv blocks; ``PromptDownBlock``: MaxPool3d(2) + 2
  conv blocks; ``PromptUpBlock``: trilinear align_corners=True upsample
  to the skip size, concat, then 2 conv blocks (reference ``:105-119``),
- mask head: 1×1×1 conv + 4× BILINEAR align_corners=True upsample
  (reference ``:216-221``),
- box head: per-slice global average pool + Linear → sigmoid, corners
  ``(x1y1, x1y1 + wh)`` with no clipping (reference ``:122-143``).

Channel multipliers [1, 2, 4, 8, 10] × hidden 16, depth 4.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cryovit_tpu.ops.resize import linear_resize_matrix

__all__ = ["PromptPredictor"]


def _instance_norm(c: int) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=c, epsilon=1e-5, use_bias=False, use_scale=False)


class _ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        # normalization stats in f32 (bf16 variance over a 128x128 plane
        # loses too many bits); output joins the stream at the compute dtype
        x = _instance_norm(self.features)(x.astype(jnp.float32))
        return nn.gelu(x, approximate=False).astype(self.dtype)


def _resize_align_corners(x: jnp.ndarray, shape: tuple[int, int, int]) -> jnp.ndarray:
    """(B, D, H, W, C) → trilinear align_corners=True resize of D/H/W
    (torch F.interpolate convention the reference uses), as separable
    matrix contractions on the MXU."""
    out = x
    for axis, size in enumerate(shape):
        in_size = out.shape[axis + 1]
        if in_size == size:
            continue
        mat = jnp.asarray(linear_resize_matrix(in_size, size), dtype=out.dtype)
        out = jnp.moveaxis(
            jnp.tensordot(mat, jnp.moveaxis(out, axis + 1, 0), axes=(1, 0)),
            0,
            axis + 1,
        )
    return out


class PromptPredictor(nn.Module):
    """U-Net over (B, D, h0, w0, C) level-0 features → per-slice box + mask."""

    in_channels: int = 256
    hidden_channels: int = 16
    depth: int = 4
    channel_mults: tuple[int, ...] = (1, 2, 4, 8, 10)
    scale_factor: int = 4  # SAM2's stride-4 patch embedding
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """feats (B, D, h, w, C) → (boxes (B·D, 4) in [0,1],
        mask prompts (B·D, 4h, 4w, 1))."""
        b, d, h, w, _ = feats.shape
        ch = [m * self.hidden_channels for m in self.channel_mults]

        x = _ConvBlock(ch[0], dtype=self.dtype, name="in0")(feats)
        x = _ConvBlock(ch[0], dtype=self.dtype, name="in1")(x)

        skips = []
        for i in range(self.depth):
            skips.append(x)
            # pool only dims that can still halve (shallow z-stacks keep D;
            # the reference asserts its inputs stay poolable instead)
            win = tuple(2 if x.shape[k + 1] >= 2 else 1 for k in range(3))
            x = nn.max_pool(x, win, strides=win)
            x = _ConvBlock(ch[i + 1], dtype=self.dtype, name=f"down{i}_0")(x)
            x = _ConvBlock(ch[i + 1], dtype=self.dtype, name=f"down{i}_1")(x)

        for i in reversed(range(self.depth)):
            skip = skips.pop()
            x = _resize_align_corners(x, skip.shape[1:4])
            x = jnp.concatenate([skip, x], axis=-1)
            x = _ConvBlock(ch[i], dtype=self.dtype, name=f"up{i}_0")(x)
            x = _ConvBlock(ch[i], dtype=self.dtype, name=f"up{i}_1")(x)

        # dense mask prompt: 1-channel, 4× bilinear (align_corners=True)
        prompt = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="prompt_out")(x)
        prompt = prompt.astype(jnp.float32)  # (B, D, h, w, 1) mask logits
        prompt = prompt.reshape(b * d, h, w, 1)
        prompt = _resize_align_corners(
            prompt[:, None], (1, h * self.scale_factor, w * self.scale_factor)
        )[:, 0, ..., 0][..., None]

        # box: global average pool per slice + linear → (x1y1, x1y1+wh)
        pooled = x.astype(jnp.float32).mean(axis=(2, 3)).reshape(b * d, -1)
        box = nn.sigmoid(nn.Dense(4, name="box_out")(pooled))
        x1y1 = box[:, :2]
        x2y2 = x1y1 + box[:, 2:]
        boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
        return boxes, prompt
