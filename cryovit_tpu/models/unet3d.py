"""3D U-Net baseline on raw voxels (flax).

Parity target: reference ``models/unet3d.py`` — 3-level isotropic U-Net:
AnalysisBlocks 1→16→64→256 (two k3 convs + InstanceNorm eps 1e-3 affine +
GELU, strided-conv pool k2 s2), bottom 256→384→256, SynthesisBlocks with
ConvTranspose k2 s2, skip concat, 1×1 linear projection; output conv k1,
logit clip ±5, sigmoid. Inputs are zero-padded up to multiples of 16 and
un-padded after (reference ``unet3d.py:46, 77-104``).

InstanceNorm3d == GroupNorm with one group per channel (normalizes each
channel over D,H,W per sample).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet3DModule", "PAD_MULTIPLE"]

PAD_MULTIPLE = 16


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=False)


def _instance_norm(channels: int, dtype) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=channels, epsilon=1e-3, dtype=dtype)


class AnalysisBlock(nn.Module):
    """Two k3 convs + InstanceNorm + GELU, returning (pooled, skip)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
            x = _instance_norm(self.features, self.dtype)(x)
            x = _gelu(x)
        skip = x
        x = nn.Conv(self.features, (2, 2, 2), strides=(2, 2, 2), padding="VALID", dtype=self.dtype)(x)
        x = _instance_norm(self.features, self.dtype)(x)
        x = _gelu(x)
        return x, skip


class SynthesisBlock(nn.Module):
    """Transposed-conv upsample, skip concat, 1×1 projection + k3 conv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype)(x)
        x = _instance_norm(self.features, self.dtype)(x)
        x = _gelu(x)
        x = jnp.concatenate([x, skip], axis=-1)
        # 1×1 linear projection over channels (reference LinearProjection)
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = _instance_norm(self.features, self.dtype)(x)
        x = _gelu(x)
        x = nn.Conv(self.features, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        x = _instance_norm(self.features, self.dtype)(x)
        x = _gelu(x)
        return x


class UNet3DModule(nn.Module):
    """3-level 3D U-Net (reference ``unet3d.py:12-104``).

    Input:  ``(B, D, H, W, 1)`` raw voxels, D/H/W multiples of 16 (the data
    pipeline pads; static shapes keep XLA happy — the reference pads
    dynamically inside forward).
    Output: ``(B, D, H, W)`` per-voxel probabilities.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for dim in x.shape[1:4]:
            if dim % PAD_MULTIPLE:
                raise ValueError(
                    f"UNet3D input dims must be multiples of {PAD_MULTIPLE}, got {x.shape}"
                )
        x = x.astype(self.dtype)
        skips = []
        for feats in (16, 64, 256):
            x, skip = AnalysisBlock(feats, dtype=self.dtype)(x)
            skips.append(skip)

        x = nn.Conv(384, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        x = _instance_norm(384, self.dtype)(x)
        x = _gelu(x)
        x = nn.Conv(256, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        x = _instance_norm(256, self.dtype)(x)
        x = _gelu(x)

        for feats in (64, 16, 16):
            x = SynthesisBlock(feats, dtype=self.dtype)(x, skips.pop())

        x = nn.Conv(1, (1, 1, 1), dtype=self.dtype)(x)
        # squeeze the channel BEFORE the elementwise tail: a trailing dim
        # of 1 would sit on the 128-lane axis and blow up backward buffers
        # 128x (observed 17.7 GB for a 138 MB logical tensor)
        x = x[..., 0].astype(jnp.float32)
        x = jnp.clip(x, -5.0, 5.0)
        return nn.sigmoid(x)
