"""CryoVIT 3D convolutional decoder over DINOv2 features (flax).

Parity target: reference ``models/cryovit.py`` — 1×1×1 projection 1536→1024,
four SynthesisBlocks (GroupNorm eps 1e-3, two k=3 convs with depth-only
dilations, 2× lateral ConvTranspose), output head with logit clip ±5 and
sigmoid. Net effect: 16× H/W upsampling from the DINO patch grid back to
voxel resolution; depth untouched.

TPU-native design notes:
- channels-last ``(B, D, H, W, C)`` layout so XLA maps convs onto the MXU
  without layout transposes,
- exact (erf) GELU to match torch's default,
- a ``dtype`` policy for bf16 compute with f32 params (replaces the
  reference's Lightning "16-mixed").
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CryoVITModule", "SynthesisBlock"]


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=False)


class SynthesisBlock(nn.Module):
    """Anisotropic upscaling block (reference ``cryovit.py:52-83``).

    GroupNorm(max(8, C//8) groups, eps 1e-3) → Conv3d k3 dilation (d1,1,1)
    → GELU → Conv3d k3 dilation (d2,1,1) → GELU → ConvTranspose (1,2,2)
    stride (1,2,2) → GELU. Dilations act on depth only: the receptive field
    spans many z-slices while H/W stay local.
    """

    c2: int
    c3: int
    d1: int
    d2: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c1 = x.shape[-1]
        x = nn.GroupNorm(
            num_groups=max(8, c1 // 8), epsilon=1e-3, dtype=self.dtype
        )(x)
        x = nn.Conv(
            self.c2,
            kernel_size=(3, 3, 3),
            kernel_dilation=(self.d1, 1, 1),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        x = _gelu(x)
        x = nn.Conv(
            self.c2,
            kernel_size=(3, 3, 3),
            kernel_dilation=(self.d2, 1, 1),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        x = _gelu(x)
        x = nn.ConvTranspose(
            self.c3, kernel_size=(1, 2, 2), strides=(1, 2, 2), dtype=self.dtype
        )(x)
        return _gelu(x)


class CryoVITModule(nn.Module):
    """CryoVIT decoder head (reference ``cryovit.py:11-49``).

    Input:  ``(B, D, h, w, 1536)`` DINOv2 patch features (h = H/16).
    Output: ``(B, D, 16·h, 16·w)`` per-voxel probabilities.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(1024, kernel_size=(1, 1, 1), dtype=self.dtype)(x)
        x = _gelu(x)
        x = SynthesisBlock(192, 128, d1=32, d2=24, dtype=self.dtype)(x)
        x = SynthesisBlock(64, 32, d1=16, d2=12, dtype=self.dtype)(x)
        x = SynthesisBlock(32, 32, d1=8, d2=4, dtype=self.dtype)(x)
        x = SynthesisBlock(16, 8, d1=2, d2=1, dtype=self.dtype)(x)
        x = nn.Conv(8, kernel_size=(3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        x = _gelu(x)
        x = nn.Conv(1, kernel_size=(3, 3, 3), padding="SAME", dtype=self.dtype)(x)
        x = jnp.clip(x.astype(jnp.float32), -5.0, 5.0)
        return nn.sigmoid(x[..., 0])
