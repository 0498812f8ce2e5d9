"""Host-side preprocessing for ViT feature extraction.

Parity target: reference ``datasets/file_dataset.py:190-250`` (DINO/SAM
transforms). TPU-first split of responsibilities:

- **host** (here, numpy): pad H/W up to multiples of 16 with edge values —
  cheap, shape-changing, once per tomogram;
- **device** (inside the jitted extractor): ImageNet normalization, bicubic
  14/16 resize (matmul form, :mod:`cryovit_tpu.ops.resize`), and channel
  handling — bandwidth-bound elementwise work that XLA fuses into the ViT's
  first ops, instead of burning DataLoader CPU like the reference.

The reference's grayscale slices are replicated to 3 RGB channels and then
normalized per-channel; since all three channels are identical, only
channel 0's statistics matter downstream (the reference keeps channel 0,
``file_dataset.py:225``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cryovit_tpu.ops.resize import resize_bicubic_2d
from cryovit_tpu.types import pad_to, round_up

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "pad_slices_to_multiple",
    "dino_device_preprocess",
    "dino_grid_shape",
    "sam_host_preprocess",
]

# torchvision IMAGENET_DEFAULT_MEAN/STD (reference vit_dataset.py imports)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

DINO_PATCH_SIZE = 14


def pad_slices_to_multiple(data: np.ndarray, multiple: int = 16) -> np.ndarray:
    """Edge-pad the trailing H/W of a ``(D, H, W)`` stack up to multiples of
    ``multiple`` (reference ``file_dataset.py:207-219``)."""
    d, h, w = data.shape[-3:]
    target = data.shape[:-2] + (round_up(h, multiple), round_up(w, multiple))
    return pad_to(data, target, mode="edge")


def dino_grid_shape(h: int, w: int) -> tuple[int, int]:
    """DINO patch-grid (gh, gw) for a padded (h, w) slice: the 14/16 rescale
    maps 16 voxels onto one 14-px patch, so grid = (h//16, w//16)."""
    if h % 16 or w % 16:
        raise ValueError(f"slice dims must be multiples of 16, got {(h, w)}")
    return h // 16, w // 16


def dino_device_preprocess(
    slices: jnp.ndarray, normalize: bool = False
) -> jnp.ndarray:
    """On-device DINO preprocessing of a ``(B, H, W)`` f32 [0,1] slice batch:
    bicubic 14/16 resize (torch conventions) → ``(B, H·14/16, W·14/16)``.

    ``normalize=False`` is correct for weights converted with the default
    ``tools/convert_dinov2.py`` settings — ImageNet normalization AND the
    3-channel replication are folded into the patch-embed kernel there
    (``models/dinov2.py:fold_patch_embed``). Pass ``normalize=True`` only
    with weights converted via ``--no-normalize``... which themselves fold
    only the channel replication (the reference experiment path skips
    normalization entirely, SURVEY §2.3).
    """
    h, w = slices.shape[-2:]
    out_h = h // 16 * DINO_PATCH_SIZE
    out_w = w // 16 * DINO_PATCH_SIZE
    x = slices.astype(jnp.float32)
    if normalize:
        x = (x - IMAGENET_MEAN[0]) / IMAGENET_STD[0]
    return resize_bicubic_2d(x, out_h, out_w)


def sam_host_preprocess(data: np.ndarray) -> np.ndarray:
    """SAM preprocessing of a ``(D, H, W)`` stack: the reference only expands
    to RGB (B, D, C, H, W) on host (``file_dataset.py:233-250``); the 512-px
    trilinear resize happens inside the SAM forward. Here we keep the stack
    single-channel ``(D, H, W)`` — channel replication is folded on device.
    """
    return np.ascontiguousarray(data.astype(np.float32))
