"""Bicubic resize with torch ``F.interpolate`` parity, as matrix multiplies.

The reference preprocesses every slice with
``F.interpolate(scale_factor=14/16, mode="bicubic")`` so one 14-px DINO patch
covers 16 original voxels (``datasets/file_dataset.py:190-231``). Feature
quality depends on reproducing torch's conventions exactly:

- half-pixel sampling: ``src = (dst + 0.5) * (in/out) - 0.5``,
- Keys cubic kernel with ``A = -0.75`` (torch/OpenCV; PIL/TF/jax use −0.5),
- border clamping of the 4 taps.

TPU-native design: separable resize is expressed as two small dense
matmuls (``out = Rh @ x @ Rwᵀ``) instead of a gather — the sampling matrices
are static per shape, XLA lifts them to constants, and the work lands on the
MXU. This is both exact and faster than gather-based interpolation on TPU.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["bicubic_resize_matrix", "resize_bicubic_2d", "resize_slices"]


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch bicubic uses A = −0.75)."""
    at = np.abs(t)
    at2 = at * at
    at3 = at2 * at
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0,
        np.where(at < 2.0, a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


@lru_cache(maxsize=64)
def bicubic_resize_matrix(in_size: int, out_size: int, a: float = -0.75) -> np.ndarray:
    """Dense ``(out_size, in_size)`` resampling matrix matching torch bicubic
    (align_corners=False, half-pixel centers, clamped borders).

    Returns numpy (not a device array): the cache must never hold values
    created under a jit trace, and XLA constant-folds the numpy operand.
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - frac, a=a)
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return mat.astype(np.float32)


def resize_bicubic_2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize the last two axes of ``x`` (…, H, W) with torch-parity bicubic."""
    h, w = x.shape[-2], x.shape[-1]
    rh = bicubic_resize_matrix(h, out_h)
    rw = bicubic_resize_matrix(w, out_w)
    y = jnp.einsum("oh,...hw->...ow", rh, x.astype(jnp.float32))
    return jnp.einsum("pw,...ow->...op", rw, y)


def resize_slices(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize a slice stack ``(D, H, W)`` or batch ``(B, D, H, W)``."""
    return resize_bicubic_2d(x, out_h, out_w)


def linear_resize_matrix(
    in_size: int, out_size: int, align_corners: bool = True
) -> np.ndarray:
    """Linear interpolation matrix ``(out, in)``.

    ``align_corners=True`` matches torch ``F.interpolate(...,
    mode="bilinear"/"trilinear", align_corners=True)`` — the convention the
    reference PromptPredictor uses for its skip-connection and 4× prompt
    upsampling (reference ``models/sam2_blocks.py:114-116, 216-221``).
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = np.clip((dst + 0.5) * in_size / out_size - 0.5, 0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = np.clip(src - i0, 0.0, 1.0)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (dst.astype(np.int64), i0), 1.0 - w)
    np.add.at(mat, (dst.astype(np.int64), i1), w)
    return mat.astype(np.float32)
