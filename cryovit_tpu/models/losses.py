"""Segmentation losses (masked, static-shape).

Parity target: reference ``models/losses.py`` (DiceLoss 8-32, FocalLoss
35-67). The reference masks sparse labels by boolean indexing
(``base_model.py:91-112``, ``y_pred[y_true > -1]``) which is a dynamic-shape
op; here every loss takes an explicit ``mask`` and computes mask-weighted
sums — mathematically identical, and jit/pjit friendly (padding and sparse
voxels contribute exactly zero).

All losses take probabilities in [0, 1] (the models clip logits to ±5 and
apply sigmoid, reference ``cryovit.py:42-49``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dice_loss", "focal_loss", "DiceLoss", "FocalLoss"]


def _gsum(x: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    """Global masked sum: a plain sum, psum-ed across a shard_map/pmap axis
    when ``axis_name`` is given. Every loss here is a function of global
    masked sums, so threading the psum through the sums makes the sharded
    data-parallel loss *exactly the same math* as the single-device loss
    (not a mean-of-per-shard-losses approximation).

    The psum rides outside the gradient path (``stop_gradient`` of the
    remote remainder): the VALUE is global, while AD sees only the local
    sum with coefficient 1 — so each device's gradient is exactly its
    local-data contribution evaluated at the global sums, and the
    trainer's ``psum(grads)`` is exactly the global-batch gradient. (AD
    *through* psum is transpose-convention dependent — under
    ``check_vma=False`` psum transposes to psum, which would scale the
    replicated cotangent by the mesh size.)"""
    s = jnp.sum(x)
    if axis_name is None:
        return s
    return s + jax.lax.stop_gradient(jax.lax.psum(s, axis_name) - s)


def dice_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    mask: jnp.ndarray,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Soft Dice loss: ``1 − 2·Σ(y·ŷ) / (Σy + Σŷ + 1e-3)`` over masked voxels."""
    mask = mask.astype(y_pred.dtype)
    y_true = y_true.astype(y_pred.dtype) * mask
    y_pred = y_pred * mask
    intersection = _gsum(y_true * y_pred, axis_name)
    denom = _gsum(y_true, axis_name) + _gsum(y_pred, axis_name)
    return 1.0 - (2.0 * intersection) / (denom + 1e-3)


def focal_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    mask: jnp.ndarray,
    gamma: float = 2.0,
    eps: float = 1e-7,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Focal loss on probabilities with dynamic class-balance alpha.

    alpha = background fraction of the masked voxels (reference
    ``losses.py:58-60``), gamma focuses on hard examples. Note: the reference
    feeds *probabilities* into torchvision's ``sigmoid_focal_loss``, which
    re-applies a sigmoid — an apparent double-sigmoid bug (focal loss is not
    in the default config). This implementation applies the standard focal
    form directly on probabilities instead.
    """
    mask = mask.astype(y_pred.dtype)
    y_true = y_true.astype(y_pred.dtype)
    total = jnp.maximum(_gsum(mask, axis_name), 1.0)
    alpha = _gsum((1.0 - y_true) * mask, axis_name) / total  # background frac

    p = jnp.clip(y_pred, eps, 1.0 - eps)
    ce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
    p_t = y_true * p + (1.0 - y_true) * (1.0 - p)
    alpha_t = y_true * alpha + (1.0 - y_true) * (1.0 - alpha)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * ce
    return _gsum(loss * mask, axis_name) / total


class DiceLoss:
    """Config-instantiable wrapper around :func:`dice_loss`."""

    name = "DiceLoss"

    def __call__(self, y_pred, y_true, mask, axis_name=None):
        return dice_loss(y_pred, y_true, mask, axis_name=axis_name)


class FocalLoss:
    """Config-instantiable wrapper around :func:`focal_loss`."""

    name = "FocalLoss"

    def __init__(self, gamma: float = 2.0, **_: object) -> None:
        self.gamma = gamma

    def __call__(self, y_pred, y_true, mask, axis_name=None):
        return focal_loss(y_pred, y_true, mask, gamma=self.gamma, axis_name=axis_name)
