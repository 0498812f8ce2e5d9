"""Segmentation metrics (masked, static-shape, psum-compatible).

Parity target: reference ``models/metrics.py`` (DiceMetric 8-53, F1Metric
56-93). Each metric returns a per-batch score; epoch aggregation is a
(sum, count) pair — exactly torchmetrics' ``dist_reduce_fx="sum"`` state,
which under pjit becomes a ``psum`` over the data axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["dice_metric", "f1_metric", "DiceMetric", "F1Metric", "MetricState"]


def _gsum(x: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    """Global masked sum (psum across a shard_map axis when named) — see
    ``losses._gsum``: makes dp-sharded metrics exactly the global value
    (psum outside the gradient path; metrics are not differentiated, but
    keeping the two helpers identical avoids a footgun)."""
    s = jnp.sum(x)
    if axis_name is None:
        return s
    return s + jax.lax.stop_gradient(jax.lax.psum(s, axis_name) - s)


def dice_metric(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: float = 0.5,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Hard-threshold Dice score over masked voxels (reference ``metrics.py:31-46``)."""
    mask = mask.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32) * mask
    hard = jnp.where(y_pred < threshold, 0.0, 1.0) * mask
    intersection = _gsum(y_true * hard, axis_name)
    denom = _gsum(y_true, axis_name) + _gsum(hard, axis_name)
    return 2.0 * intersection / (denom + 1e-3)


def f1_metric(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    mask: jnp.ndarray,
    threshold: float = 0.5,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Per-batch F1 at ``threshold`` (reference ``metrics.py:74-87``)."""
    mask = mask.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    hard = (y_pred > threshold).astype(jnp.float32)
    tp = _gsum(y_true * hard * mask, axis_name)
    fp = _gsum((1.0 - y_true) * hard * mask, axis_name)
    fn = _gsum(y_true * (1.0 - hard) * mask, axis_name)
    precision = tp / (tp + fp + 1e-6)
    recall = tp / (tp + fn + 1e-6)
    return 2.0 * precision * recall / (precision + recall + 1e-6)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MetricState:
    """(Σ score, #batches) accumulator — a jax pytree so it lives on device.

    ``merge`` is associative; under a mesh the totals reduce with ``psum``
    (the reference declares the same via torchmetrics dist_reduce_fx=sum).
    """

    total: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def zero(cls) -> "MetricState":
        return cls(total=jnp.zeros(()), count=jnp.zeros(()))

    def update(self, score: jnp.ndarray) -> "MetricState":
        return MetricState(total=self.total + score, count=self.count + 1.0)

    def merge(self, other: "MetricState") -> "MetricState":
        return MetricState(self.total + other.total, self.count + other.count)

    def compute(self) -> jnp.ndarray:
        return jnp.where(self.count > 0, self.total / jnp.maximum(self.count, 1.0), 0.0)


class DiceMetric:
    """Config-instantiable wrapper around :func:`dice_metric`."""

    name = "DiceMetric"
    higher_is_better = True

    def __init__(self, threshold: float = 0.5, **_: object) -> None:
        self.threshold = threshold

    def __call__(self, y_pred, y_true, mask, axis_name=None):
        return dice_metric(
            y_pred, y_true, mask, threshold=self.threshold, axis_name=axis_name
        )


class F1Metric:
    """Config-instantiable wrapper around :func:`f1_metric`."""

    name = "F1Metric"
    higher_is_better = True

    def __init__(self, threshold: float = 0.5, **_: object) -> None:
        self.threshold = threshold

    def __call__(self, y_pred, y_true, mask, axis_name=None):
        return f1_metric(
            y_pred, y_true, mask, threshold=self.threshold, axis_name=axis_name
        )
