"""Closed-form and masking tests for losses and metrics."""

import numpy as np
import jax.numpy as jnp

from cryovit_tpu.models.losses import DiceLoss, FocalLoss, dice_loss
from cryovit_tpu.models.metrics import DiceMetric, F1Metric, MetricState


def test_dice_loss_perfect_prediction():
    y = jnp.ones((2, 4, 4))
    mask = jnp.ones_like(y, dtype=bool)
    # 1 - 2*16*2/(32+32+1e-3) ≈ 0 for perfect overlap
    assert float(dice_loss(y, y, mask)) < 1e-4


def test_dice_loss_disjoint():
    y_true = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 4))])
    y_pred = jnp.concatenate([jnp.zeros((1, 4)), jnp.ones((1, 4))])
    mask = jnp.ones_like(y_true, dtype=bool)
    assert float(dice_loss(y_pred, y_true, mask)) > 0.999


def test_dice_loss_closed_form():
    # y_true = [1,1,0,0], y_pred = [1,0.5,0.5,0]
    y_true = jnp.array([1.0, 1.0, 0.0, 0.0])
    y_pred = jnp.array([1.0, 0.5, 0.5, 0.0])
    mask = jnp.ones(4, dtype=bool)
    expected = 1 - 2 * 1.5 / (2 + 2 + 1e-3)
    np.testing.assert_allclose(float(dice_loss(y_pred, y_true, mask)), expected, rtol=1e-6)


def test_dice_loss_mask_excludes_padding():
    y_true = jnp.array([1.0, 1.0, -1.0, -1.0])
    y_pred = jnp.array([1.0, 1.0, 0.9, 0.9])
    mask = y_true > -1
    # padding voxels with high predictions must not change the loss
    full = dice_loss(y_pred[:2], y_true[:2], jnp.ones(2, dtype=bool))
    masked = dice_loss(y_pred, y_true, mask)
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_focal_loss_finite_and_masked():
    fn = FocalLoss()
    y_true = jnp.array([1.0, 0.0, -1.0])
    y_pred = jnp.array([0.9, 0.1, 0.99])
    mask = y_true > -1
    val = float(fn(y_pred, y_true, mask))
    assert np.isfinite(val) and val >= 0
    # fully confident correct predictions → near-zero loss
    near0 = float(fn(jnp.array([1.0, 0.0]), jnp.array([1.0, 0.0]), jnp.ones(2, dtype=bool)))
    assert near0 < 1e-4


def test_dice_metric_thresholding():
    m = DiceMetric(threshold=0.5)
    y_true = jnp.array([1.0, 1.0, 0.0, 0.0])
    y_pred = jnp.array([0.6, 0.4, 0.6, 0.4])  # hard: [1,0,1,0]
    mask = jnp.ones(4, dtype=bool)
    # intersection 1, denom 2+2 → 2/(4+1e-3)
    np.testing.assert_allclose(float(m(y_pred, y_true, mask)), 2 / 4.001, rtol=1e-5)
    # exact-threshold value counts as positive (reference: < thresh → 0)
    at_thresh = float(m(jnp.array([0.5]), jnp.array([1.0]), jnp.ones(1, dtype=bool)))
    assert at_thresh > 0.9


def test_f1_metric_closed_form():
    m = F1Metric()
    y_true = jnp.array([1.0, 1.0, 0.0, 0.0])
    y_pred = jnp.array([0.9, 0.1, 0.9, 0.1])  # tp=1 fp=1 fn=1
    mask = jnp.ones(4, dtype=bool)
    p = 1 / (2 + 1e-6)
    r = 1 / (2 + 1e-6)
    expected = 2 * p * r / (p + r + 1e-6)
    np.testing.assert_allclose(float(m(y_pred, y_true, mask)), expected, rtol=1e-5)


def test_metric_state_accumulation():
    st = MetricState.zero()
    for s in (0.5, 0.7, 0.9):
        st = st.update(jnp.asarray(s))
    np.testing.assert_allclose(float(st.compute()), 0.7, rtol=1e-6)
    merged = st.merge(MetricState(total=jnp.asarray(0.3), count=jnp.asarray(1.0)))
    np.testing.assert_allclose(float(merged.compute()), 0.6, rtol=1e-6)
    assert float(MetricState.zero().compute()) == 0.0


def test_loss_names():
    assert DiceLoss().name == "DiceLoss"
    assert FocalLoss().name == "FocalLoss"
    assert DiceMetric(0.5).name == "DiceMetric"
    assert F1Metric().name == "F1Metric"
