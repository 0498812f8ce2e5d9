"""Correctness tests for the depth-major Pallas 2× ConvTranspose
(ops/convt_dm.py) and its fused dx+dW backward.

Interpret mode on CPU; ``lax.conv_transpose`` (and its autodiff) with
identical semantics is the oracle — the same XLA path the model falls
back to off-TPU. Shapes mirror both decoder instances (reference
``models/cryovit.py:52-83``): 32→32 @128 grid and 16→8 @256 grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.ops.convt_dm import (
    convt2x_dm,
    convt2x_dm_bwd,
    convt2x_dm_reference,
    convt2x_dm_supported,
)

SHAPES = [
    # (b, d, ci, h, w, co)
    (1, 4, 32, 8, 128, 32),
    (1, 3, 16, 8, 256, 8),
    (2, 2, 8, 12, 128, 16),  # batch>1, rows not a block multiple
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(rng, shape):
    b, d, ci, h, w, co = shape
    x = jnp.asarray(rng.standard_normal((b, d, ci, h, w)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 2, ci, co)), jnp.bfloat16) * 0.3
    assert convt2x_dm_supported(x.shape, k.shape, x.dtype)
    ref = convt2x_dm_reference(
        x.astype(jnp.float32), k.astype(jnp.float32)
    )
    out = convt2x_dm(x, k, interpret=True).astype(jnp.float32)
    assert out.shape == ref.shape
    err = float(
        jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
    )
    assert err < 2e-2  # bf16 I/O, f32 accumulation


@pytest.mark.parametrize("shape", SHAPES)
def test_backward_matches_autodiff(rng, shape):
    b, d, ci, h, w, co = shape
    x = jnp.asarray(rng.standard_normal((b, d, ci, h, w)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 2, ci, co)), jnp.float32) * 0.3
    g = jnp.asarray(
        rng.standard_normal((b, d, co, 2 * h, 2 * w)), jnp.float32
    )

    dx_ref, dw_ref = jax.grad(
        lambda x_, k_: jnp.sum(convt2x_dm_reference(x_, k_) * g),
        argnums=(0, 1),
    )(x, k)
    dx, dw = convt2x_dm_bwd(
        g.astype(jnp.bfloat16),
        x.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        interpret=True,
    )
    e_dx = float(
        jnp.max(jnp.abs(dx.astype(jnp.float32) - dx_ref))
        / (jnp.max(jnp.abs(dx_ref)) + 1e-9)
    )
    e_dw = float(
        jnp.max(jnp.abs(dw - dw_ref)) / (jnp.max(jnp.abs(dw_ref)) + 1e-9)
    )
    assert e_dx < 3e-2 and e_dw < 3e-2


def test_model_xla_fallback_grads(rng):
    """The model's custom VJP (explicit XLA formulas used off-TPU) must
    match autodiff of lax.conv_transpose exactly."""
    from cryovit_tpu.models.cryovit import _convt_core

    x = jnp.asarray(rng.standard_normal((1, 3, 16, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 2, 16, 8)), jnp.float32) * 0.3

    def loss(x, k):
        return jnp.sum(_convt_core(x, k) ** 2)

    g_custom = jax.grad(loss, argnums=(0, 1))(x, k)

    def loss_ref(x, k):
        return jnp.sum(convt2x_dm_reference(x, k) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    for a, b in zip(g_custom, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_supported_gate():
    k = (1, 2, 2, 16, 8)
    assert convt2x_dm_supported((1, 4, 16, 8, 128), k, jnp.bfloat16)
    # the column interleave is a 16-bit pack: f32 unsupported
    assert not convt2x_dm_supported((1, 4, 16, 8, 128), k, jnp.float32)
    assert not convt2x_dm_supported((1, 4, 16, 8, 120), k, jnp.bfloat16)
    assert not convt2x_dm_supported(
        (1, 4, 16, 8, 128), (1, 3, 3, 16, 8), jnp.bfloat16
    )
