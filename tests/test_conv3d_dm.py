"""Correctness tests for the depth-major Pallas 3D conv (ops/conv3d_dm.py).

The kernel runs in interpret mode on CPU; the XLA ``conv_general_dilated``
with identical semantics is the oracle. The same oracle is what the model
dispatches to off-TPU, so these tests pin the kernel and the fallback to
each other. Shapes cover every CryoVIT decoder tail conv (reference
``models/cryovit.py:52-83``): 8–32 channels, depth-only dilation 1–8,
W ∈ {128, 256, 512}, plus depth shallower than the dilation (boundary
taps must vanish) and non-multiple-of-block row counts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.ops.conv3d_dm import (
    conv3d_dm,
    conv3d_dm_reference,
    conv3d_dm_supported,
)

TAIL_SHAPES = [
    # (b, d, ci, h, w, co, dilation) — decoder tail instances (scaled-down
    # H where the full size only changes the grid length)
    (1, 6, 32, 16, 128, 32, (8, 1, 1)),
    (1, 6, 32, 16, 128, 32, (4, 1, 1)),
    (1, 5, 32, 8, 256, 16, (2, 1, 1)),
    (2, 4, 16, 8, 256, 16, (1, 1, 1)),
    (1, 4, 8, 8, 512, 8, (1, 1, 1)),
    (1, 4, 8, 8, 512, 1, (1, 1, 1)),  # mask head co=1
]


@pytest.mark.parametrize("shape", TAIL_SHAPES)
def test_matches_xla_f32(rng, shape):
    b, d, ci, h, w, co, dil = shape
    x = jnp.asarray(rng.standard_normal((b, d, ci, h, w)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.float32) * 0.1
    assert conv3d_dm_supported(x.shape, k.shape, dil)
    ref = conv3d_dm_reference(x, k, dil)
    out = conv3d_dm(x, k, dil, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_matches_xla_bf16(rng):
    b, d, ci, h, w, co, dil = 1, 5, 16, 10, 128, 16, (2, 1, 1)
    x = jnp.asarray(rng.standard_normal((b, d, ci, h, w)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)), jnp.bfloat16) * 0.1
    ref = conv3d_dm_reference(
        x.astype(jnp.float32), k.astype(jnp.float32), dil
    )
    out = conv3d_dm(x, k, dil, interpret=True).astype(jnp.float32)
    assert out.dtype == jnp.float32
    err = float(
        jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
    )
    assert err < 2e-2  # bf16 inputs, f32 accumulation


def test_depth_shallower_than_dilation(rng):
    # d=3 with dilation 4: every off-center tap is out of range and must
    # contribute exactly zero (clamped index map + in-kernel tap mask)
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)), jnp.float32)
    ref = conv3d_dm_reference(x, k, (4, 1, 1))
    out = conv3d_dm(x, k, (4, 1, 1), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_rows_not_multiple_of_block(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 12, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)), jnp.float32)
    ref = conv3d_dm_reference(x, k, (1, 1, 1))
    out = conv3d_dm(x, k, (1, 1, 1), block_rows=8, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_supported_gate():
    k = (3, 3, 3, 16, 16)
    assert conv3d_dm_supported((1, 4, 16, 8, 128), k, (1, 1, 1))
    # W not lane-aligned / too small
    assert not conv3d_dm_supported((1, 4, 16, 8, 120), k, (1, 1, 1))
    assert not conv3d_dm_supported((1, 4, 16, 8, 64), k, (1, 1, 1))
    # lateral dilation unsupported (reference only dilates depth)
    assert not conv3d_dm_supported((1, 4, 16, 8, 128), k, (1, 2, 1))
    # non-3³ kernel
    assert not conv3d_dm_supported((1, 4, 16, 8, 128), (1, 2, 2, 16, 16), (1, 1, 1))
    # channel constraints
    assert not conv3d_dm_supported((1, 4, 12, 8, 128), (3, 3, 3, 12, 16), (1, 1, 1))


@pytest.mark.parametrize(
    "shape",
    [
        (1, 6, 16, 16, 128, 32, (1, 1, 1)),
        (1, 5, 8, 10, 256, 16, (2, 1, 1)),
        (1, 4, 32, 12, 128, 8, (4, 1, 1)),
        (1, 3, 8, 8, 128, 1, (1, 1, 1)),  # mask head co=1
        (2, 4, 8, 8, 128, 8, (1, 1, 1)),
    ],
)
def test_dw_kernel_matches_autodiff(rng, shape):
    """One-pass 27-tap weight gradient (conv3d_dm_dw) vs autodiff oracle."""
    import jax

    from cryovit_tpu.ops.conv3d_dm import conv3d_dm_dw

    b, d, ci, h, w, co, dil = shape
    x = jnp.asarray(rng.standard_normal((b, d, ci, h, w)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, d, co, h, w)), jnp.float32)
    k0 = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    dw_ref = jax.grad(
        lambda k: jnp.sum(conv3d_dm_reference(x, k, dil) * g)
    )(k0)
    dw = conv3d_dm_dw(x, g, dil, interpret=True)
    # f32 sums over ~1e5 terms: accumulation order differs from autodiff
    np.testing.assert_allclose(
        np.asarray(dw), np.asarray(dw_ref), rtol=1e-3, atol=1e-3
    )


def test_ci1_forward(rng):
    """ci=1 (the mask-head input-gradient conv) is kernel-eligible."""
    x = jnp.asarray(rng.standard_normal((1, 4, 1, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 1, 8)), jnp.float32)
    assert conv3d_dm_supported(x.shape, k.shape, (1, 1, 1))
    ref = conv3d_dm_reference(x, k, (1, 1, 1))
    out = conv3d_dm(x, k, (1, 1, 1), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_grad_path_cpu_fallback(rng):
    """value_and_grad through the model's dispatch on CPU (XLA path) —
    guards the custom VJP wiring in models/cryovit.py."""
    import jax

    from cryovit_tpu.models.cryovit import _conv_dm_core

    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)), jnp.float32) * 0.1

    def loss(x, k):
        return jnp.sum(_conv_dm_core(x, k, (2, 1, 1)) ** 2)

    g_custom = jax.grad(loss, argnums=(0, 1))(x, k)

    def loss_ref(x, k):
        return jnp.sum(conv3d_dm_reference(x, k, (2, 1, 1)) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    for a, b in zip(g_custom, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
