"""Torch-parity tests for the matmul-form bicubic resize."""

import numpy as np
import jax.numpy as jnp
import pytest

from cryovit_tpu.ops.resize import bicubic_resize_matrix, resize_bicubic_2d

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("hw", [(32, 32), (48, 64), (160, 112)])
def test_bicubic_14_16_matches_torch(rng, hw):
    h, w = hw
    x = rng.standard_normal((3, h, w)).astype(np.float32)
    out_h, out_w = h * 14 // 16, w * 14 // 16

    ours = np.asarray(resize_bicubic_2d(jnp.asarray(x), out_h, out_w))

    tx = torch.from_numpy(x)[None]  # (1, C, H, W)
    ref = torch.nn.functional.interpolate(
        tx, scale_factor=(14 / 16, 14 / 16), mode="bicubic"
    )[0].numpy()
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bicubic_upscale_matches_torch(rng):
    x = rng.standard_normal((1, 16, 16)).astype(np.float32)
    ours = np.asarray(resize_bicubic_2d(jnp.asarray(x), 37, 23))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], size=(37, 23), mode="bicubic"
    )[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_matrix_rows_sum_to_one():
    m = np.asarray(bicubic_resize_matrix(64, 56))
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_identity_resize():
    x = np.random.default_rng(0).standard_normal((4, 8, 8)).astype(np.float32)
    out = np.asarray(resize_bicubic_2d(jnp.asarray(x), 8, 8))
    np.testing.assert_allclose(out, x, atol=1e-5)
