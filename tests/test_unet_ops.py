"""Oracle tests for UNet3D's matmul-form stride-2 ops and layout variants.

The k=2³ stride-2 pool conv and ConvTranspose are reformulated as one
matmul plus a parity gather/scatter transpose (``models/unet3d.py``) —
a transposed-axis regression there would produce wrong-but-finite outputs
that the shape/range model tests cannot catch. These pin every variant
(channels-last and depth-major, both layout-crossing forms) to the
``lax`` convolution oracles, and the whole depth-major level-1 module
path to an all-XLA channels-last replica.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cryovit_tpu.models.unet3d import (
    _convt2_cl,
    _convt2_dm_out,
    _pool2_cl,
    _pool2_dm,
)


@pytest.fixture
def shapes(rng):
    b, d, h, w, ci, co = 2, 4, 8, 8, 3, 5
    x = jnp.asarray(rng.standard_normal((b, d, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 2, ci, co)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    return x, k, bias


def test_pool2_cl_matches_lax(shapes):
    x, k, bias = shapes
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    out = _pool2_cl(x, k, bias, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pool2_dm_matches_lax(shapes):
    x, k, bias = shapes
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    out = _pool2_dm(jnp.moveaxis(x, -1, 2), k, bias, jnp.float32)
    # depth-major pool emits channels-last directly
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_convt2_cl_matches_lax(shapes):
    x, k, bias = shapes
    ref = jax.lax.conv_transpose(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=False,
    ) + bias
    out = _convt2_cl(x, k, bias, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_convt2_dm_out_matches_lax(shapes):
    x, k, bias = shapes
    ref = jax.lax.conv_transpose(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        transpose_kernel=False,
    ) + bias
    out = _convt2_dm_out(x, k, bias, jnp.float32)
    # channels-last input → depth-major output
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(out, 2, -1)), np.asarray(ref), atol=1e-5
    )


def test_module_matches_all_xla_replica(rng):
    """The mixed-layout UNet3D forward must equal an all-lax replica built
    from the same parameters (pins the depth-major level-1 path and every
    layout crossing end to end)."""
    from flax import linen as nn

    from cryovit_tpu.models.unet3d import UNet3DModule

    x = jnp.asarray(rng.standard_normal((1, 16, 32, 32, 1)), jnp.float32)
    module = UNet3DModule(dtype=jnp.float32)
    params = module.init(jax.random.key(0), x)
    out = module.apply(params, x)

    # all-XLA replica consuming the identical parameter tree
    p = params["params"]

    def conv(x, pp, dilation=(1, 1, 1), strides=(1, 1, 1), padding="SAME"):
        return jax.lax.conv_general_dilated(
            x, pp["kernel"], strides, padding, rhs_dilation=dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + pp["bias"]

    def convt(x, pp):
        return jax.lax.conv_transpose(
            x, pp["kernel"], (2, 2, 2), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=False,
        ) + pp["bias"]

    def inorm(x, pp, c):
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = x.var(axis=(1, 2, 3), keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-3)
        return xn * pp["scale"] + pp["bias"]

    def gelu(x):
        return nn.gelu(x, approximate=False)

    z = x
    skips = []
    for bi, feats in enumerate((16, 64, 256)):
        bp = p[f"AnalysisBlock_{bi}"]
        for i in range(2):
            z = gelu(inorm(conv(z, bp[f"Conv_{i}"]), bp[f"GroupNorm_{i}"], feats))
        skips.append(z)
        z = gelu(
            inorm(
                conv(z, bp["Conv_2"], strides=(2, 2, 2), padding="VALID"),
                bp["GroupNorm_2"],
                feats,
            )
        )
    z = gelu(inorm(conv(z, p["Conv_0"]), p["GroupNorm_0"], 384))
    z = gelu(inorm(conv(z, p["Conv_1"]), p["GroupNorm_1"], 256))
    for bi, feats in enumerate((64, 16, 16)):
        bp = p[f"SynthesisBlock_{bi}"]
        z = gelu(inorm(convt(z, bp["ConvTranspose_0"]), bp["GroupNorm_0"], feats))
        z = jnp.concatenate([z, skips.pop()], axis=-1)
        z = z @ bp["Dense_0"]["kernel"] + bp["Dense_0"]["bias"]
        z = gelu(inorm(z, bp["GroupNorm_1"], feats))
        z = gelu(inorm(conv(z, bp["Conv_0"]), bp["GroupNorm_2"], feats))
    z = conv(z, p["Conv_2"])[..., 0]
    ref = jax.nn.sigmoid(jnp.clip(z.astype(jnp.float32), -5.0, 5.0))

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
