"""3D U-Net baseline on raw voxels (flax).

Parity target: reference ``models/unet3d.py`` — 3-level isotropic U-Net:
AnalysisBlocks 1→16→64→256 (two k3 convs + InstanceNorm eps 1e-3 affine +
GELU, strided-conv pool k2 s2), bottom 256→384→256, SynthesisBlocks with
ConvTranspose k2 s2, skip concat, 1×1 linear projection; output conv k1,
logit clip ±5, sigmoid. Inputs are zero-padded up to multiples of 16 and
un-padded after (reference ``unet3d.py:46, 77-104``).

InstanceNorm3d == GroupNorm with one group per channel (normalizes each
channel over D,H,W per sample).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# shared conv helpers: channels-last conv with the tap-dot weight gradient
# (XLA's conv-backward-filter runs at ~21% MXU on these shapes), the
# depth-major Pallas conv core + GroupNorm (level 1 runs depth-major:
# 16 channels on the 128-lane axis waste 88% of every vector op, so W
# takes the lane axis there), and the explicit param holders that mirror
# nn.Conv's / nn.Dense's trees
from cryovit_tpu.models.cryovit import (
    _ConvParams,
    _NormParams,
    _conv_cl,
    _conv_dm_core,
    _group_norm_dm,
)

__all__ = ["UNet3DModule", "PAD_MULTIPLE"]

PAD_MULTIPLE = 16


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=False)


def _instance_norm(channels: int, dtype) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=channels, epsilon=1e-3, dtype=dtype)


def _pool2_cl(x, kernel, bias, dtype):
    """k=2³ stride-2 VALID conv as ONE matmul: a free row-major split, one
    transpose that gathers the 2×2×2 taps next to C, and a (8C → Co) dot.
    XLA's native lowering of the same op ran at ~2.5% of HBM bandwidth
    (4.16 ms where this form streams the bytes in ~1 ms)."""
    x = x.astype(dtype)
    b, d, h, w, c = x.shape
    xr = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    xr = xr.reshape(b, d // 2, h // 2, w // 2, 8 * c)
    # (2,2,2,Ci,Co) rows ordered (a,b,c,ci) — matches the transpose above
    y = xr @ kernel.astype(dtype).reshape(8 * c, -1)
    return y + bias.astype(dtype)


def _pool2_dm(x, kernel, bias, dtype):
    """Pool matmul for DEPTH-MAJOR input ``(B, D, C, H, W)``; the tap
    gather transpose absorbs the layout change for free — output is
    channels-last for the next (wider) level."""
    x = x.astype(dtype)
    b, d, c, h, w = x.shape
    xr = x.reshape(b, d // 2, 2, c, h // 2, 2, w // 2, 2)
    xr = xr.transpose(0, 1, 4, 6, 2, 5, 7, 3)
    xr = xr.reshape(b, d // 2, h // 2, w // 2, 8 * c)
    y = xr @ kernel.astype(dtype).reshape(8 * c, -1)
    return y + bias.astype(dtype)


def _convt2_dm_out(x, kernel, bias, dtype):
    """ConvTranspose matmul from channels-last input to DEPTH-MAJOR
    output ``(B, 2D, Co, 2H, 2W)`` — the parity scatter transpose absorbs
    the layout change for free."""
    x = x.astype(dtype)
    b, d, h, w, c = x.shape
    co = kernel.shape[-1]
    kmat = jnp.flip(kernel.astype(dtype), (0, 1, 2)).transpose(3, 0, 1, 2, 4)
    t = (x @ kmat.reshape(c, 8 * co)).reshape(b, d, h, w, 2, 2, 2, co)
    y = t.transpose(0, 1, 4, 7, 2, 5, 3, 6).reshape(b, 2 * d, co, 2 * h, 2 * w)
    return y + bias.astype(dtype).reshape(1, 1, -1, 1, 1)


def _conv_dm(x, kernel, bias, dtype):
    """k3 SAME conv + bias on depth-major input (Pallas on TPU)."""
    y = _conv_dm_core(x.astype(dtype), kernel.astype(dtype), (1, 1, 1))
    return y + bias.astype(dtype).reshape(1, 1, -1, 1, 1)


class _DenseParams(nn.Module):
    """Kernel/bias holder with nn.Dense's exact param layout."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


def _convt2_cl(x, kernel, bias, dtype):
    """k=2³ stride-2 VALID ConvTranspose (flax unflipped kernel) as ONE
    matmul + parity scatter: dot to (..., 8·Co), then one transpose
    interleaves the 2×2×2 output parities. lax's conv_transpose places tap
    (a,b,c) at output parity (1−a,1−b,1−c) — hence the flip."""
    x = x.astype(dtype)
    b, d, h, w, c = x.shape
    co = kernel.shape[-1]
    kmat = jnp.flip(kernel.astype(dtype), (0, 1, 2)).transpose(3, 0, 1, 2, 4)
    t = (x @ kmat.reshape(c, 8 * co)).reshape(b, d, h, w, 2, 2, 2, co)
    y = t.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, 2 * d, 2 * h, 2 * w, co)
    return y + bias.astype(dtype)


class AnalysisBlock(nn.Module):
    """Two k3 convs + InstanceNorm + GELU, returning (pooled, skip).

    ``depth_major=True`` computes on ``(B, D, C, H, W)`` with the same
    parameter tree and returns a channels-last pooled output (the pool's
    tap-gather transpose changes layout for free) + a depth-major skip.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    depth_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        cin = x.shape[2] if self.depth_major else x.shape[-1]
        for i in range(2):
            w, b = _ConvParams(
                (3, 3, 3), cin if i == 0 else self.features,
                self.features, name=f"Conv_{i}",
            )()
            if self.depth_major:
                x = _conv_dm(x, w, b, self.dtype)
                gn_s, gn_b = _NormParams(self.features, name=f"GroupNorm_{i}")()
                x = _group_norm_dm(
                    x, gn_s, gn_b, self.features, 1e-3, self.dtype
                )
            else:
                x = _conv_cl(x, w, b, dtype=self.dtype)
                x = _instance_norm(self.features, self.dtype)(x)
            x = _gelu(x)
        skip = x
        w, b = _ConvParams(
            (2, 2, 2), self.features, self.features, name="Conv_2"
        )()
        pool = _pool2_dm if self.depth_major else _pool2_cl
        x = pool(x, w, b, self.dtype)
        # explicit name: the depth-major branch uses param holders for the
        # first two norms, so flax's auto-counter must not reuse their slots
        x = nn.GroupNorm(
            num_groups=self.features, epsilon=1e-3, dtype=self.dtype,
            name="GroupNorm_2",
        )(x)
        x = _gelu(x)
        return x, skip


class SynthesisBlock(nn.Module):
    """Transposed-conv upsample, skip concat, 1×1 projection + k3 conv.

    ``depth_major=True`` (the full-resolution block whose skip comes from
    the depth-major level 1): the ConvTranspose's parity-scatter transpose
    emits ``(B, D, C, H, W)`` for free and everything downstream computes
    depth-major with the same parameter tree.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    depth_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        w, b = _ConvParams(
            (2, 2, 2), x.shape[-1], self.features, name="ConvTranspose_0"
        )()
        if not self.depth_major:
            x = _convt2_cl(x, w, b, self.dtype)
            x = _instance_norm(self.features, self.dtype)(x)
            x = _gelu(x)
            x = jnp.concatenate([x, skip], axis=-1)
            # 1×1 linear projection over channels (reference LinearProjection)
            x = nn.Dense(self.features, dtype=self.dtype)(x)
            x = _instance_norm(self.features, self.dtype)(x)
            x = _gelu(x)
            w, b = _ConvParams((3, 3, 3), x.shape[-1], self.features, name="Conv_0")()
            x = _conv_cl(x, w, b, dtype=self.dtype)
            x = _instance_norm(self.features, self.dtype)(x)
            x = _gelu(x)
            return x

        x = _convt2_dm_out(x, w, b, self.dtype)
        gn_s, gn_b = _NormParams(self.features, name="GroupNorm_0")()
        x = _group_norm_dm(x, gn_s, gn_b, self.features, 1e-3, self.dtype)
        x = _gelu(x)
        x = jnp.concatenate([x, skip], axis=2)
        dk, db = _DenseParams(x.shape[2], self.features, name="Dense_0")()
        x = jnp.einsum(
            "bdchw,cf->bdfhw", x, dk.astype(self.dtype)
        ) + db.astype(self.dtype).reshape(1, 1, -1, 1, 1)
        gn_s, gn_b = _NormParams(self.features, name="GroupNorm_1")()
        x = _group_norm_dm(x, gn_s, gn_b, self.features, 1e-3, self.dtype)
        x = _gelu(x)
        w, b = _ConvParams((3, 3, 3), x.shape[2], self.features, name="Conv_0")()
        x = _conv_dm(x, w, b, self.dtype)
        gn_s, gn_b = _NormParams(self.features, name="GroupNorm_2")()
        x = _group_norm_dm(x, gn_s, gn_b, self.features, 1e-3, self.dtype)
        x = _gelu(x)
        return x


class UNet3DModule(nn.Module):
    """3-level 3D U-Net (reference ``unet3d.py:12-104``).

    Input:  ``(B, D, H, W, 1)`` raw voxels, D/H/W multiples of 16 (the data
    pipeline pads; static shapes keep XLA happy — the reference pads
    dynamically inside forward).
    Output: ``(B, D, H, W)`` per-voxel probabilities.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for dim in x.shape[1:4]:
            if dim % PAD_MULTIPLE:
                raise ValueError(
                    f"UNet3D input dims must be multiples of {PAD_MULTIPLE}, got {x.shape}"
                )
        x = x.astype(self.dtype)
        # level 1 runs depth-major: with C=1 the entry moveaxis is free
        x = jnp.moveaxis(x, -1, 2)
        skips = []
        for feats in (16, 64, 256):
            x, skip = AnalysisBlock(
                feats, dtype=self.dtype, depth_major=(feats == 16)
            )(x)
            skips.append(skip)

        w, b = _ConvParams((3, 3, 3), x.shape[-1], 384, name="Conv_0")()
        x = _conv_cl(x, w, b, dtype=self.dtype)
        x = _instance_norm(384, self.dtype)(x)
        x = _gelu(x)
        w, b = _ConvParams((3, 3, 3), 384, 256, name="Conv_1")()
        x = _conv_cl(x, w, b, dtype=self.dtype)
        x = _instance_norm(256, self.dtype)(x)
        x = _gelu(x)

        for i, feats in enumerate((64, 16, 16)):
            x = SynthesisBlock(
                feats, dtype=self.dtype, depth_major=(i == 2)
            )(x, skips.pop())

        # output 1×1 conv on the depth-major tensor: a single C-contraction
        # (squeezing the channel keeps unit dims off the lane axis — a
        # trailing dim of 1 blew backward buffers up 128×)
        wk, wb = _ConvParams((1, 1, 1), x.shape[2], 1, name="Conv_2")()
        x = jnp.einsum(
            "bdchw,c->bdhw", x, wk[0, 0, 0, :, 0].astype(self.dtype)
        ) + wb.astype(self.dtype)[0]
        x = x.astype(jnp.float32)
        x = jnp.clip(x, -5.0, 5.0)
        return nn.sigmoid(x)
