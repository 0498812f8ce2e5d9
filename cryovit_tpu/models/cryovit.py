"""CryoVIT 3D convolutional decoder over DINOv2 features (flax).

Parity target: reference ``models/cryovit.py`` — 1×1×1 projection 1536→1024,
four SynthesisBlocks (GroupNorm eps 1e-3, two k=3 convs with depth-only
dilations, 2× lateral ConvTranspose), output head with logit clip ±5 and
sigmoid. Net effect: 16× H/W upsampling from the DINO patch grid back to
voxel resolution; depth untouched.

TPU-native design notes:
- the low-resolution front (1536→1024→128 channels at the patch grid) runs
  channels-last so XLA maps the wide matmul-like convs onto the MXU,
- the high-resolution tail (≤32 channels at ≥¼ voxel resolution) runs
  **depth-major** ``(B, D, C, H, W)``: with 8–32 channels on the
  128-lane axis, XLA's padded layouts blow activations up 4–16× (a 138 MB
  logical tensor was observed to allocate 17.7 GB in the backward pass);
  with W on the lane axis the buffers stay dense and the reference's full
  128×512×512 training crop fits on a 16 GB v5e chip. Depth leading means
  a depth tap is a leading-dim whole-plane slice — the native layout of
  the Pallas conv kernel (``ops/conv3d_dm.py``), which replaces XLA's
  copy-heavy few-channel conv lowering on TPU (1.7–5× per-op),
- the parameter tree is identical in either layout (explicitly named
  holders matching flax's auto names), so checkpoints and the torch
  weight-mapping are layout-agnostic,
- ``remat=True`` rematerializes each synthesis block in the backward pass
  (the reference trains on 80 GB A100s; remat trades ~⅓ extra block FLOPs
  for fitting on 16 GB HBM),
- exact (erf) GELU to match torch's default; bf16 compute policy replaces
  the reference's Lightning "16-mixed".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

__all__ = ["CryoVITModule", "SynthesisBlock"]


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=False)


class _ConvParams(nn.Module):
    """Kernel/bias holder with nn.Conv's exact param layout."""

    kshape: tuple[int, int, int]
    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kshape, self.features_in, self.features_out),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class _NormParams(nn.Module):
    """Scale/bias holder with nn.GroupNorm's exact param layout."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


import functools as _functools

from cryovit_tpu.ops.conv3d_dm import (
    conv3d_dm,
    conv3d_dm_supported,
    conv3d_kernel_enabled,
    conv3d_kernel_interpret,
)


def _conv_dm_dispatch(x, kernel, dilation):
    """SAME 3³ conv on depth-major ``(B, D, C, H, W)``.

    Routes to the Pallas im2col kernel (``ops/conv3d_dm.py``) on TPU —
    XLA's own lowering for these few-channel convs emits internal relayout
    copies as large as the conv itself; the kernel is 1.7–5× faster at
    every tail shape (BASELINE.md). Falls back to the XLA conv on CPU or
    for unsupported shapes.
    """
    if conv3d_kernel_enabled() and conv3d_dm_supported(
        x.shape, kernel.shape, dilation
    ):
        return conv3d_dm(x, kernel, dilation, interpret=conv3d_kernel_interpret())
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1, 1),
        padding="SAME",
        rhs_dilation=dilation,
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_cl_core(x, kernel, dilation):
    """3D conv on channels-LAST ``(B, D, H, W, C)`` input (the decoder's
    low-resolution front), SAME padding, with a tap-dot weight gradient.

    XLA's conv-backward-filter for these big-channel patch-grid convs runs
    at ~21% MXU (12.25 ms for the 1024→192 block-0 conv); 27 explicit
    dot_generals contracting the token dims on shifted windows of the
    padded input hit the same math at 1.5–1.8× (measured standalone)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1, 1),
        padding="SAME",
        rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _conv_cl_fwd(x, kernel, dilation):
    return _conv_cl_core(x, kernel, dilation), (x, kernel)


def _conv_cl_bwd(dilation, res, g):
    x, kernel = res
    dx = jax.lax.conv_general_dilated(
        g,
        jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4),
        window_strides=(1, 1, 1),
        padding="SAME",
        rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    pd, ph, pw = dilation
    xp = jnp.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
    b_, d_, h_, w_, _ = x.shape
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                window = jax.lax.slice(
                    xp,
                    (0, kd * pd, kh * ph, kw * pw, 0),
                    (b_, kd * pd + d_, kh * ph + h_, kw * pw + w_, xp.shape[4]),
                )
                taps.append(
                    jax.lax.dot_general(
                        window,
                        g,
                        (((0, 1, 2, 3), (0, 1, 2, 3)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (C_in, C_out)
                )
    dw = jnp.stack(taps).reshape(3, 3, 3, x.shape[-1], g.shape[-1])
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


_conv_cl_core.defvjp(_conv_cl_fwd, _conv_cl_bwd)


def _conv_cl(x, kernel, bias, dilation=(1, 1, 1), dtype=jnp.float32):
    """3D conv on channels-last ``(B, D, H, W, C)`` input, SAME padding."""
    y = _conv_cl_core(x.astype(dtype), kernel.astype(dtype), tuple(dilation))
    return y + bias.astype(dtype)


@jax.custom_vjp
def _proj_core(x, kernel):
    """1×1×1 conv (= per-token dense) on channels-last input, with explicit
    dot gradients — XLA's conv-backward-filter spent 4.1 ms where a single
    token-contraction dot streams the same bytes in ~1.5 ms."""
    return jax.lax.dot_general(
        x, kernel, (((4,), (0,)), ((), ())), preferred_element_type=x.dtype
    )


def _proj_fwd(x, kernel):
    return _proj_core(x, kernel), (x, kernel)


def _proj_bwd(res, g):
    x, kernel = res
    dx = jax.lax.dot_general(
        g, kernel, (((4,), (1,)), ((), ())), preferred_element_type=g.dtype
    )
    dw = jax.lax.dot_general(
        x,
        g,
        (((0, 1, 2, 3), (0, 1, 2, 3)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


_proj_core.defvjp(_proj_fwd, _proj_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_dm_core(x, kernel, dilation):
    """3D conv on depth-major ``(B, D, C, H, W)`` input, SAME padding,
    k=3 per spatial dim, with a custom backward.

    XLA's default weight-gradient algorithm for few-channel convs emits an
    im2col copy whose minor dims are (C_in, taps) — lane padding inflated a
    0.8 GB buffer to 13–26 GB and made the reference training crop
    un-compilable on 16 GB HBM. The custom VJP computes dW as tap-wise
    contractions so every buffer keeps large spatial minor dims.
    """
    return _conv_dm_dispatch(x, kernel, dilation)


def _conv_dm_fwd(x, kernel, dilation):
    return _conv_dm_core(x, kernel, dilation), (x, kernel)


def _conv_dm_bwd(dilation, res, g):
    x, kernel = res
    # input grad: conv with the spatially-flipped, in/out-swapped kernel
    # (same dilation, SAME padding) — also a kernel-eligible conv
    dx = _conv_dm_dispatch(
        g, jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4), dilation
    )
    if conv3d_kernel_enabled() and conv3d_dm_supported(
        x.shape, kernel.shape, dilation
    ):
        # one pass over x and g computes all 27 taps (ops/conv3d_dm.py);
        # the XLA fallback below re-reads x per tap
        from cryovit_tpu.ops.conv3d_dm import conv3d_dm_dw

        dw = conv3d_dm_dw(x, g, dilation, interpret=conv3d_kernel_interpret())
        return dx.astype(x.dtype), dw.astype(kernel.dtype)
    # weight grad tap-by-tap as plain contractions:
    #   dW[t, ci, co] = Σ_{b,p} x[b, p + (t−1)·dil, ci] · g[b, p, co]
    # (27 dot_generals over (b, d, h, w) on shifted windows of the padded
    # input). The earlier swapped-roles conv formulation made XLA emit the
    # reduction at ~0.1% utilization — 160 ms for the 8-channel tail layer
    # where these dots stream the same bytes in ~7 ms.
    pd, ph, pw = dilation  # SAME pads of the k=3 dilated forward
    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (ph, ph), (pw, pw)))
    d_, h_, w_ = x.shape[1], x.shape[3], x.shape[4]
    taps = []
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                window = jax.lax.slice(
                    xp,
                    (0, kd * pd, 0, kh * ph, kw * pw),
                    (
                        xp.shape[0],
                        kd * pd + d_,
                        xp.shape[2],
                        kh * ph + h_,
                        kw * pw + w_,
                    ),
                )
                taps.append(
                    jax.lax.dot_general(
                        window,
                        g,
                        (((0, 1, 3, 4), (0, 1, 3, 4)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (C_in, C_out)
                )
    dw = jnp.stack(taps).reshape(3, 3, 3, x.shape[2], g.shape[2])
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


_conv_dm_core.defvjp(_conv_dm_fwd, _conv_dm_bwd)


def _conv_dm(x, kernel, bias, dilation=(1, 1, 1), dtype=jnp.float32):
    """3D conv on depth-major ``(B, D, C, H, W)`` input, SAME padding."""
    y = _conv_dm_core(x.astype(dtype), kernel.astype(dtype), tuple(dilation))
    return y + bias.astype(dtype).reshape(1, 1, -1, 1, 1)


def _convt_dispatch(x, kernel):
    """2× lateral ConvTranspose on depth-major input: Pallas parity-matmul
    kernel (``ops/convt_dm.py``) on TPU, XLA conv_transpose elsewhere."""
    from cryovit_tpu.ops.convt_dm import convt2x_dm, convt2x_dm_supported

    if conv3d_kernel_enabled() and convt2x_dm_supported(
        x.shape, kernel.shape, x.dtype
    ):
        return convt2x_dm(x, kernel, interpret=conv3d_kernel_interpret())
    return jax.lax.conv_transpose(
        x,
        kernel,
        strides=(1, 2, 2),
        padding="VALID",
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
        transpose_kernel=False,
    )


@jax.custom_vjp
def _convt_core(x, kernel):
    return _convt_dispatch(x, kernel)


def _convt_fwd(x, kernel):
    return _convt_core(x, kernel), (x, kernel)


def _convt_bwd(res, g):
    x, kernel = res
    from cryovit_tpu.ops.convt_dm import (
        convt2x_dm_bwd,
        convt2x_dm_supported,
    )

    if conv3d_kernel_enabled() and convt2x_dm_supported(
        x.shape, kernel.shape, x.dtype
    ):
        dx, dw = convt2x_dm_bwd(
            g.astype(x.dtype), x, kernel, interpret=conv3d_kernel_interpret()
        )
        return dx.astype(x.dtype), dw.astype(kernel.dtype)
    # XLA fallback. Forward places tap (a,c) at output parity (1−a,1−c)
    # (see ops/convt_dm.py), so:
    #   dx = stride-2 VALID conv of g with the tap-flipped, in/out-swapped
    #        kernel;  dW[0,a,c] = x ⊗ g[..., (1−a)::2, (1−c)::2].
    dx = jax.lax.conv_general_dilated(
        g,
        jnp.flip(kernel, (1, 2)).swapaxes(3, 4),
        window_strides=(1, 2, 2),
        padding="VALID",
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
    )
    taps = []
    for a in range(2):
        for c in range(2):
            g_ac = g[:, :, :, (1 - a) :: 2, (1 - c) :: 2]
            taps.append(
                jax.lax.dot_general(
                    x,
                    g_ac,
                    (((0, 1, 3, 4), (0, 1, 3, 4)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C_in, C_out)
            )
    dw = jnp.stack(taps).reshape(1, 2, 2, x.shape[2], g.shape[2])
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


_convt_core.defvjp(_convt_fwd, _convt_bwd)


def _conv_transpose_dm(x, kernel, bias, strides, dtype=jnp.float32):
    """ConvTranspose (flax convention: unflipped kernel) depth-major."""
    assert tuple(strides) == (1, 2, 2), strides
    y = _convt_core(x.astype(dtype), kernel.astype(dtype))
    return y + bias.astype(dtype).reshape(1, 1, -1, 1, 1)


def _group_norm_dm(x, scale, bias, groups: int, eps: float, dtype):
    """GroupNorm on depth-major input (stats in f32, flax-equivalent)."""
    b, d, c, h, w = x.shape
    xg = x.astype(jnp.float32).reshape(b, d, groups, c // groups, h, w)
    mean = xg.mean(axis=(1, 3, 4, 5), keepdims=True)
    var = xg.var(axis=(1, 3, 4, 5), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, d, c, h, w).astype(dtype)
    return x * scale.astype(dtype).reshape(1, 1, -1, 1, 1) + bias.astype(
        dtype
    ).reshape(1, 1, -1, 1, 1)


def _mask_head_conv(x, kernel, bias, dtype):
    """Final 8→1-channel 3³ conv as an explicit 27-tap einsum sum.

    Emitting the mask through a regular conv produces a rank-5 tensor with
    TWO unit dims — XLA's backward assigned those to the (sublane, lane)
    tile axes, inflating a 33 MB gradient buffer to 8 GB. Summing shifted
    single-tap contractions keeps every tensor at ``(B, D, C|∅, H, W)``
    with dense spatial minor dims, is autodiff-friendly, and is VPU-cheap
    (27 fused multiply-adds over 8 channels).

    On TPU the head routes through the Pallas conv + one-pass dW kernel
    instead (``ops/conv3d_dm.py`` — the tap loop's backward re-read x 27×,
    ~16 ms of the train step); the tap loop remains the off-TPU path.

    x: ``(B, D, 8, H, W)``; kernel: ``(3, 3, 3, 8, 1)`` → ``(B, D, H, W)``.
    """
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    if conv3d_kernel_enabled() and conv3d_dm_supported(
        x.shape, kernel.shape, (1, 1, 1)
    ):
        y = _conv_dm_core(x, kernel, (1, 1, 1))[:, :, 0]
        return y + bias.astype(dtype)[0]
    d, h, w = x.shape[1], x.shape[3], x.shape[4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (1, 1), (1, 1)))
    y = jnp.zeros((x.shape[0], d, h, w), dtype=dtype)
    for kd in range(3):
        for kh in range(3):
            for kw in range(3):
                window = xp[:, kd : kd + d, :, kh : kh + h, kw : kw + w]
                # multiply+sum rather than einsum/dot: a dot would prefer
                # the contraction (channel) dim minor and push that layout
                # into the operand gradients — the exact pathology this
                # function exists to avoid
                taps = kernel[kd, kh, kw, :, 0].reshape(1, 1, -1, 1, 1)
                y = y + jnp.sum(window * taps, axis=2)
    return y + bias.astype(dtype)[0]


class SynthesisBlock(nn.Module):
    """Anisotropic upscaling block (reference ``cryovit.py:52-83``).

    GroupNorm(max(8, C//8) groups, eps 1e-3) → Conv3d k3 dilation (d1,1,1)
    → GELU → Conv3d k3 dilation (d2,1,1) → GELU → ConvTranspose (1,2,2)
    stride (1,2,2) → GELU. Dilations act on depth only: the receptive field
    spans many z-slices while H/W stay local.

    ``depth_major=True`` computes on ``(B, D, C, H, W)`` with the same
    parameter tree (see module docstring for why).
    """

    c2: int
    c3: int
    d1: int
    d2: int
    dtype: jnp.dtype = jnp.float32
    depth_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c1 = x.shape[2] if self.depth_major else x.shape[-1]
        groups = max(8, c1 // 8)
        if not self.depth_major:
            x = nn.GroupNorm(num_groups=groups, epsilon=1e-3, dtype=self.dtype)(x)
            w0, b0 = _ConvParams((3, 3, 3), c1, self.c2, name="Conv_0")()
            w1, b1 = _ConvParams((3, 3, 3), self.c2, self.c2, name="Conv_1")()
            x = _conv_cl(x, w0, b0, (self.d1, 1, 1), self.dtype)
            x = _gelu(checkpoint_name(x, "cryovit_conv"))
            x = _conv_cl(x, w1, b1, (self.d2, 1, 1), self.dtype)
            x = _gelu(checkpoint_name(x, "cryovit_conv"))
            x = nn.ConvTranspose(
                self.c3, kernel_size=(1, 2, 2), strides=(1, 2, 2), dtype=self.dtype
            )(x)
            return _gelu(checkpoint_name(x, "cryovit_conv"))

        # depth-major path: identical math and params, lane-friendly layout
        gn_scale, gn_bias = _NormParams(c1, name="GroupNorm_0")()
        w0, b0 = _ConvParams((3, 3, 3), c1, self.c2, name="Conv_0")()
        w1, b1 = _ConvParams((3, 3, 3), self.c2, self.c2, name="Conv_1")()
        wt, bt = _ConvParams((1, 2, 2), self.c2, self.c3, name="ConvTranspose_0")()
        x = _group_norm_dm(x, gn_scale, gn_bias, groups, 1e-3, self.dtype)
        x = _gelu(
            checkpoint_name(_conv_dm(x, w0, b0, (self.d1, 1, 1), self.dtype),
                            "cryovit_conv")
        )
        x = _gelu(
            checkpoint_name(_conv_dm(x, w1, b1, (self.d2, 1, 1), self.dtype),
                            "cryovit_conv")
        )
        x = _gelu(
            checkpoint_name(
                _conv_transpose_dm(x, wt, bt, (1, 2, 2), self.dtype),
                "cryovit_conv",
            )
        )
        return x


class CryoVITModule(nn.Module):
    """CryoVIT decoder head (reference ``cryovit.py:11-49``).

    Input:  ``(B, D, h, w, 1536)`` DINOv2 patch features (h = H/16).
    Output: ``(B, D, 16·h, 16·w)`` per-voxel probabilities.
    """

    dtype: jnp.dtype = jnp.float32
    remat: bool | str = "save_convs"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # remat modes (measured at a 48×512×512 crop, BASELINE.md):
        #   "save_convs": rematerialize each block but SAVE conv/convT
        #     outputs (`checkpoint_name` tags) — the backward recomputes
        #     only the VPU-cheap GroupNorm/GELU glue, never a conv. Same
        #     step time as remat=False with roughly half its live
        #     activation set; the default.
        #   True: full per-block remat (backward re-runs the convs) —
        #     ~19% slower; the fallback for the deepest training crops.
        #   False: no remat — fastest, largest memory.
        if self.remat == "save_convs":
            block = nn.remat(
                SynthesisBlock,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "cryovit_conv"
                ),
            )
        elif self.remat:
            block = nn.remat(SynthesisBlock)
        else:
            block = SynthesisBlock
        x = x.astype(self.dtype)
        wp_, bp_ = _ConvParams((1, 1, 1), x.shape[-1], 1024, name="Conv_0")()
        x = _proj_core(
            x, wp_[0, 0, 0].astype(self.dtype)
        ) + bp_.astype(self.dtype)
        x = _gelu(x)
        x = block(192, 128, d1=32, d2=24, dtype=self.dtype, name="SynthesisBlock_0")(x)
        x = block(64, 32, d1=16, d2=12, dtype=self.dtype, name="SynthesisBlock_1")(x)
        # switch to depth-major for the lane-hostile high-res tail
        x = jnp.moveaxis(x, -1, 2)
        x = block(
            32, 32, d1=8, d2=4, dtype=self.dtype, depth_major=True,
            name="SynthesisBlock_2",
        )(x)
        x = block(
            16, 8, d1=2, d2=1, dtype=self.dtype, depth_major=True,
            name="SynthesisBlock_3",
        )(x)
        w1, b1 = _ConvParams((3, 3, 3), 8, 8, name="Conv_1")()
        w2, b2 = _ConvParams((3, 3, 3), 8, 1, name="Conv_2")()
        x = _gelu(_conv_dm(x, w1, b1, dtype=self.dtype))
        x = _mask_head_conv(x, w2, b2, self.dtype)
        x = jnp.clip(x.astype(jnp.float32), -5.0, 5.0)
        return nn.sigmoid(x)
