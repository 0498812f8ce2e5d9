"""Pallas TPU 2× lateral ConvTranspose for the depth-major decoder tail.

Every CryoVIT SynthesisBlock ends in a ConvTranspose k=(1,2,2) stride
(1,2,2) (reference ``models/cryovit.py:52-83``) — mathematically four
independent ``Ci→Co`` matmuls (one per output (row, col) parity) plus a
2×2 spatial interleave. XLA's lowering of this op on the depth-major
layout was the single largest op in the decoder train step (29 ms forward
+ 31 ms backward + relayout copies at the 16→8 @512² instance,
BASELINE.md r3). This kernel runs the four parity matmuls on the MXU and
performs the interleave with zero shuffle cost:

- **rows** (sublane axis): ``jnp.stack(..., axis=2).reshape`` — a
  sublane-granular relayout Mosaic lowers natively;
- **columns** (lane axis): Mosaic has no 16-bit lane interleave, so the
  two column parities are bit-packed into one uint32 lane
  (``lo | hi<<16``) and the kernel OUTPUT is uint32; the caller's
  ``jax.lax.bitcast_convert_type(..., bf16).reshape`` unpacks adjacent
  lanes for free (layout-preserving bitcast on little-endian TPU).

I/O is bf16 (the training/inference compute dtype); f32 falls back to
the XLA path in the caller (``models/cryovit.py:_conv_transpose_dm``).
The backward kernel shares one g-unpack + x-load to emit BOTH dx and dW.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cryovit_tpu.ops.conv3d_dm import _auto_block_rows

__all__ = ["convt2x_dm", "convt2x_dm_supported", "convt2x_dm_reference"]


def convt2x_dm_reference(x, kernel):
    """XLA oracle: ConvTranspose k=(1,2,2) stride (1,2,2), flax
    (unflipped) kernel convention, on depth-major ``(B, D, Ci, H, W)``."""
    return jax.lax.conv_transpose(
        x,
        kernel,
        strides=(1, 2, 2),
        padding="VALID",
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
        transpose_kernel=False,
    )


def convt2x_dm_supported(x_shape, kernel_shape, dtype) -> bool:
    if tuple(kernel_shape[:3]) != (1, 2, 2):
        return False
    if dtype != jnp.bfloat16:
        return False  # the column interleave is a 16-bit pack
    b, d, ci, h, w = x_shape
    if w % 128 or w < 128:
        return False
    return ci % 8 == 0 and ci <= 128 and kernel_shape[4] <= 128


def _pack_cols(lo, hi):
    """bf16 pair → uint32 lane (lo = even output column)."""
    lo_u = pltpu.bitcast(lo.astype(jnp.bfloat16), jnp.uint16).astype(
        jnp.uint32
    )
    hi_u = pltpu.bitcast(hi.astype(jnp.bfloat16), jnp.uint16).astype(
        jnp.uint32
    )
    return lo_u | (hi_u << 16)


def _fwd_kernel(x_ref, k_ref, o_ref, *, ci: int):
    blk = x_ref[0]  # (Ci, ht, W) bf16
    co = o_ref.shape[1]
    t = {}
    for a in range(2):
        for c in range(2):
            t[a, c] = jax.lax.dot_general(
                k_ref[a, c][:, :ci],  # (Co, Ci) — drop lane padding
                blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Co, ht, W)
    p0 = _pack_cols(t[0, 0], t[0, 1])  # even output rows
    p1 = _pack_cols(t[1, 0], t[1, 1])  # odd output rows
    ht = p0.shape[1]
    o_ref[0] = jnp.stack([p0, p1], axis=2).reshape(co, 2 * ht, p0.shape[2])


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _convt2x_single(x, kernel, block_rows=None, interpret=False):
    """x (D, Ci, H, W) bf16, kernel (1,2,2,Ci,Co) → (D, Co, 2H, 2W)."""
    d, ci, h, w = x.shape
    co = kernel.shape[-1]
    ht = block_rows or _auto_block_rows(h, w, ci)
    nh = -(-h // ht)
    hb = nh * ht
    if hb != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hb - h), (0, 0)))
    # (1,2,2,Ci,Co) → (2,2,Co,Ci) with Ci lane-padded to 128. lax's
    # VALID stride-2 conv_transpose places tap (a,c) at output parity
    # (1−a, 1−c): y[2h+a, 2w+c] = Σ x[h,w]·K[0,1−a,1−c] (verified vs
    # lax.conv_transpose) — flip both tap dims here.
    kp = max(128, ci)
    kmat = jnp.pad(
        kernel[0, ::-1, ::-1].transpose(0, 1, 3, 2),
        ((0, 0), (0, 0), (0, 0), (0, kp - ci)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ci=ci),
        grid=(d, nh),
        in_specs=[
            pl.BlockSpec((1, ci, ht, w), lambda dz, hz: (dz, 0, hz, 0)),
            pl.BlockSpec((2, 2, co, kp), lambda dz, hz: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, co, 2 * ht, w), lambda dz, hz: (dz, 0, hz, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((d, co, 2 * hb, w), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * ci * co * d * hb * w,
            bytes_accessed=2 * (ci * d * hb * w + 2 * co * d * hb * w),
            transcendentals=0,
        ),
    )(x, kmat)
    # unpack column parities: adjacent bf16 lanes of each uint32
    y = jax.lax.bitcast_convert_type(out, jnp.bfloat16)  # (d,co,2hb,w,2)
    y = y.reshape(d, co, 2 * hb, 2 * w)
    return y if hb == h else y[:, :, : 2 * h]


def convt2x_dm(x, kernel, block_rows=None, interpret=False):
    """ConvTranspose k=(1,2,2) stride (1,2,2) on ``(B, D, Ci, H, W)`` bf16.

    Same semantics as ``convt2x_dm_reference`` for supported shapes
    (``convt2x_dm_supported``); the caller is responsible for gating.
    """
    fn = functools.partial(
        _convt2x_single, block_rows=block_rows, interpret=interpret
    )
    if x.shape[0] == 1:
        return fn(x[0], kernel)[None]
    return jax.vmap(lambda xi: fn(xi, kernel))(x)


# ---- backward: one kernel emits BOTH dx and dW ---------------------------


def _unpack_cols(gu):
    """uint32 lanes → (even, odd) bf16 column parities."""
    lo = pltpu.bitcast((gu & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    hi = pltpu.bitcast((gu >> 16).astype(jnp.uint16), jnp.bfloat16)
    return lo, hi


def _bwd_kernel(g_ref, x_ref, kt_ref, dx_ref, dw_ref, *, ci: int, co: int):
    gu = g_ref[0]  # (Co, 2·ht, W) uint32 — column-packed cotangent
    blk = x_ref[0]  # (Ci, ht, W) bf16
    ht = blk.shape[1]
    w = blk.shape[2]
    lo, hi = _unpack_cols(gu)  # (Co, 2·ht, W) bf16 each
    # row (sublane) deinterleave
    lo = lo.reshape(co, ht, 2, w)
    hi = hi.reshape(co, ht, 2, w)
    g_ac = {
        (0, 0): lo[:, :, 0],
        (0, 1): hi[:, :, 0],
        (1, 0): lo[:, :, 1],
        (1, 1): hi[:, :, 1],
    }
    acc = None
    blk2 = blk.reshape(ci, ht * w)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    for a in range(2):
        for c in range(2):
            g2 = g_ac[a, c].reshape(co, ht * w)
            # dx += K[0,1−a,1−c]ᵀ · g_ac  (kt_ref pre-flipped+transposed)
            t = jax.lax.dot_general(
                kt_ref[a, c][:, :co],
                g2,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ci, ht·W)
            acc = t if acc is None else acc + t
            # dW[a,c] += x ⊗ g_ac contracted over (ht, W)
            dw = jax.lax.dot_general(
                blk2,
                g2,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Ci, Co)

            @pl.when(first)
            def _init(a=a, c=c, dw=dw):
                dw_ref[a, c, :, :co] = dw

            @pl.when(jnp.logical_not(first))
            def _acc(a=a, c=c, dw=dw):
                dw_ref[a, c, :, :co] += dw

    dx_ref[0] = acc.reshape(ci, ht, w).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _convt2x_bwd_single(g, x, kernel, block_rows=None, interpret=False):
    """g (D, Co, 2H, 2W), x (D, Ci, H, W) → (dx, dW[1,2,2,Ci,Co])."""
    d, ci, h, w = x.shape
    co = kernel.shape[-1]
    ht = block_rows or _auto_block_rows(h, w, ci)
    nh = -(-h // ht)
    hb = nh * ht
    if hb != h:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, hb - h), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 2 * (hb - h)), (0, 0)))
    # pack g's column parities into uint32 lanes (layout-preserving)
    gu = jax.lax.bitcast_convert_type(
        g.reshape(d, co, 2 * hb, w, 2), jnp.uint32
    )
    # K[0,1−a,1−c]ᵀ: (2,2,Ci,Co) with Co lane-padded
    kp = max(128, co)
    kt = jnp.pad(
        kernel[0, ::-1, ::-1], ((0, 0), (0, 0), (0, 0), (0, kp - co))
    )
    cip = max(8, ci)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, ci=ci, co=co),
        grid=(d, nh),
        in_specs=[
            pl.BlockSpec((1, co, 2 * ht, w), lambda dz, hz: (dz, 0, hz, 0)),
            pl.BlockSpec((1, ci, ht, w), lambda dz, hz: (dz, 0, hz, 0)),
            pl.BlockSpec((2, 2, ci, kp), lambda dz, hz: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ci, ht, w), lambda dz, hz: (dz, 0, hz, 0)),
            pl.BlockSpec((2, 2, cip, kp), lambda dz, hz: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, ci, hb, w), x.dtype),
            jax.ShapeDtypeStruct((2, 2, cip, kp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * ci * co * d * hb * w,
            bytes_accessed=2 * (ci * d * hb * w + 2 * co * d * hb * w),
            transcendentals=0,
        ),
    )(gu, x, kt)
    if hb != h:
        dx = dx[:, :, :h]
    # stored dw[a,c] pairs with output parity (a,c); grad of tap (a,c) is
    # the (1−a,1−c) parity sum (fwd places tap (a,c) at parity (1−a,1−c))
    dw = dw[::-1, ::-1, :ci, :co][None]
    return dx, dw


def convt2x_dm_bwd(g, x, kernel, block_rows=None, interpret=False):
    """Backward of :func:`convt2x_dm`: returns ``(dx, dW)``."""
    fn = functools.partial(
        _convt2x_bwd_single, block_rows=block_rows, interpret=interpret
    )
    if x.shape[0] == 1:
        dx, dw = fn(g[0], x[0], kernel)
        return dx[None], dw
    dx, dw = jax.vmap(lambda gi, xi: fn(gi, xi, kernel))(g, x)
    return dx, dw.sum(axis=0)
