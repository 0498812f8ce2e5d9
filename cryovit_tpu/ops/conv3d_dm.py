"""Pallas TPU 3D convolution for the depth-major decoder tail.

The CryoVIT decoder tail runs few-channel (8–32) k=3³ convs at half/full
voxel resolution (``models/cryovit.py`` — reference
``models/cryovit.py:52-83``). XLA's conv lowering for these shapes emits
internal relayout ``copy`` ops as large as the conv itself; a direct XLA
conv on the depth-major layout is 2–280× slower than this kernel at the
tail shapes (measured per-op table in BASELINE.md r3). The kernel
computes the same conv as three MXU matmuls per (depth-plane, row-block)
program with the im2col built in VMEM:

- input layout is **depth-major** ``(D, Ci, H, W)`` — depth leads so a
  depth tap is a leading-dim index (whole-plane DMA), Ci sits on
  sublanes and (H, W) FLATTEN into the lane axis. Only the H axis is
  padded (1 halo row top/bottom + round-up to the row-block size); W is
  the raw lane axis (W % 128 == 0 keeps every row shift lane-aligned),
  so the output block is DENSE — no post-kernel crop, no column-pad
  bandwidth. Column taps are ±1 lane rolls whose row-wrap lanes are
  zeroed by an iota mask; depth taps clamp their plane index in the
  BlockSpec index map and zero the whole tap when out of range.
- per depth tap, the 9 (kh, kw) shifted views concatenate into an
  im2col tile ``(9·Ci, ht·W)`` and contract against pre-reshaped
  weights ``(Co, 9·Ci)`` in ONE ``dot_general`` — K=9·Ci keeps the MXU
  streaming instead of 27 tiny dots.
- accumulation across the 3 depth taps happens in f32; depth dilation
  only changes the tap's plane index (the reference dilates depth
  only: rhs_dilation ``(d, 1, 1)``).
- sub-32-bit inputs are upcast to f32 *in VMEM* (HBM traffic stays in
  the I/O dtype): Mosaic's lane rotate is 32-bit only.

Used for BOTH the forward conv and the input-gradient conv (the same
op with a flipped, in/out-swapped kernel — ``models/cryovit.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv3d_dm",
    "conv3d_dm_reference",
    "conv3d_dm_supported",
    "conv3d_kernel_enabled",
    "conv3d_kernel_interpret",
    "set_conv3d_kernel",
]

# Kernel switch. None = auto: use the Pallas kernel whenever the default
# backend is a real TPU. GSPMD cannot partition a pallas_call, so a program
# whose decoder inputs are *GSPMD-sharded* across a mesh (the depth-sharded
# batch=1 pod-training path, ``parallel/spatial.py``) must run the XLA conv
# instead — callers building such programs call ``set_conv3d_kernel(False)``
# first. Data-parallel mesh programs instead go through ``jax.shard_map``
# (``train/loop.py``), inside which each device runs its own unsharded
# pallas_call — kernels stay ON there. ``"interpret"`` enables the kernels
# in Pallas interpret mode (jax-ops emulation) so CPU-mesh tests and the
# driver dryrun can execute the *kernel* path inside shard_map without TPU
# hardware.
_FORCE_KERNEL: bool | str | None = None


def set_conv3d_kernel(enabled: bool | str | None) -> None:
    """Force the Pallas conv on/off, ``"interpret"`` for interpret-mode
    execution (CPU-testable), or ``None`` to restore auto."""
    global _FORCE_KERNEL
    _FORCE_KERNEL = enabled


def conv3d_kernel_enabled() -> bool:
    if _FORCE_KERNEL is not None:
        return bool(_FORCE_KERNEL)
    return jax.default_backend() not in ("cpu",)


def conv3d_kernel_interpret() -> bool:
    """Whether kernel dispatch sites should run Pallas in interpret mode."""
    return _FORCE_KERNEL == "interpret"


def conv3d_dm_reference(x, kernel, dilation=(1, 1, 1)):
    """XLA oracle: SAME k=3³ conv on depth-major ``(B, D, Ci, H, W)``."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1, 1),
        padding="SAME",
        rhs_dilation=dilation,
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
    )


def conv3d_dm_supported(x_shape, kernel_shape, dilation) -> bool:
    """Kernel eligibility: k=3³, depth-only dilation, lane-aligned W."""
    if tuple(kernel_shape[:3]) != (3, 3, 3):
        return False
    if dilation[1] != 1 or dilation[2] != 1:
        return False
    b, d, ci, h, w = x_shape
    if w % 128 or w < 128:
        return False
    if ci > 128 or kernel_shape[4] > 128 or (ci % 8 and ci != 1):
        return False  # ci=1 is the mask-head input-gradient conv
    return h >= 2


def _auto_block_rows(h: int, w: int, ci: int) -> int:
    """Bigger row blocks amortize the 2-row halo and pipeline overhead
    (measured monotonic 8→64 at every tail shape); cap the f32 im2col
    tile at ~24 MB of VMEM. Row counts that don't divide are handled by
    hb round-up padding, so only ``cand <= h`` gates the size."""
    block_rows = 8
    for cand in (16, 32, 64):
        if cand <= h and 9 * ci * cand * w * 4 <= 24e6:
            block_rows = cand
    return block_rows


def _im2col_tap(x_ref, *, ht: int, w: int):
    """Load one depth tap's row-block window and build its 9-shift im2col
    tile ``(9·Ci, ht·W)`` in VMEM. Shared by the forward and dW kernels —
    their tap geometry must stay bit-identical."""
    length = (ht + 2) * w
    blk = x_ref[0]  # (Ci, (ht+2)·W) — size-1 Element depth dim
    if blk.dtype.itemsize < 4:
        # Mosaic's lane rotate is 32-bit only ("Rotate with non-32-bit
        # data"); upcast in VMEM — HBM traffic stays in the I/O dtype.
        blk = blk.astype(jnp.float32)
    # lanes whose rolled value wrapped across a row boundary get zeroed:
    # after roll(+1) position p holds col (p-1) — invalid at col 0; after
    # roll(-1) position p holds col (p+1) — invalid at col w-1.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, length), 1) % w
    zero = jnp.zeros((), blk.dtype)
    rolled = {
        0: jnp.where(col != 0, pltpu.roll(blk, shift=1, axis=1), zero),
        1: blk,
        # roll requires a non-negative shift: −1 ≡ L−1 circularly
        2: jnp.where(
            col != w - 1,
            pltpu.roll(blk, shift=length - 1, axis=1),
            zero,
        ),
    }
    pieces = []
    for kh in range(3):
        lo = kh * w
        for kw in range(3):
            pieces.append(rolled[kw][:, lo : lo + ht * w])
    return jnp.concatenate(pieces, axis=0)  # (9·Ci, ht·W)


def _tap_valid(kd: int, d: int, dd: int):
    """Whether depth tap kd's (clamped) plane index is in range [0, d)."""
    plane = pl.program_id(0) + (kd - 1) * dd
    return jnp.logical_and(plane >= 0, plane < d)


def _conv_kernel(
    x0_ref, x1_ref, x2_ref, k_ref, o_ref, *, ht: int, w: int, ci: int,
    d: int, dd: int, out_dtype,
):
    """One (depth-plane, row-block) program: im2col in VMEM + 3 dots."""
    acc = None
    for kd, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        im2col = _im2col_tap(x_ref, ht=ht, w=w)
        t = jax.lax.dot_general(
            k_ref[kd][:, : 9 * ci],  # (Co, 9·Ci) — drop lane padding
            im2col,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Co, ht·W)
        # zero depth taps whose (clamped) plane index fell outside [0, d)
        t = jnp.where(_tap_valid(kd, d, dd), t, jnp.zeros((), t.dtype))
        acc = t if acc is None else acc + t
    o_ref[...] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "block_rows", "interpret")
)
def _conv3d_dm_single(x, kernel, dilation, block_rows=None, interpret=False):
    """x (D, Ci, H, W), kernel (3,3,3,Ci,Co) → (D, Co, H, W)."""
    d, ci, h, w = x.shape
    co = kernel.shape[-1]
    dd = dilation[0]
    ht = block_rows or _auto_block_rows(h, w, ci)
    nh = -(-h // ht)
    hb = nh * ht

    # rows only: 1 halo row + round-up-to-ht + 1 halo; no column or depth
    # padding (handled by lane masks / clamped index maps in the kernel)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, hb - h + 1), (0, 0)))
    xf = xp.reshape(d, ci, (hb + 2) * w)
    # weights → (3, Co, Kp): rows ordered (kh, kw, ci) to match the
    # im2col concat; Co on sublanes and the contraction dim lane-padded
    # to a 128 multiple (tile-legal; the kernel slices the pad back off,
    # so no extra MXU cycles)
    kp = -(-9 * ci // 128) * 128
    kmat = jnp.pad(
        kernel.reshape(3, 9 * ci, co).swapaxes(1, 2),
        ((0, 0), (0, 0), (0, kp - 9 * ci)),
    )

    def in_spec(kd):
        # Mosaic requires all-or-none Element dims per spec; depth/channel
        # become size-1/full Element windows so the lane axis can take an
        # element-granular (overlapping-halo) offset. Out-of-range depth
        # taps clamp to a valid plane and are zeroed inside the kernel.
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(ci), pl.Element((ht + 2) * w)),
            lambda dz, hz, kd=kd: (
                jnp.clip(dz + (kd - 1) * dd, 0, d - 1),
                0,
                hz * ht * w,
            ),
        )

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, ht=ht, w=w, ci=ci, d=d, dd=dd, out_dtype=x.dtype
        ),
        grid=(d, nh),
        in_specs=[
            in_spec(0),
            in_spec(1),
            in_spec(2),
            pl.BlockSpec((3, co, kp), lambda dz, hz: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, co, ht * w), lambda dz, hz: (dz, 0, hz)
        ),
        out_shape=jax.ShapeDtypeStruct((d, co, hb * w), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * ci * co * d * hb * w,
            bytes_accessed=(3 * (ht + 2) * nh * w * d * ci
                            + co * d * hb * w) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, xf, xf, kmat)
    out = out.reshape(d, co, hb, w)
    return out if hb == h else out[:, :, :h]


def conv3d_dm(x, kernel, dilation=(1, 1, 1), block_rows=None, interpret=False):
    """SAME k=3³ conv on ``(B, D, Ci, H, W)`` depth-major input.

    Same semantics as ``conv3d_dm_reference`` for supported shapes
    (``conv3d_dm_supported``); the caller is responsible for gating.
    """
    fn = functools.partial(
        _conv3d_dm_single,
        dilation=tuple(dilation),
        block_rows=block_rows,
        interpret=interpret,
    )
    if x.shape[0] == 1:
        return fn(x[0], kernel)[None]
    return jax.vmap(lambda xi: fn(xi, kernel))(x)


# ---- weight gradient: all 27 taps from ONE pass over x and g --------------


def _dw_kernel(
    x0_ref, x1_ref, x2_ref, g_ref, dw_ref, *, ht: int, w: int, ci: int,
    d: int, dd: int,
):
    """One (depth-plane, row-block) program: the forward's im2col contracted
    against the cotangent block — dW[kd] += im2col_kd · gᵀ."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    gu = g_ref[0].astype(jnp.float32)  # (Co, ht·W)
    for kd, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        im2col = _im2col_tap(x_ref, ht=ht, w=w)
        dw = jax.lax.dot_general(
            im2col,
            gu,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (9·Ci, Co)
        # clamped out-of-range depth taps must contribute nothing
        dw = jnp.where(_tap_valid(kd, d, dd), dw, jnp.zeros((), dw.dtype))

        co = gu.shape[0]

        @pl.when(first)
        def _init(kd=kd, dw=dw):
            dw_ref[kd, :, :co] = dw

        @pl.when(jnp.logical_not(first))
        def _acc(kd=kd, dw=dw):
            dw_ref[kd, :, :co] += dw


@functools.partial(
    jax.jit, static_argnames=("dilation", "block_rows", "interpret")
)
def _conv3d_dm_dw_single(x, g, dilation, block_rows=None, interpret=False):
    """x (D, Ci, H, W), cotangent g (D, Co, H, W) → dW (3,3,3,Ci,Co) f32."""
    d, ci, h, w = x.shape
    co = g.shape[1]
    dd = dilation[0]
    ht = block_rows or _auto_block_rows(h, w, ci)
    nh = -(-h // ht)
    hb = nh * ht
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, hb - h + 1), (0, 0)))
    xf = xp.reshape(d, ci, (hb + 2) * w)
    if hb != h:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, hb - h), (0, 0)))
    gf = g.reshape(d, co, hb * w)
    cop = max(128, co)

    def in_spec(kd):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(ci), pl.Element((ht + 2) * w)),
            lambda dz, hz, kd=kd: (
                jnp.clip(dz + (kd - 1) * dd, 0, d - 1),
                0,
                hz * ht * w,
            ),
        )

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, ht=ht, w=w, ci=ci, d=d, dd=dd),
        grid=(d, nh),
        in_specs=[
            in_spec(0),
            in_spec(1),
            in_spec(2),
            pl.BlockSpec((1, co, ht * w), lambda dz, hz: (dz, 0, hz)),
        ],
        out_specs=pl.BlockSpec((3, 9 * ci, cop), lambda dz, hz: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 9 * ci, cop), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * ci * co * d * hb * w,
            bytes_accessed=(3 * (ht + 2) * nh * w * d * ci
                            + co * d * hb * w) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, xf, xf, gf)
    # rows are ordered (kh, kw, ci) within each kd — the fwd im2col order
    return dw[:, :, :co].reshape(3, 3, 3, ci, co)


def conv3d_dm_dw(x, g, dilation=(1, 1, 1), block_rows=None, interpret=False):
    """Weight gradient of :func:`conv3d_dm`: one pass over x and g computes
    all 27 taps (the XLA tap-dot fallback re-reads x 27×)."""
    fn = functools.partial(
        _conv3d_dm_dw_single,
        dilation=tuple(dilation),
        block_rows=block_rows,
        interpret=interpret,
    )
    if x.shape[0] == 1:
        return fn(x[0], g[0])
    return jax.vmap(fn)(x, g).sum(axis=0)
