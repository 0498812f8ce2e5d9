"""Fused windowed attention for the Hiera trunk (Pallas, TPU).

The SAM2 ``sam_features`` hot loop (reference ``models/sam2.py:190-209``)
runs Hiera-L's stage-3 blocks — 33 windowed (256-token windows) + 3
global (1024 tokens) of the 48 — as XLA einsums with bf16 softmax score
tensors that round-trip HBM between the QK matmul, the max/exp/normalize
passes, and the PV matmul. BASELINE.md (r3) records that fusing the
denominator into PV in *XLA form* loses (121.6 → 108.4): only a kernel
that controls the tiles wins that trade. This is that kernel.

Layout contract (head-padded, lane-aligned):
- q/k/v: ``(N, T, H·128)`` bf16 — window-partitioned tokens T on
  sublanes, head ``h`` on lanes ``[128h, 128(h+1))`` with the model's
  ``head_dim`` (72 for every Hiera) real channels at the front and
  zeros above. The padding is folded into the qkv projection WEIGHTS
  (zero columns — see ``hiera._pack_qkv``), so the kernel sees fully
  tile-aligned per-head slices and the MXU cost is unchanged: a d=72
  contraction already pays for 128 lanes.
- v carries a constant ONES column at lane ``head_dim`` of each head
  (from the packed projection's bias), so the PV matmul's column
  ``head_dim`` is the softmax row-sum — the denominator costs zero
  extra MXU passes (the DINOv2 kernel's ones-augmented-V trick, here
  hiding in lanes that were already padding).
- q arrives pre-scaled by ``head_dim**-0.5 · log2(e)`` (folded into the
  projection weights); the kernel exponentiates with bf16 ``exp2``.
- output: ``(N, T, H·128)``; lanes ``head_dim..127`` of each head hold
  the denominator column (≡1 after normalize) and zeros — the consumer
  contracts with a ROW-PACKED output projection whose rows there are
  exactly zero (``hiera._pack_proj``), so they never reach the model.

Grid: ``(N, H)`` — one (window, head) tile per program; Mosaic pipelines
the 64 KB q/k/v block DMAs across grid steps. Applied only where the
window holds ≥128 tokens (stage 3): at 64/16-token windows (stages
1/2/4) the per-dot floor dominates and XLA's batched einsum wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = [
    "window_attention",
    "window_attention_reference",
    "window_block_attention",
    "window_block_mlp",
    "window_kernel_enabled",
    "set_window_kernel",
]

# test hook, mirrors ops.conv3d_dm._FORCE_KERNEL
_FORCE_KERNEL: bool | str | None = None


def set_window_kernel(enabled: bool | str | None) -> None:
    """Force the kernel on/off, ``"interpret"`` for interpret-mode
    execution (CPU-testable), or ``None`` to restore auto (TPU only)."""
    global _FORCE_KERNEL
    _FORCE_KERNEL = enabled


def window_kernel_enabled() -> bool:
    if _FORCE_KERNEL is not None:
        return bool(_FORCE_KERNEL)
    return jax.default_backend() not in ("cpu",)


def window_kernel_interpret() -> bool:
    return _FORCE_KERNEL == "interpret"


def window_attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, head_dim: int
) -> jnp.ndarray:
    """XLA oracle on the same head-padded layout (q pre-scaled·log2e)."""
    n, t, hp = q.shape
    h = hp // 128
    qh = q.reshape(n, t, h, 128)
    kh = k.reshape(n, t, h, 128)
    vh = v.reshape(n, t, h, 128)
    s = jnp.einsum(
        "nqhd,nkhd->nhqk", qh, kh, preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m).astype(jnp.bfloat16))
    pv = jnp.einsum(
        "nhqk,nkhd->nqhd", p.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    den = pv[..., head_dim : head_dim + 1]
    out = pv / den
    return out.reshape(n, t, hp).astype(q.dtype)


def _ln_f32(x, g_ref, b_ref, eps: float):
    """In-kernel LayerNorm: f32 statistics over the lane (channel) axis —
    the same math flax's LayerNorm(dtype=bf16) performs (f32 stats on
    bf16-read inputs, use_fast_variance), but on VMEM-resident tiles."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - m * m
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (xf - m) * inv * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32
    )
    return y.astype(x.dtype)


def _wkb_kernel(
    x_ref, g_ref, b_ref, wq_ref, bq_ref, wp_ref, bp_ref, o_ref,
    *, heads: int, head_dim: int, eps: float,
):
    """Fused attention HALF-BLOCK for one window:
    ``out = x + proj(attention(qkv(LN1(x))))``.

    All intermediates (normalized tokens, padded qkv planes, score
    tiles, probabilities, per-head outputs) live and die in VMEM; the
    program's HBM traffic is x in, out out, and the packed weights once
    (their block index is constant across the grid, so Mosaic's
    revolving buffers skip the re-DMA after step 0)."""
    x = x_ref[0]  # (T, C) bf16
    hp = heads * 128
    y = _ln_f32(x, g_ref, b_ref, eps)
    qkv = jax.lax.dot_general(
        y, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bq_ref[...].astype(jnp.float32)).astype(x.dtype)  # (T, 3·hp)
    outs = []
    for h in range(heads):
        q = qkv[:, h * 128 : (h + 1) * 128]
        k = qkv[:, hp + h * 128 : hp + (h + 1) * 128]
        v = qkv[:, 2 * hp + h * 128 : 2 * hp + (h + 1) * 128]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(s, axis=-1)
        p = jnp.exp2((s - m[:, None]).astype(jnp.bfloat16))
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        den = pv[:, head_dim : head_dim + 1]
        outs.append((pv * (1.0 / den)).astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1)  # (T, hp)
    out = jax.lax.dot_general(
        attn, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[...].astype(jnp.float32)
    o_ref[0] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "head_dim", "eps", "interpret")
)
def window_block_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    heads: int,
    head_dim: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention half-block: ``x + proj(attn(qkv(LN(x))))``, one
    window per grid step.

    - x: ``(N, T, C)`` bf16 window-partitioned tokens (T a multiple of
      16, ≤512 — the f32 score tiles must fit VMEM).
    - ln_scale/ln_bias: ``(1, C)`` LayerNorm affine.
    - w_qkv: ``(C, 3·heads·128)`` head-padded packed weights — zero pad
      columns, softmax scale·log2(e) folded into the q third (the kernel
      exponentiates with exp2); b_qkv ``(1, 3·heads·128)`` likewise, with
      a constant 1 at lane ``head_dim`` of every v head (the PV matmul
      then emits the softmax denominator in that lane for free).
    - w_proj: ``(heads·128, C)`` row-packed output projection — exact
      zeros at pad rows, so the padded lanes (incl. the denominator
      column) never reach the output; b_proj ``(1, C)``.
    """
    n, t, c = x.shape
    hp3 = 3 * heads * 128
    kern = functools.partial(
        _wkb_kernel, heads=heads, head_dim=head_dim, eps=eps
    )
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, hp3), lambda i: (0, 0)),
            pl.BlockSpec((1, hp3), lambda i: (0, 0)),
            pl.BlockSpec((heads * 128, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj)


def _erf_f32(x):
    """erf from Mosaic-supported primitives (``lax.erf`` has no Pallas TPU
    lowering): Abramowitz & Stegun 7.1.26, |abs err| ≤ 1.5e-7 — three
    decades below the bf16 output quantum, so the exact-GELU parity with
    ``nn.gelu(approximate=False)`` is preserved at storage precision."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _wmlp_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, chunks: int, eps: float,
):
    """Fused MLP HALF-BLOCK for one window:
    ``out = x + fc2(gelu(fc1(LN2(x))))`` (exact erf GELU).

    The hidden activation is never materialized: fc1/gelu/fc2 run over
    ``chunks`` column-chunks of the hidden dim, accumulating fc2's
    output in an f32 VMEM tile."""
    x = x_ref[0]  # (T, C) bf16
    y = _ln_f32(x, g_ref, b_ref, eps)
    f = w1_ref.shape[1]
    ch = f // chunks
    acc = x.astype(jnp.float32) + b2_ref[...].astype(jnp.float32)
    for i in range(chunks):
        w1c = w1_ref[:, i * ch : (i + 1) * ch]
        h = jax.lax.dot_general(
            y, w1c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, i * ch : (i + 1) * ch].astype(jnp.float32)
        # exact GELU (erf form — parity with nn.gelu(approximate=False))
        h = 0.5 * h * (1.0 + _erf_f32(h * (2.0**-0.5)))
        acc = acc + jax.lax.dot_general(
            h.astype(x.dtype), w2_ref[i * ch : (i + 1) * ch, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunks", "eps", "interpret"))
def window_block_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    chunks: int = 0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MLP half-block: ``x + fc2(gelu(fc1(LN(x))))`` per window.

    x: ``(N, T, C)``; w1 ``(C, F)``, b1 ``(1, F)``, w2 ``(F, C)``,
    b2 ``(1, C)``. ``chunks=0`` picks the hidden-chunk count so each
    f32 hidden tile stays under ~1 MB of VMEM.
    """
    n, t, c = x.shape
    f = w1.shape[1]
    if chunks == 0:
        chunks = 1
        while f % (chunks * 2) == 0 and t * (f // chunks) * 4 > 1_000_000:
            chunks *= 2
    kern = functools.partial(_wmlp_kernel, chunks=chunks, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


# ---------------------------------------------------------------------------
# Standalone per-(window, head) attention kernel: the production path for
# Hiera's GLOBAL 1024-token blocks (hiera.MultiScaleAttention.
# _global_kernel_attention packs the projections head-padded and calls
# this with N=batch, T=tokens), and the interpret-mode probe pair for the
# fused block kernels above (tests/test_sam2.py::
# test_window_attention_matches_reference).
# ---------------------------------------------------------------------------


def _wk_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim: int):
    qs = q_ref[0]  # (T, 128) bf16, pre-scaled by d^-1/2 · log2(e)
    ks = k_ref[0]
    vs = v_ref[0]
    s = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T) f32 — never leaves VMEM
    m = jnp.max(s, axis=-1)
    # bf16 probabilities in the log2 domain (the r3 softmax recipe); the
    # shift is exact in f32, the exp2 runs at double VPU rate in bf16
    p = jnp.exp2((s - m[:, None]).astype(jnp.bfloat16))
    pv = jax.lax.dot_general(
        p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, 128); column head_dim = softmax denominator (v ones column)
    den = pv[:, head_dim : head_dim + 1]
    o_ref[0] = (pv * (1.0 / den)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_dim", "interpret"))
def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    head_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused per-window attention on head-padded planes (see module doc).

    q/k/v: ``(N, T, H·128)`` with T a multiple of 16 (bf16 sublane tile);
    returns the same layout.
    """
    n, t, hp = q.shape
    h = hp // 128
    spec = pl.BlockSpec((1, t, 128), lambda i, j: (i, 0, j))
    return pl.pallas_call(
        functools.partial(_wk_kernel, head_dim=head_dim),
        grid=(n, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)
