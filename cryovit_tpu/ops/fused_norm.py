"""Fused residual-add + LayerScale + LayerNorm (Pallas, TPU).

The ViT block's elementwise glue — ``x ← x + γ·h`` followed by
``LayerNorm(x)`` — is pure HBM traffic: with a bf16 residual stream the
XLA lowering costs ~5–6 passes over the (B, N, C) activation per
sub-block (read x, read h, write x_new; re-read x_new for the LN
statistics and normalize, write y), measured 132 ms per 64-slice
ViT-g batch — the largest non-matmul cost in the extractor profile
(BASELINE.md). This kernel emits BOTH results in one pass: read x and
h once, keep the sum in VMEM, write the new residual stream and the
normalized tensor — 4 passes, the bandwidth floor for this op.

Replaces the reference's separate ``x = x + self.ls1(self.attn(...))``
/ ``nn.LayerNorm`` ops (reference DINOv2 block, torch hub
``dinov2/layers/block.py``; consumed via ``run/dino_features.py:25-28``).

Inference-path only (like ``ops.flash_attention``): no custom VJP is
defined — the extractor is frozen everywhere it is used.

MEASURED NEGATIVE RESULT (v5e, 2026-08-18): in the full ViT-g extractor
this op is a consistent ~5% end-to-end LOSS (57.2 → 54.2 slices/s at
512²), invariant to block size (80/208/520 rows) and parallel grid
semantics. The custom-call boundary forces ``h`` (the attention/FFN
branch) to materialize in HBM as a kernel operand, where XLA's own loop
fusion folds the LayerScale multiply and the residual add into producer
epilogues and shares the LN-statistics pass — i.e. XLA's baseline is
closer to 4 passes than the ~6 assumed above. ``make_dinov2`` therefore
defaults ``fused_ln=False``; the op remains for shapes/backends where
XLA fuses worse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["residual_layernorm", "residual_layernorm_reference"]


def residual_layernorm_reference(
    x: jnp.ndarray,
    h: jnp.ndarray,
    gamma: jnp.ndarray | None,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    y_dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """XLA oracle: ``x_new = x + γ·h``; ``y = LN(x_new)·scale + bias``.

    Matches flax ``nn.LayerNorm`` semantics (f32 statistics, fast
    variance). ``gamma=None`` means a plain residual add.
    """
    hf = h.astype(jnp.float32)
    if gamma is not None:
        hf = hf * gamma.astype(jnp.float32)
    xn = x.astype(jnp.float32) + hf
    mean = jnp.mean(xn, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xn), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xn - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return xn.astype(x.dtype), y.astype(y_dtype)


def _residual_ln_kernel(
    x_ref, h_ref, g_ref, s_ref, b_ref, xo_ref, yo_ref, *, eps: float,
    has_gamma: bool,
):
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    h = h_ref[0].astype(jnp.float32)
    if has_gamma:
        h = h * g_ref[...].astype(jnp.float32)  # (1, C) broadcast
    xn = x + h
    xo_ref[0] = xn.astype(xo_ref.dtype)
    inv_c = 1.0 / xn.shape[-1]
    mean = jnp.sum(xn, axis=-1, keepdims=True) * inv_c
    cen = xn - mean
    var = jnp.sum(cen * cen, axis=-1, keepdims=True) * inv_c
    y = cen * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    yo_ref[0] = y.astype(yo_ref.dtype)


def _pick_rows(n: int, cap: int = 256) -> int | None:
    """Largest 16-aligned divisor of ``n`` that is ≤ ``cap`` (bounds the
    per-program VMEM: 4 × (rows, C) blocks + f32 temporaries)."""
    best = None
    for rows in range(16, cap + 1, 16):
        if n % rows == 0:
            best = rows
    return best


@functools.partial(
    jax.jit, static_argnames=("eps", "y_dtype", "interpret", "block_rows")
)
def residual_layernorm(
    x: jnp.ndarray,
    h: jnp.ndarray,
    gamma: jnp.ndarray | None,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    y_dtype=jnp.bfloat16,
    interpret: bool = False,
    block_rows: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``(x + γ·h, LayerNorm(x + γ·h))`` over ``(B, N, C)``.

    - ``x``: residual stream (its dtype is preserved in the first output),
    - ``h``: branch output to accumulate (attention / FFN),
    - ``gamma``: LayerScale vector ``(C,)`` or ``None`` for a plain add,
    - ``scale``/``bias``: LayerNorm affine ``(C,)``,
    - ``y_dtype``: dtype of the normalized output (the compute dtype).

    Requires a 16-aligned token count (the extractor pads its token axis
    to the attention kernel's quantum up front — see ``DinoV2.__call__``);
    non-conforming shapes fall back to the XLA oracle.
    """
    b, n, c = x.shape
    rows = block_rows if block_rows is not None else _pick_rows(n)
    if rows is None or n % rows or c % 128:
        return residual_layernorm_reference(
            x, h, gamma, scale, bias, eps=eps, y_dtype=y_dtype
        )
    has_gamma = gamma is not None
    g2 = (gamma if has_gamma else jnp.ones((c,), x.dtype)).reshape(1, c)
    s2 = scale.reshape(1, c)
    b2 = bias.reshape(1, c)

    grid = (b, n // rows)
    row_spec = pl.BlockSpec(
        (1, rows, c), lambda bi, ri: (bi, ri, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, c), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM)
    xo, yo = pl.pallas_call(
        functools.partial(_residual_ln_kernel, eps=eps, has_gamma=has_gamma),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, n, c), y_dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * n * c,
            bytes_accessed=(2 * x.size + 2 * h.size) * x.dtype.itemsize,
            transcendentals=b * n,
        ),
    )(x, h, g2, s2, b2)
    return xo, yo
