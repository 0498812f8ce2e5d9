"""Shared int8 quantization helpers for the opt-in w8a8 matmul modes.

The v5e MXU runs int8×int8→int32 at ~1.5× its bf16 rate (measured 269 vs
182 T/s on the ViT-g MLP shape, tools/mxu_probe.py). Quantizing a matmul
only pays when the matmul's own time saving exceeds the unfused abs-max +
round HBM pass over its activation operand — see BASELINE.md's w8a8
attribution for which projections qualify in each model. Used by the
DINOv2 extractor (``models/dinov2.py``) and the SAM2 Hiera trunk
(``models/sam2/hiera.py``); always opt-in (``--int8``), never the default
bf16 path the driver benchmarks.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["int8_quant", "qeinsum"]


def int8_quant(x: jnp.ndarray, axis) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization over the contraction axis/axes.

    Returns ``(values int8, scale f32 with `axis` kept as size-1)`` such
    that ``values · scale ≈ x``. Quantize per-token (activations, last
    axis) / per-output-channel (weights, contraction axis) on the fly.
    """
    ax = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(ax), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(ax / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def qeinsum(spec: str, x, w, sx, sw, out_sx, out_sw, dtype):
    """int8 einsum + f32 dequantization epilogue → ``dtype``.

    ``out_sx``/``out_sw`` reshape the kept activation/weight scales to
    broadcast against the einsum output."""
    out = jnp.einsum(spec, x, w, preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * out_sx(sx) * out_sw(sw)).astype(dtype)
