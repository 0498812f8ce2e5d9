"""Flash attention for TPU (Pallas) with an XLA reference path.

The reference's hot loop is DINOv2 ViT-g attention over ~1k–16k tokens per
slice through xformers CUDA kernels (SURVEY.md §3.3). This is the
TPU-native equivalent: an online-softmax flash kernel that never
materializes the (N×N) score matrix in HBM.

Kernel layout:
- grid = (batch·heads, query blocks); each program holds one query block in
  VMEM and streams key/value blocks from the full per-(batch·head) K/V
  (which fit comfortably in VMEM for ViT sequence lengths: 16k × 64 × bf16
  = 2 MB),
- scores and the softmax running state (m, l, acc) accumulate in f32 on the
  MXU (``preferred_element_type``), inputs stay bf16,
- sequence padding to the block quantum is handled by masking padded *keys*
  with −∞ before the max/exp; padded queries are sliced off outside.

The XLA path (:func:`attention_reference`) is the numerics oracle and the
CPU/interpret fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_bhnd", "attention_reference"]

NEG_INF = -1e30


def attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """XLA attention oracle. q/k/v: ``(B, N, H, D)`` → ``(B, N, H, D)``."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, scale: float):
    # keep q/k in their storage dtype (bf16): the MXU multiplies bf16×bf16
    # with f32 accumulation at full rate, while upcasting inputs to f32
    # first would force a ~4× slower full-f32 matmul (measured: attention
    # dropped from 45% to ~15% of ViT-g runtime with this layout)
    q = q_ref[0]  # (BQ, D)
    block_q, head_dim = q.shape
    kv_pad = k_ref.shape[1]
    num_kb = kv_pad // block_k

    m0 = jnp.full((block_q,), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q,), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, head_dim), dtype=jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            kb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK) f32 accumulated
        # mask keys beyond the true sequence length
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p.astype(vb.dtype),
            vb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "dtype", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 1536,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention. q/k/v: ``(B, N, H, D)`` → ``(B, N, H, D)``.

    N is padded internally to the block quantum; padded keys are masked,
    padded query outputs sliced off.

    Default blocks measured on TPU v5e with ViT-g (1029 tokens, d=64):
    bq512 + full-sequence K/V block → 35.3 slices/s vs 32.1 at bq256/bk512
    (K/V fits VMEM comfortably up to ~16k tokens; longer sequences loop).
    """
    b, n, h, d = q.shape
    scale = d**-0.5
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    nq = _round_up(n, block_q)
    nk = _round_up(n, block_k)

    def prep(x, length):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, n, d).astype(dtype)
        return jnp.pad(x, ((0, 0), (0, length - n), (0, 0)))

    qf, kf, vf = prep(q, nq), prep(k, nk), prep(v, nk)

    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, kv_len=n, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * 2,
            transcendentals=b * h * n * n,
        ),
    )(qf, kf, vf)

    out = out[:, :n].reshape(b, h, n, d)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
    block_k: int = 1536,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention on head-major ``(B, H, N, D)`` inputs → same layout.

    Companion to the layout-folded qkv projection in
    ``models/dinov2.py:Attention``: the projection matmul emits head-major
    planes directly and the output projection consumes them, so this path
    performs ZERO transpose ops — reshapes here are free views, only the
    token axis gets padded. (XLA TPU transposes with 64-element minor dims
    ran at ~40 GB/s and cost as much as the attention math itself; a fully
    in-kernel packed-qkv variant is blocked by Mosaic tiling/batch-dim
    constraints.)
    """
    b, h, n, d = q.shape
    scale = d**-0.5
    if block_q is None:
        # single query block when it fits VMEM (scores block_q×block_k f32
        # ≤ ~8 MB): zero query padding waste — measured 39.9 vs 37.0
        # slices/s on ViT-g (n=1029, where fixed bq512 over-pads 33%)
        block_q = _round_up(n, 128) if n <= 1280 else 512
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(n, 128))
    # q and kv pad independently to their own block quanta: one shared
    # quantum either truncates the query grid (npad // block_q drops the
    # final partial block) or over-pads queries to block_k multiples
    nq = _round_up(n, block_q)
    nk = _round_up(n, block_k)

    def prep(x, length):
        x = x.reshape(b * h, n, d)
        if length != n:
            x = jnp.pad(x, ((0, 0), (0, length - n), (0, 0)))
        return x

    qf, kf, vf = prep(q, nq), prep(k, nk), prep(v, nk)
    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, kv_len=n, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, nk, d), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(qf.size + kf.size + vf.size + b * h * nq * d) * 2,
            transcendentals=b * h * n * n,
        ),
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, d)
