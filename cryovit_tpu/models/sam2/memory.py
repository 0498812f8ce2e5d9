"""SAM2 memory subsystem: memory encoder + memory attention.

- :class:`MemoryEncoder`: fuses the predicted mask (16×-downsampled by
  strided convs) with the slice's pixel features and projects to the
  compact ``mem_dim`` memory channel (sam2 MaskDownSampler + Fuser).
- :class:`MemoryAttention`: transformer layers where the current slice's
  features self-attend (2D axial RoPE) and cross-attend to the memory bank
  (spatial memories + object-pointer tokens).

TPU-native notes: the memory bank is a FIXED-SIZE ring buffer
(``num_maskmem`` slots) carried through a ``lax.scan`` over slices
(``model.py``) — the reference's python dict of per-frame outputs
(``models/sam2.py:457-532``) becomes a static tensor with a validity mask,
so the whole tracking loop is one compiled program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cryovit_tpu.models.sam2.config import SAM2Config

__all__ = ["MemoryEncoder", "MemoryAttention", "axial_rope"]


def _rope_freqs(dim: int, end: int, theta: float = 10000.0) -> np.ndarray:
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(end)
    return np.outer(t, freqs)  # (end, dim/2)


def axial_rope(x: jnp.ndarray, grid: tuple[int, int]) -> jnp.ndarray:
    """2D axial rotary embedding over a flattened (h·w) token axis.

    x: ``(B, h·w, H, D)``; the first D/2 channels rotate by row position,
    the rest by column position (sam2 RoPEAttention's axial scheme).
    """
    h, w = grid
    b, n, heads, d = x.shape
    half = d // 2
    fr = _rope_freqs(half, h)  # rows
    fc = _rope_freqs(half, w)  # cols
    rows = np.repeat(np.arange(h), w)
    cols = np.tile(np.arange(w), h)
    ang = np.concatenate([fr[rows], fc[cols]], axis=-1)  # (n, d/2)
    cos = jnp.asarray(np.cos(ang), dtype=x.dtype)[None, :, None, :]
    sin = jnp.asarray(np.sin(ang), dtype=x.dtype)[None, :, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(b, n, heads, d)


class MemoryEncoder(nn.Module):
    """(pixel features, predicted mask) → memory features (mem_dim)."""

    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pix_feat: jnp.ndarray, masks: jnp.ndarray
    ) -> jnp.ndarray:
        """pix_feat (B, e, e, d); masks (B, S, S, 1) high-res sigmoid-logits
        → (B, e, e, mem_dim)."""
        x = nn.sigmoid(masks)
        # 16× mask downsampler: 4 strided convs with LN+GELU
        ch = (4, 16, 64, self.cfg.d_model)
        for i, c in enumerate(ch):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        name=f"mask_down{i}")(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"mask_ln{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = x + nn.Conv(self.cfg.d_model, (1, 1), name="pix_proj")(pix_feat)
        # fuser: 2 depthwise-conv blocks (CXBlock-style)
        for i in range(2):
            y = nn.Conv(
                self.cfg.d_model, (7, 7), padding=[(3, 3), (3, 3)],
                feature_group_count=self.cfg.d_model, name=f"fuser_dw{i}",
            )(x)
            y = nn.LayerNorm(epsilon=1e-6, name=f"fuser_ln{i}")(y)
            y = nn.Dense(4 * self.cfg.d_model, name=f"fuser_fc1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.cfg.d_model, name=f"fuser_fc2_{i}")(y)
            gamma = self.param(f"fuser_gamma{i}", nn.initializers.constant(1e-6),
                               (self.cfg.d_model,))
            x = x + y * gamma
        return nn.Conv(self.cfg.mem_dim, (1, 1), name="out_proj")(x)


class _MemAttnLayer(nn.Module):
    d_model: int
    mem_dim: int
    num_heads: int = 1
    grid: tuple[int, int] = (32, 32)

    @nn.compact
    def __call__(self, x, mem_kv, mem_mask):
        """x (B, n, d); mem_kv (B, m, mem_dim); mem_mask (B, m) bool."""
        d = self.d_model
        h = self.num_heads
        hd = d // h

        # self-attention with axial RoPE
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="self_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = axial_rope(q.reshape(*q.shape[:2], h, hd), self.grid)
        k = axial_rope(k.reshape(*k.shape[:2], h, hd), self.grid)
        v = v.reshape(*v.shape[:2], h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        sa = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape[:2], d)
        x = x + nn.Dense(d, name="self_proj")(sa)

        # cross-attention to the memory bank (kv in mem_dim)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        q = nn.Dense(d, name="cross_q")(y).reshape(*y.shape[:2], h, hd)
        kv_dim = self.mem_dim
        khd = max(kv_dim // h, 1)
        km = nn.Dense(kv_dim, name="cross_k")(mem_kv).reshape(
            mem_kv.shape[0], mem_kv.shape[1], h, khd
        )
        vm = nn.Dense(kv_dim, name="cross_v")(mem_kv).reshape(
            mem_kv.shape[0], mem_kv.shape[1], h, khd
        )
        # project q into the memory head dim
        qm = nn.Dense(kv_dim, name="cross_q_down")(q.reshape(*y.shape[:2], d))
        qm = qm.reshape(*y.shape[:2], h, khd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qm * khd**-0.5, km,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mem_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(vm.dtype)
        ca = jnp.einsum("bhqk,bkhd->bqhd", attn, vm).reshape(
            *y.shape[:2], kv_dim
        )
        x = x + nn.Dense(d, name="cross_proj")(ca)

        # MLP
        y = nn.LayerNorm(epsilon=1e-6, name="norm3")(x)
        y = nn.Dense(8 * d, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        x = x + nn.Dense(d, name="mlp_fc2")(y)
        return x


class MemoryAttention(nn.Module):
    """Condition current-slice features on the memory bank."""

    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # (B, e, e, d) current slice features (+pos added)
        mem_tokens: jnp.ndarray,  # (B, M, mem_dim) flattened memory bank
        mem_mask: jnp.ndarray,  # (B, M) validity
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, e, _, d = feats.shape
        x = feats.reshape(b, e * e, d)
        for i in range(cfg.memory_attention_layers):
            x = _MemAttnLayer(
                d_model=d, mem_dim=cfg.mem_dim, num_heads=1, grid=(e, e),
                name=f"layer{i}",
            )(x, mem_tokens, mem_mask)
        x = nn.LayerNorm(epsilon=1e-6, name="norm_out")(x)
        return x.reshape(b, e, e, d)
