"""SAM2 memory subsystem: memory encoder + memory attention.

Faithful flax rebuilds of the published sam2 modules (the reference uses
the stock ``sam2`` package via ``SAM2Base``, reference
``models/sam2.py:322-342``), so ``sam2.1_hiera_large`` / ``MedSAM2``
checkpoints map tensor-for-tensor (see ``convert.py``):

- :class:`MemoryEncoder` ≙ ``sam2/modeling/memory_encoder.py``:
  ``MaskDownSampler`` (4 strided 3×3 convs 1→4→16→64→256, LayerNorm2d
  eps 1e-6 + GELU, then a final 1×1 conv), ``pix_feat_proj`` 1×1,
  ``Fuser`` of 2 ``CXBlock``s (7×7 depthwise conv + LN + pointwise MLP +
  LayerScale), 1×1 ``out_proj`` to ``mem_dim``.
- :class:`MemoryAttention` ≙ ``sam2/modeling/memory_attention.py``:
  ``MemoryAttentionLayer`` with ``RoPEAttention`` self-attention
  (separate q/k/v/out projections, axial RoPE applied after head split)
  and ``RoPEAttention(kv_in_dim=mem_dim, rope_k_repeat=True)``
  cross-attention to the memory bank (k/v project mem_dim→d_model; RoPE
  on the spatial memory tokens only — object-pointer tokens are excluded
  via ``num_k_exclude_rope``), ReLU MLP (``dim_feedforward`` 8·d), and
  the module-level contracts: ``pos_enc_at_input`` adds 0.1·curr_pos,
  ``pos_enc_at_cross_attn_keys`` adds the memory pos embedding to k (but
  never to v), LayerNorms at torch's default eps 1e-5.
- :func:`axial_rope` ≙ ``sam2/modeling/position_encoding.py``
  ``compute_axial_cis``/``apply_rotary_enc``: x (column) frequencies in
  the first half of the rotary channels, y (row) in the second, adjacent
  channel pairs treated as complex.

TPU-native notes: the memory bank is a FIXED-SIZE ring buffer
(``num_maskmem`` slots) carried through a ``lax.scan`` over slices
(``model.py``) — the reference's python dict of per-frame outputs
(``models/sam2.py:457-532``) becomes a static tensor with a validity
mask, so the whole tracking loop is one compiled program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cryovit_tpu.models.sam2.config import SAM2Config

__all__ = [
    "MemoryEncoder",
    "MemoryAttention",
    "axial_rope",
    "sine_pe_1d",
]


def _axial_angles(dim: int, grid: tuple[int, int], theta: float = 10000.0) -> np.ndarray:
    """Rotation angles for 2D axial RoPE over a row-major (h·w) token axis.

    sam2 ``compute_axial_cis``: per-pair frequencies ``theta^(-4k/dim)``
    (k < dim//4); token t sits at column ``t % w`` (the "x" axis, first
    dim//4 rotary pairs) and row ``t // w`` ("y", remaining pairs).
    Returns ``(h·w, dim//2)`` angles for the complex-pair rotation.
    """
    quarter = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[:quarter] / dim))
    h, w = grid
    t = np.arange(h * w)
    tx, ty = t % w, t // w
    fx = np.outer(tx, freqs)
    fy = np.outer(ty, freqs)
    return np.concatenate([fx, fy], axis=-1)  # (h·w, dim/2)


def axial_rope(
    x: jnp.ndarray, grid: tuple[int, int], repeat: int = 1
) -> jnp.ndarray:
    """Apply 2D axial rotary embedding (sam2 ``apply_rotary_enc``).

    x: ``(B, N, H, D)`` with ``N == repeat · h · w`` — ``repeat > 1``
    tiles the grid angles (sam2 ``rope_k_repeat`` for the per-slot
    spatial memory tokens). Adjacent channel pairs rotate as complex
    numbers; the first D/4 pairs by column position, the rest by row.
    """
    b, n, heads, d = x.shape
    ang = _axial_angles(d, grid)
    if repeat > 1:
        ang = np.tile(ang, (repeat, 1))
    cos = jnp.asarray(np.cos(ang), dtype=x.dtype)[None, :, None, :]
    sin = jnp.asarray(np.sin(ang), dtype=x.dtype)[None, :, None, :]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(b, n, heads, d)


def sine_pe_1d(pos: jnp.ndarray, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """1D sine position embedding (sam2 ``get_1d_sine_pe``): ``pos``
    (...,) → (..., dim), first half sin, second half cos."""
    pe_dim = dim // 2
    dim_t = np.arange(pe_dim, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    ang = pos[..., None] / jnp.asarray(dim_t)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class MemoryEncoder(nn.Module):
    """(pixel features, predicted mask) → memory features (mem_dim)."""

    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, pix_feat: jnp.ndarray, masks: jnp.ndarray, skip_sigmoid: bool = False
    ) -> jnp.ndarray:
        """pix_feat (B, e, e, d); masks (B, S, S, 1) high-res mask logits
        (``skip_sigmoid`` when the caller pre-applied sigmoid + the
        ``sigmoid_scale/bias_for_mem_enc`` affine, sam2
        ``_encode_new_memory``) → (B, e, e, mem_dim)."""
        x = masks if skip_sigmoid else nn.sigmoid(masks)
        # MaskDownSampler: 16× total stride via 4 stride-2 convs whose
        # channels grow by stride² per layer (1→4→16→64→256), LN+GELU
        # between, then a final 1×1 projection to d_model — matching
        # sam2's parameterization exactly (for the published configs
        # d_model = 256 so the final conv is 256→256)
        ch = tuple(4 ** (i + 1) for i in range(4))
        x = x.astype(self.dtype)
        for i, c in enumerate(ch):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"mask_down{i}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"mask_ln{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.cfg.d_model, (1, 1), dtype=self.dtype,
                    name="mask_down_final")(x)
        x = x + nn.Conv(self.cfg.d_model, (1, 1), dtype=self.dtype,
                        name="pix_proj")(pix_feat)
        # Fuser: 2 CXBlocks (depthwise conv + LN + pointwise MLP + scale)
        for i in range(2):
            y = nn.Conv(
                self.cfg.d_model, (7, 7), padding=[(3, 3), (3, 3)],
                feature_group_count=self.cfg.d_model, dtype=self.dtype,
                name=f"fuser_dw{i}",
            )(x)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"fuser_ln{i}")(y)
            y = nn.Dense(4 * self.cfg.d_model, dtype=self.dtype,
                         name=f"fuser_fc1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.cfg.d_model, dtype=self.dtype,
                         name=f"fuser_fc2_{i}")(y)
            gamma = self.param(f"fuser_gamma{i}", nn.initializers.constant(1e-6),
                               (self.cfg.d_model,))
            x = x + y * gamma.astype(self.dtype)
        return nn.Conv(self.cfg.mem_dim, (1, 1), dtype=self.dtype,
                       name="out_proj")(x)


class _MemAttnLayer(nn.Module):
    """sam2 ``MemoryAttentionLayer`` (``memory_attention.py``), with the
    published ``sam2.1_hiera_l`` layer config: ``pos_enc_at_attn=False``,
    ``pos_enc_at_cross_attn_keys=True``, ``pos_enc_at_cross_attn_queries=
    False``, ReLU activation, ``dim_feedforward = 8·d_model``, one head.
    """

    d_model: int
    mem_dim: int
    num_heads: int = 1
    grid: tuple[int, int] = (32, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mem, mem_pos, mem_mask, n_rope_k: int):
        """x (B, n, d); mem/mem_pos (B, M, mem_dim); mem_mask (B, M) bool;
        the first ``n_rope_k`` memory tokens are spatial (RoPE'd, tiled
        over grid repeats); the rest are object pointers (no RoPE)."""
        d = self.d_model
        h = self.num_heads
        hd = d // h
        bsz, n, _ = x.shape

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, -1)

        def attend(q, k, v, mask_cols=None):
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * (q.shape[-1] ** -0.5), k,
                preferred_element_type=jnp.float32,
            )
            if mask_cols is not None:
                logits = jnp.where(mask_cols[:, None, None, :], logits, -1e30)
            attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            return out.reshape(out.shape[0], out.shape[1], -1)

        # self-attention with axial RoPE (pos_enc_at_attn=False: no pos
        # added; RoPE is applied after projection + head split)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        q = axial_rope(heads(nn.Dense(d, dtype=self.dtype, name="self_q")(y)), self.grid)
        k = axial_rope(heads(nn.Dense(d, dtype=self.dtype, name="self_k")(y)), self.grid)
        v = heads(nn.Dense(d, dtype=self.dtype, name="self_v")(y))
        x = x + nn.Dense(d, dtype=self.dtype, name="self_out")(attend(q, k, v))

        # cross-attention to the memory bank: k/v project mem_dim→d_model
        # (sam2 RoPEAttention kv_in_dim); pos added to k only, never v
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        q = axial_rope(heads(nn.Dense(d, dtype=self.dtype, name="cross_q")(y)), self.grid)
        k = heads(nn.Dense(d, dtype=self.dtype, name="cross_k")(mem + mem_pos))
        v = heads(nn.Dense(d, dtype=self.dtype, name="cross_v")(mem))
        # rope_k_repeat over the spatial slots; pointer tokens excluded
        repeat = n_rope_k // n
        k_sp = axial_rope(k[:, :n_rope_k], self.grid, repeat=repeat)
        k = jnp.concatenate([k_sp, k[:, n_rope_k:]], axis=1)
        x = x + nn.Dense(d, dtype=self.dtype, name="cross_out")(attend(q, k, v, mem_mask))

        # MLP (ReLU, dim_feedforward = 8·d in the published config)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        y = nn.Dense(8 * d, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.relu(y)
        return x + nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(y)


class MemoryAttention(nn.Module):
    """Condition current-slice features on the memory bank
    (sam2 ``MemoryAttention``: ``pos_enc_at_input`` adds 0.1·curr_pos,
    final LayerNorm after the layer stack)."""

    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # (B, e, e, d) current slice features
        curr_pos: jnp.ndarray,  # (B or 1, e, e, d) vision pos encoding
        mem_tokens: jnp.ndarray,  # (B, M, mem_dim) flattened memory bank
        mem_pos: jnp.ndarray,  # (B, M, mem_dim) memory pos embeddings
        mem_mask: jnp.ndarray,  # (B, M) validity
        n_rope_k: int | None = None,  # spatial (RoPE'd) token count
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, e, _, d = feats.shape
        x = (
            feats.reshape(b, e * e, d)
            + 0.1 * curr_pos.reshape(curr_pos.shape[0], e * e, d)
        ).astype(self.dtype)
        if n_rope_k is None:
            n_rope_k = mem_tokens.shape[1]
        for i in range(cfg.memory_attention_layers):
            x = _MemAttnLayer(
                d_model=d, mem_dim=cfg.mem_dim, num_heads=1, grid=(e, e),
                dtype=self.dtype, name=f"layer{i}",
            )(x, mem_tokens.astype(self.dtype), mem_pos.astype(self.dtype),
              mem_mask, n_rope_k)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)
        return x.reshape(b, e, e, d)
