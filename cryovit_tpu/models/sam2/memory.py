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


class _KVParams(nn.Module):
    """{kernel, bias} param holder matching ``nn.Dense``'s tree (same
    shapes/inits, same name) — the cached cross-attention path needs the
    RAW weights so the linear k/v projection can split across the cached
    memory term, the static grid-PE term, and the recency-table term
    (``y = W·(mem + pos) + b = W·mem + (W·grid_pe + b) + W·tpos[r]``)."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _MemAttnLayer(nn.Module):
    """sam2 ``MemoryAttentionLayer`` (``memory_attention.py``), with the
    published ``sam2.1_hiera_l`` layer config: ``pos_enc_at_attn=False``,
    ``pos_enc_at_cross_attn_keys=True``, ``pos_enc_at_cross_attn_queries=
    False``, ReLU activation, ``dim_feedforward = 8·d_model``, one head.

    Two cross-attention paths over the SAME parameters:

    - :meth:`__call__` — the reference-shaped path: project the full
      flattened memory bank (+pos) per call (the training path and the
      python-oracle contract),
    - :meth:`cached` — consume per-slot k/v CACHES projected once at
      memory-write time (``project_spatial``/``project_ptr``), assembling
      the position stream from parameter-only tables that XLA hoists out
      of the tracking scan. Exact math by linearity of the projection
      and of RoPE (see ``SAM2Model._write_memory``); motivated by the r5
      ablation: with an unchanging bank XLA hoists the bank-side
      compute and the scan body drops 58% (BASELINE.md track_lab table).
    """

    d_model: int
    mem_dim: int
    num_heads: int = 1
    grid: tuple[int, int] = (32, 32)
    dtype: Any = jnp.float32

    def setup(self) -> None:
        d = self.d_model
        dt = self.dtype
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        self.self_q = nn.Dense(d, dtype=dt)
        self.self_k = nn.Dense(d, dtype=dt)
        self.self_v = nn.Dense(d, dtype=dt)
        self.self_out = nn.Dense(d, dtype=dt)
        self.cross_q = nn.Dense(d, dtype=dt)
        self.cross_k = _KVParams(self.mem_dim, d)
        self.cross_v = _KVParams(self.mem_dim, d)
        self.cross_out = nn.Dense(d, dtype=dt)
        self.mlp_fc1 = nn.Dense(8 * d, dtype=dt)
        self.mlp_fc2 = nn.Dense(d, dtype=dt)

    # ---- shared pieces ---------------------------------------------------

    def _heads(self, t):
        return t.reshape(t.shape[0], t.shape[1], self.num_heads, -1)

    def _attend(self, q, k, v, mask_cols=None):
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * (q.shape[-1] ** -0.5), k,
            preferred_element_type=jnp.float32,
        )
        if mask_cols is not None:
            logits = jnp.where(mask_cols[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return out.reshape(out.shape[0], out.shape[1], -1)

    def _self_attn(self, x):
        # self-attention with axial RoPE (pos_enc_at_attn=False: no pos
        # added; RoPE is applied after projection + head split)
        y = self.norm1(x)
        q = axial_rope(self._heads(self.self_q(y)), self.grid)
        k = axial_rope(self._heads(self.self_k(y)), self.grid)
        v = self._heads(self.self_v(y))
        return x + self.self_out(self._attend(q, k, v))

    def _mlp(self, x):
        # MLP (ReLU, dim_feedforward = 8·d in the published config)
        y = self.norm3(x)
        return x + self.mlp_fc2(nn.relu(self.mlp_fc1(y)))

    def _kv_weights(self):
        kk, kb = self.cross_k()
        vk, vb = self.cross_v()
        dt = self.dtype
        return kk.astype(dt), kb.astype(dt), vk.astype(dt), vb.astype(dt)

    # ---- reference-shaped path -------------------------------------------

    def __call__(self, x, mem, mem_pos, mem_mask, n_rope_k: int):
        """x (B, n, d); mem/mem_pos (B, M, mem_dim); mem_mask (B, M) bool;
        the first ``n_rope_k`` memory tokens are spatial (RoPE'd, tiled
        over grid repeats); the rest are object pointers (no RoPE)."""
        n = x.shape[1]
        x = self._self_attn(x)

        # cross-attention to the memory bank: k/v project mem_dim→d_model
        # (sam2 RoPEAttention kv_in_dim); pos added to k only, never v
        y = self.norm2(x)
        q = axial_rope(self._heads(self.cross_q(y)), self.grid)
        kk, kb, vk, vb = self._kv_weights()
        k = self._heads((mem + mem_pos).astype(self.dtype) @ kk + kb)
        v = self._heads(mem.astype(self.dtype) @ vk + vb)
        # rope_k_repeat over the spatial slots; pointer tokens excluded
        repeat = n_rope_k // n
        k_sp = axial_rope(k[:, :n_rope_k], self.grid, repeat=repeat)
        k = jnp.concatenate([k_sp, k[:, n_rope_k:]], axis=1)
        x = x + self.cross_out(self._attend(q, k, v, mem_mask))
        return self._mlp(x)

    # ---- cached path ------------------------------------------------------

    def project_spatial(self, mem):
        """One written memory slot (B, e², mem_dim) → this layer's k/v
        cache entries: ``k = rope(W_k·mem)`` (bias-free — the bias rides
        the static grid term so it is added exactly once) and
        ``v = W_v·mem + b_v`` (v never sees pos)."""
        kk, kb, vk, vb = self._kv_weights()
        mem = mem.astype(self.dtype)
        k = axial_rope(self._heads(mem @ kk), self.grid)
        return k.reshape(mem.shape[0], mem.shape[1], -1), mem @ vk + vb

    def project_ptr(self, tok):
        """Object-pointer tokens (B, ratio, mem_dim) → k/v cache entries
        (no RoPE on pointer tokens; k bias-free — it joins with the
        pointer-PE term per slice)."""
        kk, kb, vk, vb = self._kv_weights()
        tok = tok.astype(self.dtype)
        return tok @ kk, tok @ vk + vb

    def cached(self, x, k_sp, v_sp, k_pt, v_pt, recency, tpos, ptr_pe, mask):
        """Cross-attention from per-slot caches.

        k_sp/v_sp: (B, M, e², d) — rope'd bias-free W_k·mem / biased
        W_v·mem per slot. k_pt/v_pt: (B, P, ratio, d). recency: (M,)
        int32 recency index per spatial slot; tpos: (num_maskmem,
        mem_dim) ``maskmem_tpos_enc``; ptr_pe: (P, mem_dim) per-pointer
        temporal PE (zeros when disabled); mask: (B, M·e² + P·ratio).

        The static terms — ``rope(W_k·grid_pe + b_k)`` and the
        ``rope(W_k·tpos[r])`` recency table — depend only on parameters,
        so XLA hoists them out of the tracking scan; per slice the k
        stream assembles from the caches with two broadcast adds and a
        (num_maskmem)-row gather instead of re-projecting and re-RoPE-ing
        all M·e² memory tokens.
        """
        from cryovit_tpu.models.sam2.encoder import sine_position_encoding

        b, m, e2, d = k_sp.shape
        x = self._self_attn(x)
        y = self.norm2(x)
        q = axial_rope(self._heads(self.cross_q(y)), self.grid)
        kk, kb, vk, vb = self._kv_weights()

        # parameter-only tables (loop-invariant → hoisted out of the scan)
        grid_pe = jnp.asarray(
            sine_position_encoding(self.grid[0], self.grid[1], self.mem_dim),
            dtype=self.dtype,
        ).reshape(e2, self.mem_dim)
        base = self._heads((grid_pe @ kk + kb)[None])  # (1, e², h, d/h)
        base_r = axial_rope(base, self.grid).reshape(e2, d)
        ntp = tpos.shape[0]
        tpos_b = jnp.broadcast_to(
            (tpos.astype(self.dtype) @ kk)[:, None, :], (ntp, e2, d)
        )
        tpos_r = axial_rope(self._heads(tpos_b), self.grid).reshape(ntp, e2, d)

        k_spatial = (
            k_sp + base_r[None, None] + tpos_r[recency][None]
        ).reshape(b, m * e2, d)
        ptr_k_pe = (ptr_pe.astype(self.dtype) @ kk + kb)[None, :, None, :]
        k_ptr = (k_pt + ptr_k_pe).reshape(b, -1, d)
        k = self._heads(jnp.concatenate([k_spatial, k_ptr], axis=1))
        v = self._heads(
            jnp.concatenate(
                [v_sp.reshape(b, m * e2, d), v_pt.reshape(b, -1, d)], axis=1
            )
        )
        x = x + self.cross_out(self._attend(q, k, v, mask))
        return self._mlp(x)


class MemoryAttention(nn.Module):
    """Condition current-slice features on the memory bank
    (sam2 ``MemoryAttention``: ``pos_enc_at_input`` adds 0.1·curr_pos,
    final LayerNorm after the layer stack).

    Besides the reference-shaped :meth:`__call__`, exposes the cached
    tracking path: :meth:`project_memory` / :meth:`project_ptr` turn one
    newly written memory slot into ALL layers' k/v cache entries (one
    batched projection at write time), and :meth:`cached` consumes the
    caches per slice. See ``_MemAttnLayer`` / ``SAM2Model._write_memory``.
    """

    cfg: SAM2Config = SAM2Config.large()
    dtype: Any = jnp.float32

    def setup(self) -> None:
        cfg = self.cfg
        e = cfg.embed_size
        self._attn_layers = [
            _MemAttnLayer(
                d_model=cfg.d_model, mem_dim=cfg.mem_dim, num_heads=1,
                grid=(e, e), dtype=self.dtype, name=f"layer{i}",
            )
            for i in range(cfg.memory_attention_layers)
        ]
        self.norm_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def _input(self, feats, curr_pos):
        b, e, _, d = feats.shape
        return (
            feats.reshape(b, e * e, d)
            + 0.1 * curr_pos.reshape(curr_pos.shape[0], e * e, d)
        ).astype(self.dtype)

    def __call__(
        self,
        feats: jnp.ndarray,  # (B, e, e, d) current slice features
        curr_pos: jnp.ndarray,  # (B or 1, e, e, d) vision pos encoding
        mem_tokens: jnp.ndarray,  # (B, M, mem_dim) flattened memory bank
        mem_pos: jnp.ndarray,  # (B, M, mem_dim) memory pos embeddings
        mem_mask: jnp.ndarray,  # (B, M) validity
        n_rope_k: int | None = None,  # spatial (RoPE'd) token count
    ) -> jnp.ndarray:
        b, e, _, d = feats.shape
        x = self._input(feats, curr_pos)
        if n_rope_k is None:
            n_rope_k = mem_tokens.shape[1]
        for layer in self._attn_layers:
            x = layer(
                x, mem_tokens.astype(self.dtype), mem_pos.astype(self.dtype),
                mem_mask, n_rope_k,
            )
        x = self.norm_out(x)
        return x.reshape(b, e, e, d)

    # ---- cached tracking path -------------------------------------------

    def project_memory(self, mem: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, e², mem_dim) written slot → stacked per-layer caches
        ``k/v (B, e², L·d)`` (layer l on channels ``[l·d, (l+1)·d)``)."""
        ks, vs = zip(*(l.project_spatial(mem) for l in self._attn_layers))
        return jnp.concatenate(ks, axis=-1), jnp.concatenate(vs, axis=-1)

    def project_ptr(self, tok: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, ratio, mem_dim) pointer tokens → ``k/v (B, ratio, L·d)``."""
        ks, vs = zip(*(l.project_ptr(tok) for l in self._attn_layers))
        return jnp.concatenate(ks, axis=-1), jnp.concatenate(vs, axis=-1)

    def cached(
        self, feats, curr_pos, k_sp, v_sp, k_pt, v_pt, recency, tpos,
        ptr_pe, mask,
    ) -> jnp.ndarray:
        """Memory-conditioned features from the per-slot k/v caches.
        k_sp/v_sp: (B, M, e², L·d); k_pt/v_pt: (B, P, ratio, L·d);
        recency (M,), tpos (num_maskmem, mem_dim), ptr_pe (P, mem_dim),
        mask (B, M·e² + P·ratio)."""
        b, e, _, d = feats.shape
        x = self._input(feats, curr_pos)
        for i, layer in enumerate(self._attn_layers):
            sl = slice(i * d, (i + 1) * d)
            x = layer.cached(
                x, k_sp[..., sl], v_sp[..., sl], k_pt[..., sl], v_pt[..., sl],
                recency, tpos, ptr_pe, mask,
            )
        x = self.norm_out(x)
        return x.reshape(b, e, e, d)
