"""Hiera backbone (SAM2 "hieradet" trunk) in flax.

Hierarchical ViT with windowed attention: 7×7/4 patch embed, four stages
with dim/head doubling and 2× query pooling at stage transitions, fixed
window sizes per stage, and a few global-attention blocks in stage 3.
Position embedding = interpolated global background embedding + tiled
window embedding (the sam2 ``hieradet`` scheme).

TPU-native notes: window partitioning is pure reshape/transpose (no
gather); attention runs as one batched einsum over all windows so the MXU
sees a single large matmul per block.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from cryovit_tpu.models.sam2.config import HieraConfig
from cryovit_tpu.ops.quant import int8_quant
from cryovit_tpu.ops.resize import bicubic_resize_matrix
from cryovit_tpu.ops.window_attention import (
    window_attention,
    window_block_attention,
    window_block_mlp,
    window_kernel_enabled,
    window_kernel_interpret,
)

__all__ = ["Hiera"]

LOG2E = 1.4426950408889634


def _qkv_pack_cols(heads: int, d: int) -> tuple[np.ndarray, np.ndarray]:
    """Static column map for the head-padded qkv layout: real column j of
    the (C, 3·H·d) projection lands at ``third·H·128 + head·128 + r`` —
    every head starts a fresh 128-lane tile (see ops/window_attention.py).
    Also returns the v-third "ones" columns (lane ``d`` of each head)."""
    hd = heads * d
    j = np.arange(3 * hd)
    third, jj = j // hd, j % hd
    cols = third * heads * 128 + (jj // d) * 128 + (jj % d)
    ones_cols = 2 * heads * 128 + np.arange(heads) * 128 + d
    return cols, ones_cols


class _Dense(nn.Module):
    """``nn.Dense``-compatible projection ({kernel, bias} tree, lecun-normal
    init) with an opt-in w8a8 path (``ops/quant.py``): per-token activation
    / per-output-channel weight int8 scales, int8×int8→int32 on the MXU,
    f32 dequant epilogue. Only the qkv and mlp_fc1 projections opt in —
    quantizing the attention out-proj / mlp_fc2 costs an abs-max + round
    HBM pass over their (large) inputs that cancels the matmul saving
    (measured wash on the DINOv2 extractor, BASELINE.md w8a8 attribution).
    """

    features: int
    dtype: Any = jnp.float32
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        bias_d = bias.astype(self.dtype)
        if not self.quant_int8:
            return x.astype(self.dtype) @ kernel.astype(self.dtype) + bias_d
        xq, sx = int8_quant(x, axis=-1)  # (..., C) int8, (..., 1) f32
        if self.has_variable("qweights", "wq"):
            # pre-quantized once at extractor setup (the trunk is frozen;
            # re-quantizing the (C, D) weight inside the jitted forward
            # was a recurring HBM pass per projection per batch —
            # SamFeatureExtractor builds the collection host-side)
            wq = self.get_variable("qweights", "wq")
            sw = self.get_variable("qweights", "sw")
        else:
            wq, sw = int8_quant(kernel, axis=0)  # (C, D) int8, (1, D) f32
        out = jnp.einsum("...c,cd->...d", xq, wq, preferred_element_type=jnp.int32)
        return (out.astype(jnp.float32) * sx * sw).astype(self.dtype) + bias_d


class _LNParams(nn.Module):
    """Param holder matching an ``nn.LayerNorm`` {scale, bias} tree."""

    features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _AttnParams(nn.Module):
    """Param holder matching ``MultiScaleAttention``'s tree (qkv _Dense +
    proj nn.Dense) for the fused window-block kernel path."""

    dim: int
    dim_out: int

    @nn.compact
    def __call__(self):
        kq, bq = _ProjParams(self.dim, 3 * self.dim_out, name="qkv")()
        kp, bp = _ProjParams(self.dim_out, self.dim_out, name="proj")()
        return kq, bq, kp, bp


class _ProjParams(nn.Module):
    """Param holder matching an ``nn.Dense``/``_Dense`` {kernel, bias}
    tree (same shapes, same lecun-normal/zeros init) — used by the fused
    window-attention kernel path, which needs the RAW weights to pack
    rather than a projection applied for it."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _window_partition(x: jnp.ndarray, w: int) -> tuple[jnp.ndarray, tuple[int, int]]:
    """(B, H, W, C) → (B·nh·nw, w, w, C), padding H/W up to multiples of w."""
    b, h, wdt, c = x.shape
    pad_h = (-h) % w
    pad_w = (-wdt) % w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, wdt + pad_w
    x = x.reshape(b, hp // w, w, wp // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)
    return x, (hp, wp)


def _window_unpartition(
    x: jnp.ndarray, w: int, padded: tuple[int, int], out: tuple[int, int]
) -> jnp.ndarray:
    hp, wp = padded
    h, wdt = out
    b = x.shape[0] // ((hp // w) * (wp // w))
    x = x.reshape(b, hp // w, wp // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :wdt]


class MultiScaleAttention(nn.Module):
    """Attention with optional 2× query pooling (stage transition)."""

    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: Any = jnp.float32
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        if (
            not self.q_pool
            and self.dtype != jnp.float32
            and x.shape[-1] == self.dim_out
            and head_dim < 128
            and 512 <= h * w <= 2048
            and (h * w) % 16 == 0
            and window_kernel_enabled()
        ):
            # Global-attention kernel path (Hiera-L's 3 global blocks at
            # 1024 tokens): the fused two-kernel block is VMEM-infeasible
            # here (a (1024, 3·H·128) f32 qkv intermediate alone is
            # ~12 MB), so the projections stay XLA but attention proper
            # runs as the per-(batch, head) Pallas kernel on head-padded
            # planes — the (1024, 1024) f32 score tile, bf16-exp2
            # probabilities, and the PV-fused softmax denominator live
            # and die in VMEM instead of round-tripping ~400 MB of score
            # tensors per block through HBM (the XLA path below
            # materializes s, p, and attn at (B, H, 1024, 1024)).
            return self._global_kernel_attention(x)
        qkv = _Dense(
            3 * self.dim_out,
            dtype=self.dtype,
            quant_int8=self.quant_int8,
            name="qkv",
        )(x)

        if not self.q_pool and self.dtype != jnp.float32:
            # per-head lane-slice attention: the head-major einsum layout
            # forces XLA to materialize (n ↔ heads) transposes of the
            # qkv-sized tensor; slicing each head's (b, n, d) directly off
            # the projection's lane axis keeps tokens on sublanes and d on
            # lanes end to end, so the per-head einsums carry no batch
            # transposes at all. Math identical to the head-major path.
            flat = qkv.reshape(b, h * w, 3 * self.dim_out)
            C, d = self.dim_out, head_dim
            scale = head_dim**-0.5
            outs = []
            for hh in range(self.num_heads):
                qh = flat[..., hh * d : (hh + 1) * d]
                kh = flat[..., C + hh * d : C + (hh + 1) * d]
                vh = flat[..., 2 * C + hh * d : 2 * C + (hh + 1) * d]
                s = jnp.einsum(
                    "bnd,bmd->bnm", qh * scale, kh,
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
                p = jnp.exp(
                    s
                    - jax.lax.stop_gradient(
                        jnp.max(s, axis=-1, keepdims=True)
                    )
                )
                denom = jnp.sum(
                    p.astype(jnp.float32), axis=-1, keepdims=True
                )
                attn = (p * (1.0 / denom).astype(self.dtype)).astype(
                    vh.dtype
                )
                outs.append(jnp.einsum("bnm,bmd->bnd", attn, vh))
            out = jnp.concatenate(outs, axis=-1).reshape(b, h, w, C)
            return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)

        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.q_pool:
            # 2×2 max-pool on the query grid (matches hieradet q_pool)
            q = q.reshape(b, h, w, self.num_heads, head_dim)
            q = nn.max_pool(
                q.reshape(b, h, w, self.num_heads * head_dim),
                window_shape=(2, 2),
                strides=(2, 2),
            ).reshape(b, (h // 2) * (w // 2), self.num_heads, head_dim)
            out_hw = (h // 2, w // 2)
        else:
            out_hw = (h, w)

        scale = head_dim**-0.5
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if self.dtype == jnp.float32:
            attn = jax.nn.softmax(logits, axis=-1)
        else:
            # bf16 score tensors: the windowed/global score tiles are the
            # encoder's largest intermediates (stage 1: 537 MB per pass at
            # batch 64) and the f32 softmax's reduce+normalize passes
            # dominated the device profile (~50% of encoder time,
            # tools/op_profile.py). Shift in f32 (exact max), exponentiate
            # and store probabilities in the compute dtype, accumulate the
            # denominator in f32 — same recipe as the DINOv2 flash kernel
            # (ops/flash_attention.py:softmax_num).
            # the cast fuses into the matmul epilogue, so the score tensor
            # is materialized once at 2 bytes/elem; the max pass then reads
            # bf16 too (the softmax shift need not be the exact f32 max —
            # any bound within ~88 of it prevents overflow)
            s = logits.astype(self.dtype)
            shifted = s - jax.lax.stop_gradient(
                jnp.max(s, axis=-1, keepdims=True)
            )
            p = jnp.exp(shifted)
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            attn = (p * (1.0 / denom).astype(self.dtype)).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, *out_hw, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)

    def _global_kernel_attention(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pallas attention for the global (1024-token) blocks on the
        head-padded plane layout (see the dispatch comment above). Param
        tree is IDENTICAL to the XLA path: the holders declare the same
        ``qkv``/``proj`` {kernel, bias} leaves; head-padding (zero
        columns, softmax scale·log2e folded into the q third, ones at
        each v head's denominator lane; row-packed proj) happens on the
        weight VALUES at apply — the same packing as the fused
        window-block path (``MultiScaleBlock._fused_window_block``)."""
        b, h, w, c = x.shape
        heads = self.num_heads
        d = self.dim_out // heads
        hd = heads * d
        hp = heads * 128
        kq, bq = _ProjParams(c, 3 * self.dim_out, name="qkv")()
        kp, bp = _ProjParams(self.dim_out, self.dim_out, name="proj")()
        cols, ones_cols = _qkv_pack_cols(heads, d)
        scale = d**-0.5 * LOG2E
        kq = jnp.concatenate([kq[:, :hd] * scale, kq[:, hd:]], axis=1)
        wq = (
            jnp.zeros((c, 3 * hp), kq.dtype)
            .at[:, cols].set(kq).astype(self.dtype)
        )
        bq = jnp.concatenate([bq[:hd] * scale, bq[hd:]])
        bq_p = (
            jnp.zeros((3 * hp,), bq.dtype)
            .at[cols].set(bq).at[ones_cols].set(1.0)
            .astype(self.dtype)[None]
        )
        flat = x.reshape(b, h * w, c).astype(self.dtype)
        planes = flat @ wq + bq_p  # (b, n, 3·H·128), pad folded into W
        out = window_attention(
            planes[..., :hp],
            planes[..., hp : 2 * hp],
            planes[..., 2 * hp :],
            head_dim=d,
            interpret=window_kernel_interpret(),
        )
        rows = (np.arange(hd) // d) * 128 + np.arange(hd) % d
        wp = (
            jnp.zeros((hp, self.dim_out), kp.dtype)
            .at[rows].set(kp).astype(self.dtype)
        )
        out = out @ wp + bp.astype(self.dtype)[None]
        return out.reshape(b, h, w, self.dim_out)


class MultiScaleBlock(nn.Module):
    """Hiera block: LN → (windowed) attention (+ q-pool skip) → LN → MLP."""

    dim_out: int
    num_heads: int
    window_size: int  # 0 = global attention
    q_pool: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    quant_int8: bool = False
    # input is ALREADY window-partitioned (B·nw, w, w, C): the trunk keeps
    # consecutive windowed blocks in window-major layout (LN/MLP/residual
    # are per-token, so only stage transitions / global blocks / stage
    # outputs need the spatial layout) — the per-block partition round
    # trips were ~18% of encoder device time (tools/op_profile.py)
    pre_windowed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim_in = x.shape[-1]
        h0, w0 = x.shape[1:3]
        win = self.window_size
        tokens = (h0 * w0) if self.pre_windowed else win * win
        if (
            win > 0
            and not self.q_pool
            and dim_in == self.dim_out
            and self.dtype != jnp.float32
            and 128 <= tokens <= 512
            and tokens % 16 == 0
            # head-padded packing puts each head's d real channels at the
            # front of a 128-lane tile (ones/denominator at lane d): with
            # d >= 128 the layout has no pad lane left and .at[].set would
            # silently clip — all Hieras use d=72, gate stays defensive
            and self.dim_out // self.num_heads < 128
            and (self.pre_windowed or (h0 % win == 0 and w0 % win == 0))
            and window_kernel_enabled()
        ):
            # Fused Pallas window-block path (ops/window_attention.py):
            # the whole transformer block runs as TWO kernels —
            # [LN1 → qkv → per-head softmax attention → proj → +residual]
            # and [LN2 → fc1 → exact GELU → fc2 → +residual] — one window
            # per grid step. qkv planes, score tiles, probabilities, and
            # the MLP hidden never touch HBM; per block the trunk streams
            # x in and out twice instead of ~8 full-tensor passes, and
            # the packed weights DMA once (constant block index). Applies
            # to Hiera-L's stage-3 256-token windows (33 of 48 blocks);
            # shorter windows (64/16-token) stay on the XLA path (per-dot
            # floors beat the fusion win) and the 1024-token globals'
            # f32 score tiles exceed VMEM. Under --int8 the fused blocks
            # run bf16 (measured faster than their int8 XLA form: the
            # fusion removes more HBM time than int8 MXU rate adds) while
            # the other stages keep the w8a8 projections. Exact-tiling gate: with pad
            # tokens the fused path would LN zeros into bias vectors
            # (the XLA path pads AFTER norm1), so padded grids fall back.
            return self._fused_window_block(x)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)

        if dim_in != self.dim_out:
            # projection on the (pooled) shortcut
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
        if self.q_pool:
            b, h, w, c = shortcut.shape
            shortcut = nn.max_pool(shortcut, (2, 2), strides=(2, 2))

        h, w = x.shape[1:3]
        if self.window_size > 0 and not self.pre_windowed:
            x, padded = _window_partition(x, self.window_size)
        attn = MultiScaleAttention(
            self.dim_out,
            self.num_heads,
            q_pool=self.q_pool,
            dtype=self.dtype,
            quant_int8=self.quant_int8,
            name="attn",
        )
        x = attn(x)
        if self.window_size > 0 and not self.pre_windowed:
            win = self.window_size // (2 if self.q_pool else 1)
            out_hw = (h // 2, w // 2) if self.q_pool else (h, w)
            padded = tuple(p // 2 for p in padded) if self.q_pool else padded
            x = _window_unpartition(x, win, padded, out_hw)

        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = _Dense(
            int(self.dim_out * self.mlp_ratio),
            dtype=self.dtype,
            quant_int8=self.quant_int8,
            name="mlp_fc1",
        )(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y

    def _fused_window_block(self, x: jnp.ndarray) -> jnp.ndarray:
        """The fused two-kernel block (see the dispatch comment above).
        Param tree is IDENTICAL to the XLA path: the holders declare the
        same {kernel, bias}/{scale, bias} leaves under the same names;
        packing (head-padded qkv columns with the softmax scale·log2e
        folded into the q third and ones at each v head's denominator
        lane; row-packed proj) happens on the weight VALUES at apply."""
        h0, w0 = x.shape[1:3]
        win = self.window_size
        if self.pre_windowed:
            xw = x
        else:
            xw, padded = _window_partition(x, win)  # exact tiling: no pad
        bw, hh, ww, c = xw.shape
        flat = xw.reshape(bw, hh * ww, c).astype(self.dtype)
        heads = self.num_heads
        d = self.dim_out // heads
        hd = heads * d
        g1, b1 = _LNParams(c, name="norm1")()
        kq, bq, kp, bp = _AttnParams(c, self.dim_out, name="attn")()
        cols, ones_cols = _qkv_pack_cols(heads, d)
        scale = d**-0.5 * LOG2E
        kq = jnp.concatenate([kq[:, :hd] * scale, kq[:, hd:]], axis=1)
        wq = (
            jnp.zeros((c, 3 * heads * 128), kq.dtype)
            .at[:, cols].set(kq).astype(self.dtype)
        )
        bq = jnp.concatenate([bq[:hd] * scale, bq[hd:]])
        bq_p = (
            jnp.zeros((3 * heads * 128,), bq.dtype)
            .at[cols].set(bq).at[ones_cols].set(1.0)
            .astype(self.dtype)[None]
        )
        rows = (np.arange(hd) // d) * 128 + np.arange(hd) % d
        wp = (
            jnp.zeros((heads * 128, self.dim_out), kp.dtype)
            .at[rows].set(kp).astype(self.dtype)
        )
        interp = window_kernel_interpret()
        r1 = window_block_attention(
            flat, g1[None], b1[None], wq, bq_p, wp,
            bp.astype(self.dtype)[None], heads=heads, head_dim=d,
            interpret=interp,
        )
        hidden = int(self.dim_out * self.mlp_ratio)
        g2, b2 = _LNParams(c, name="norm2")()
        k1, bb1 = _ProjParams(c, hidden, name="mlp_fc1")()
        k2, bb2 = _ProjParams(hidden, self.dim_out, name="mlp_fc2")()
        r2 = window_block_mlp(
            r1, g2[None], b2[None],
            k1.astype(self.dtype), bb1.astype(self.dtype)[None],
            k2.astype(self.dtype), bb2.astype(self.dtype)[None],
            interpret=interp,
        )
        out = r2.reshape(bw, hh, ww, c)
        if not self.pre_windowed:
            out = _window_unpartition(out, win, padded, (h0, w0))
        return out


class Hiera(nn.Module):
    """Hiera trunk returning one feature map per stage (strides 4/8/16/32)."""

    cfg: HieraConfig = HieraConfig.large()
    dtype: Any = jnp.float32
    # window-persistent execution (see the run loop below); False forces
    # per-block partitioning everywhere — same math, used as the test
    # oracle for the layout transform
    window_persistent: bool = True
    # opt-in w8a8 qkv/mlp_fc1 projections (see _Dense); never the default
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = self.cfg
        b, h, w = x.shape[:3]
        if x.ndim == 3:
            x = x[..., None]

        # patch embed 7×7 stride 4 (conv form; single- or 3-channel input)
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_kernel, cfg.patch_kernel),
            strides=(cfg.patch_stride, cfg.patch_stride),
            padding=[(cfg.patch_padding, cfg.patch_padding)] * 2,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1:3]

        # hieradet position embedding: interpolated background + tiled window
        bkg_h, bkg_w = cfg.window_pos_embed_bkg_spatial_size
        pos_bkg = self.param(
            "pos_embed", nn.initializers.normal(0.02), (bkg_h, bkg_w, cfg.embed_dim)
        )
        win = cfg.window_spec[0]
        pos_win = self.param(
            "pos_embed_window", nn.initializers.normal(0.02), (win, win, cfg.embed_dim)
        )
        rh = bicubic_resize_matrix(bkg_h, gh)
        rw = bicubic_resize_matrix(bkg_w, gw)
        pos = jnp.einsum("oh,hwc->owc", rh, pos_bkg)
        pos = jnp.einsum("pw,owc->opc", rw, pos)
        tiles = jnp.tile(pos_win, ((gh + win - 1) // win, (gw + win - 1) // win, 1))
        pos = pos + tiles[:gh, :gw]
        # interpolate in f32, join the residual stream at the compute dtype
        x = x + pos[None].astype(x.dtype)

        stage_ends = []
        total = 0
        for s in cfg.stages:
            total += s
            stage_ends.append(total - 1)

        # per-block specs: (dim_out, heads_out, window, q_pool, is_stage_end)
        specs = []
        dim = cfg.embed_dim
        heads = cfg.num_heads
        block_idx = 0
        for stage, depth in enumerate(cfg.stages):
            window = cfg.window_spec[stage]
            for d in range(depth):
                first_of_stage = d == 0 and stage > 0
                dim_out = dim * 2 if first_of_stage else dim
                heads_out = heads * 2 if first_of_stage else heads
                is_global = block_idx in cfg.global_att_blocks
                specs.append(
                    (
                        dim_out,
                        heads_out,
                        0 if is_global else window,
                        first_of_stage,
                        block_idx in stage_ends,
                    )
                )
                dim, heads = dim_out, heads_out
                block_idx += 1

        def make_block(i, pre_windowed=False):
            dim_out, heads_out, window, q_pool, _ = specs[i]
            return MultiScaleBlock(
                dim_out=dim_out,
                num_heads=heads_out,
                window_size=window,
                q_pool=q_pool,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                quant_int8=self.quant_int8,
                pre_windowed=pre_windowed,
                name=f"block{i}",
            )

        # Window-persistent execution: consecutive windowed, non-pooling
        # blocks run in window-major layout with ONE partition/unpartition
        # round trip per run (per-block round trips measured ~18% of the
        # encoder's device time). Runs break at q_pool blocks, global
        # blocks, and stage ends (outputs need the spatial layout).
        # Requires the window to tile the grid exactly — with pad tokens a
        # persistent layout would let them EVOLVE through LN/MLP between
        # blocks instead of re-zeroing each block (e.g. MedSAM-tiny's
        # window 14 on a 32-grid); such blocks fall back to per-block
        # partitioning, which zero-pads exactly like the published sam2.
        outputs: list[jnp.ndarray] = []
        gh_cur, gw_cur = gh, gw
        i = 0
        n_blocks = len(specs)
        while i < n_blocks:
            dim_out, heads_out, window, q_pool, stage_end = specs[i]
            runnable = (
                self.window_persistent
                and window > 0
                and not q_pool
                and gh_cur % window == 0
                and gw_cur % window == 0
            )
            j = i
            while (
                runnable
                and j < n_blocks
                and specs[j][2] == window
                and not specs[j][3]
            ):
                j += 1
                if specs[j - 1][4]:  # stage end: output needs spatial layout
                    break
            if j - i >= 2:
                # (flattening windows to (B·nw, 1, w², C) for fuller
                # sublane tiles measured SLOWER — 121.6 → 119.8/108.6 —
                # XLA's layout choices already handle the small windows)
                x, padded = _window_partition(x, window)
                for k in range(i, j):
                    x = make_block(k, pre_windowed=True)(x)
                x = _window_unpartition(x, window, padded, (gh_cur, gw_cur))
                if specs[j - 1][4]:
                    outputs.append(x)
                i = j
                continue
            x = make_block(i)(x)
            if q_pool:
                gh_cur, gw_cur = gh_cur // 2, gw_cur // 2
            if stage_end:
                outputs.append(x)
            i += 1
        return outputs
