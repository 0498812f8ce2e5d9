"""DINOv2 ViT-g/14 with register tokens, in flax (feature extractor).

Replaces the reference's ``torch.hub.load("facebookresearch/dinov2",
"dinov2_vitg14_reg")`` (reference ``run/dino_features.py:25-28``). The
giant variant: patch 14, embed 1536, 40 blocks, 24 heads, SwiGLU-fused FFN
(hidden 4096), LayerScale, 1 cls + 4 register tokens, LN eps 1e-6.
``forward_features(...)["x_norm_patchtokens"]`` ≙ :meth:`DinoV2.__call__`.

TPU-native design:
- **single-channel patch embed**: tomogram slices are grayscale; the
  3-channel replication (+ optional ImageNet normalization) the reference
  does on host is folded into the patch-embed kernel/bias at weight
  conversion (see ``fold_patch_embed``), cutting the first conv's FLOPs 3×
  and removing all host-side channel work,
- patch embedding is computed as an unfold+matmul (reshape to 14×14 tiles →
  one big ``(B·gh·gw, 196) @ (196, 1536)`` matmul on the MXU),
- attention is pluggable: Pallas flash attention on TPU, XLA reference
  elsewhere (``cryovit_tpu.ops.flash_attention``),
- bf16 compute / f32 residual-stream-critical reductions (LN in f32),
- position embeddings are interpolated with the exact torch bicubic
  convention the reference model uses (scale-factor form with +0.1 offset).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cryovit_tpu.ops.resize import bicubic_resize_matrix

__all__ = ["DinoV2Config", "DinoV2", "interpolate_pos_embed", "fold_patch_embed"]


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    """Architecture hyperparameters. Defaults = ViT-g/14 with registers."""

    patch_size: int = 14
    embed_dim: int = 1536
    depth: int = 40
    num_heads: int = 24
    ffn_hidden: int = 4096  # SwiGLU-fused hidden (2/3 · 4 · 1536 → mult of 8)
    num_registers: int = 4
    pos_grid: int = 37  # pretraining grid: 518 / 14
    layer_norm_eps: float = 1e-6
    in_channels: int = 1  # folded grayscale input

    @classmethod
    def giant(cls) -> "DinoV2Config":
        return cls()

    @classmethod
    def tiny_test(cls) -> "DinoV2Config":
        """Small config for parity tests."""
        return cls(
            patch_size=14,
            embed_dim=64,
            depth=2,
            num_heads=4,
            ffn_hidden=56,
            num_registers=4,
            pos_grid=4,
        )


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid: tuple[int, int], pos_grid: int
) -> jnp.ndarray:
    """Interpolate patch position embeddings to a (gh, gw) grid.

    Matches the reference model's ``interpolate_pos_encoding``: bicubic with
    ``scale_factor = (g + 0.1) / M`` (torch uses the *given* scale factor in
    its coordinate mapping, hence the explicit scale below). ``pos_embed`` is
    ``(1 + M², C)`` with the cls embedding first.
    """
    gh, gw = grid
    m = pos_grid
    cls_pos = pos_embed[:1]
    patch_pos = pos_embed[1:].reshape(m, m, -1)
    if (gh, gw) != (m, m):
        scale_h = (gh + 0.1) / m
        scale_w = (gw + 0.1) / m
        rh = _scaled_resize_matrix(m, gh, scale_h)
        rw = _scaled_resize_matrix(m, gw, scale_w)
        patch_pos = jnp.einsum("oh,hwc->owc", rh, patch_pos)
        patch_pos = jnp.einsum("pw,owc->opc", rw, patch_pos)
    return jnp.concatenate([cls_pos, patch_pos.reshape(gh * gw, -1)], axis=0)


def _scaled_resize_matrix(in_size: int, out_size: int, scale: float) -> jnp.ndarray:
    """Bicubic resampling matrix using an explicit scale factor in the
    half-pixel mapping (``src = (dst + 0.5)/scale − 0.5``), as torch does
    when ``scale_factor`` is passed with ``recompute_scale_factor=False``."""
    from cryovit_tpu.ops.resize import _cubic_kernel

    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - frac)
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return jnp.asarray(mat, dtype=jnp.float32)


# w8a8 helpers shared with the SAM2 Hiera trunk: the four projection
# matmuls — the ≥81%-MXU ops that dominate the extractor — quantize
# per-token (activations) / per-output-channel (weights) on the fly. The
# flash-attention kernel, LayerNorms, and the residual stream stay
# bf16/f32.
from cryovit_tpu.ops.quant import int8_quant as _int8_quant
from cryovit_tpu.ops.quant import qeinsum as _qeinsum


class _ProjParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree layout ({kernel, bias}),
    so the flash path can use the weights in layout-folded einsums while the
    fallback path stays a plain matmul — one parameter format either way."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class Attention(nn.Module):
    """Multi-head self-attention with a pluggable kernel.

    ``qkv_attention_fn`` consumes the head-major planes produced by a
    layout-folded qkv projection (the Pallas path: the N↔H transpose is
    absorbed into the projection matmul's output, and the inverse transpose
    into the output projection); ``attention_fn`` takes separate (q, k, v);
    neither → XLA einsum attention.

    ``true_len``: when the CALLER already padded the token axis to the
    kernel quantum (``DinoV2.__call__`` pads the whole block stack once so
    every elementwise op sees 16-aligned tokens), the trailing rows are
    phantom — this is the real token count used for key masking.
    """

    num_heads: int
    dtype: Any = jnp.bfloat16
    attention_fn: Callable | None = None
    qkv_attention_fn: Callable | None = None
    pair_attention_fn: Callable | None = None
    quant_int8: bool = False
    true_len: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        w_qkv, b_qkv = _ProjParams(c, 3 * c, name="qkv")()
        w_proj, b_proj = _ProjParams(c, c, name="proj")()
        w_qkv = w_qkv.astype(self.dtype)
        b_qkv = b_qkv.astype(self.dtype)
        w_proj = w_proj.astype(self.dtype)
        b_proj = b_proj.astype(self.dtype)
        x = x.astype(self.dtype)

        if self.pair_attention_fn is not None and h % 2 == 0:
            # pair-packed planes: adjacent head pairs share a 128-lane
            # plane, so the projection matmuls write/read full-width VMEM
            # tiles (d=64 head-major planes leave every lane-tile half
            # empty). Same zero-transpose property as the head-major path:
            # the (h,d)→(g,2d) regrouping is a reshape of the flat h·d
            # axis, identical on the qkv and output sides.
            g = h // 2
            pair = 2 * head_dim
            # pad the token axis to the tile quantum BEFORE the projection:
            # the qkv matmul computes the (cheap) padded rows and the
            # pallas boundary then needs zero pad/slice copies (measured
            # ~3.7 ms/block of pure copies otherwise). Padded keys are
            # masked in-kernel via true_len; padded query rows fall out of
            # the sliced output read below.
            # pad to the kernel's preferred query quantum (the 16-row bf16
            # sublane tile for ≤1280 tokens; the auto-chosen q-block
            # multiple beyond — e.g. 4101 → 4160): pad rows ride the
            # projection matmuls fused/free, where padding the matmul
            # OUTPUT at the pallas boundary cost a materialized 24 ms/step
            # at 1024² slices
            from cryovit_tpu.ops.flash_attention import preferred_len

            tl = self.true_len if self.true_len is not None else n
            n_pad = preferred_len(n)
            xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x
            # each of q/k/v is ONE plain (B·N, C)·(C, C) matmul whose
            # NATURAL output layout (B, N, C) is exactly what the
            # channel-major kernel consumes — the plane axis is a grid
            # dimension over lane-aligned column tiles, so NO transpose
            # exists anywhere on the attention path. (The former
            # (B,G,N,P) plane layout forced XLA to materialize the
            # (B,N,G,P)→(B,G,N,P) transpose of each projection output:
            # 0.91 ms × 3 per block = 110 ms/batch of pure copies.)
            # The q weights carry the softmax scale (·log2 e at bf16 —
            # the kernel then uses a bf16 exp2) folded in; torch qkv
            # column order is [q|k|v] with head-major columns, so plane
            # g's lanes are columns g·128..(g+1)·128 of each third.
            exp2_bf16 = self.dtype == jnp.bfloat16
            fold = jnp.asarray(
                head_dim**-0.5 * (1.4426950408889634 if exp2_bf16 else 1.0),
                dtype=self.dtype,
            )
            wq3 = (w_qkv[:, :c] * fold, w_qkv[:, c : 2 * c], w_qkv[:, 2 * c :])
            # q/k/v biases ride into the kernel and apply on the VMEM
            # tiles (as XLA adds they don't fuse into the einsums feeding
            # the pallas boundary and cost a full HBM pass each); the q
            # bias carries the same folded scale as the q weights
            if self.quant_int8:
                # w8a8: one per-token quantization of the block input
                # feeds all three qkv matmuls; per-output-channel weight
                # scales (the q third's folded softmax scale rides inside
                # its weight quantization). Biases still apply in-kernel
                # at full precision.
                xq, sx = _int8_quant(xp, axis=2)  # (B,N,C), (B,N,1)
                ident = lambda s: s

                def _qproj(wmat):
                    wq, sw = _int8_quant(wmat, axis=0)  # (C,C), (1,C)
                    return _qeinsum(
                        "bnc,cd->bnd", xq, wq, sx, sw, ident, ident,
                        self.dtype,
                    )

                qp, kp, vp = (_qproj(wmat) for wmat in wq3)
            else:
                qp, kp, vp = (xp @ wmat for wmat in wq3)
            b4 = b_qkv.reshape(3, g, pair)
            kv_bias = jnp.stack([b4[0] * fold, b4[1], b4[2]])  # (3, G, P)
            out = self.pair_attention_fn(
                qp, kp, vp,
                pre_scaled=True, exp2_bf16=exp2_bf16,
                true_len=tl if tl != n_pad else None,
                kv_bias=kv_bias,
                channel_major=True,
                plane_width=pair,
            )  # (B, Npad→N, C)
            # the output projection is ONE untransposed (B·N, C)·(C, C)
            # matmul straight off the kernel output. It stays bf16 even
            # under quant_int8: its input is the full attention output,
            # and the per-token abs-max + round passes over it cost as
            # much HBM time as the int8 matmul saves (measured wash,
            # 60.2 both ways) — same reasoning as w3 in SwiGLUFFN
            return out[:, :n] @ w_proj + b_proj

        if self.qkv_attention_fn is not None:
            # qkv projection emits head-major planes directly: the MXU
            # writes the transposed layout, so no transpose op exists
            w4 = w_qkv.reshape(c, 3, h, head_dim)
            qkv_t = jnp.einsum("bnc,cthd->tbhnd", x, w4)
            qkv_t = qkv_t + b_qkv.reshape(3, 1, h, 1, head_dim)
            out = self.qkv_attention_fn(
                qkv_t[0], qkv_t[1], qkv_t[2]
            )  # (B, H, N, D)
            # output projection absorbs the head-major layout the same way
            out = jnp.einsum(
                "bhnd,hdc->bnc", out, w_proj.reshape(h, head_dim, c)
            )
            return out + b_proj

        qkv = (x @ w_qkv + b_qkv).reshape(b, n, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.attention_fn is not None:
            out = self.attention_fn(q, k, v)
        else:
            scale = head_dim**-0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
            )
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(b, n, c)
        return out @ w_proj + b_proj


class SwiGLUFFN(nn.Module):
    """SwiGLU-fused FFN: ``w3(silu(x1) · x2)`` with ``x1,x2 = split(w12 x)``."""

    hidden: int
    dtype: Any = jnp.bfloat16
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.quant_int8:
            x12 = nn.Dense(2 * self.hidden, dtype=self.dtype, name="w12")(x)
            x1, x2 = jnp.split(x12, 2, axis=-1)
            return nn.Dense(x.shape[-1], dtype=self.dtype, name="w3")(
                nn.silu(x1) * x2
            )
        # w8a8 path — identical parameter tree to the nn.Dense layout
        c = x.shape[-1]
        w12, b12 = _ProjParams(c, 2 * self.hidden, name="w12")()
        w3, b3 = _ProjParams(self.hidden, c, name="w3")()
        xq, sx = _int8_quant(x, axis=-1)  # (B,N,C), (B,N,1)
        wq, sw = _int8_quant(w12, axis=0)  # (1, 2H)
        x12 = _qeinsum(
            "bnc,ch->bnh", xq, wq, sx, sw, lambda s: s, lambda s: s,
            self.dtype,
        ) + b12.astype(self.dtype)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        hmid = nn.silu(x1) * x2
        # w3 stays bf16: quantizing it requires a per-token abs-max +
        # round pass over the (B,N,hidden) product — the largest
        # activation in the block — whose HBM cost (~1.7 ms/block
        # measured) cancels the int8 matmul saving. Strictly better in
        # fidelity at the same speed.
        return hmid @ w3.astype(self.dtype) + b3.astype(self.dtype)


class _LNParams(nn.Module):
    """LayerNorm affine params with ``nn.LayerNorm``'s exact tree layout
    ({scale, bias}), so the fused Pallas path consumes raw vectors while
    checkpoints/converters see one parameter format either way."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def _ln_apply(x, scale, bias, eps, dtype):
    """flax ``nn.LayerNorm`` semantics (f32 statistics, fast variance)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


class Block(nn.Module):
    """Pre-LN transformer block with LayerScale residuals.

    The call signature is a DEFERRED-residual carry ``(x, pending) →
    (x, pending)``: ``pending`` is the previous block's LayerScale-scaled
    FFN output, accumulated into the stream HERE — fused with this block's
    first LayerNorm. With ``fused_ln_fn`` set (the TPU extractor path,
    ``ops.fused_norm``) every residual-add + LayerNorm pair runs as ONE
    Pallas pass over HBM (read x and the branch once, write the new stream
    and the normalized tensor) instead of XLA's ~5–6 passes — the block's
    elementwise glue was 132 ms per 64-slice ViT-g batch, the largest
    non-matmul cost in the extractor profile (BASELINE.md). The math is
    identical to the reference block (torch hub ``dinov2/layers/block.py``):
    ``x + ls1·attn(LN1(x))`` then ``x + ls2·mlp(LN2(x))``, just with the
    adds re-associated onto the consumer side of the scan.
    """

    num_heads: int
    ffn_hidden: int
    eps: float
    dtype: Any = jnp.bfloat16
    attention_fn: Callable | None = None
    qkv_attention_fn: Callable | None = None
    pair_attention_fn: Callable | None = None
    residual_dtype: Any = jnp.float32
    quant_int8: bool = False
    fused_ln_fn: Callable | None = None
    true_len: int | None = None

    @nn.compact
    def __call__(
        self, carry: tuple[jnp.ndarray, jnp.ndarray]
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        x, pending = carry
        dim = x.shape[-1]
        rdtype = self.residual_dtype
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5), (dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5), (dim,))
        ln1_scale, ln1_bias = _LNParams(dim, name="norm1")()
        ln2_scale, ln2_bias = _LNParams(dim, name="norm2")()
        # the residual stream carries `residual_dtype`: f32 by default;
        # bf16 halves the HBM traffic of every LN read and residual
        # read-modify-write (LN statistics stay f32 either way)
        if self.fused_ln_fn is not None:
            x, h = self.fused_ln_fn(x, pending, None, ln1_scale, ln1_bias)
        else:
            x = (x.astype(rdtype) + pending.astype(rdtype)).astype(rdtype)
            h = _ln_apply(x, ln1_scale, ln1_bias, self.eps, self.dtype)
        h = Attention(
            self.num_heads, dtype=self.dtype, attention_fn=self.attention_fn,
            qkv_attention_fn=self.qkv_attention_fn,
            pair_attention_fn=self.pair_attention_fn,
            quant_int8=self.quant_int8, true_len=self.true_len, name="attn",
        )(h.astype(self.dtype))
        if self.fused_ln_fn is not None:
            x, h = self.fused_ln_fn(x, h, ls1, ln2_scale, ln2_bias)
        else:
            x = x + (h * ls1.astype(rdtype)).astype(rdtype)
            h = _ln_apply(x, ln2_scale, ln2_bias, self.eps, self.dtype)
        h = SwiGLUFFN(
            self.ffn_hidden, dtype=self.dtype, quant_int8=self.quant_int8,
            name="mlp",
        )(h.astype(self.dtype))
        # the ls2 multiply fuses into the FFN's last matmul epilogue; the
        # ADD is deferred to the next block (or the post-stack flush),
        # where it fuses with the next LayerNorm
        return x, (h * ls2.astype(h.dtype)).astype(rdtype)


class _ScanBlock(Block):
    """Block with a scan-compatible ``(carry, _) → (carry, None)`` signature."""

    @nn.compact
    def __call__(self, carry, _unused=None):  # type: ignore[override]
        return super().__call__(carry), None


class DinoV2(nn.Module):
    """DINOv2 ViT backbone returning normalized patch tokens.

    Input: ``(B, H, W)`` preprocessed slices (already 14/16-resized; H, W
    multiples of 14). Output: ``(B, gh·gw, embed_dim)`` f32 patch tokens
    (``x_norm_patchtokens``).

    ``scan_blocks=True`` runs the depth-40 stack as a ``lax.scan`` over one
    compiled block (params stacked on a leading depth axis) — ~40× less XLA
    to compile with identical math and throughput.
    """

    cfg: DinoV2Config = DinoV2Config.giant()
    dtype: Any = jnp.bfloat16
    attention_fn: Callable | None = None
    qkv_attention_fn: Callable | None = None
    pair_attention_fn: Callable | None = None
    scan_blocks: bool = False
    residual_dtype: Any = jnp.float32
    quant_int8: bool = False
    # fused residual+LayerScale+LayerNorm op (ops.fused_norm signature);
    # eps and the normalized-output dtype are bound by the model
    fused_ln_fn: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, h, w = x.shape
        p = cfg.patch_size
        gh, gw = h // p, w // p

        # Patch embed as unfold + matmul: (B, gh, p, gw, p) → (B·gh·gw, p²)
        patches = x.reshape(b, gh, p, gw, p).transpose(0, 1, 3, 2, 4)
        patches = patches.reshape(b, gh * gw, p * p).astype(self.dtype)
        kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (p * p * cfg.in_channels, cfg.embed_dim),
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (cfg.embed_dim,))
        tokens = patches @ kernel.astype(self.dtype) + bias.astype(self.dtype)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, cfg.embed_dim)
        )
        reg_tokens = self.param(
            "register_tokens",
            nn.initializers.zeros,
            (cfg.num_registers, cfg.embed_dim),
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1 + cfg.pos_grid**2, cfg.embed_dim),
        )
        pos = interpolate_pos_embed(pos_embed, (gh, gw), cfg.pos_grid)
        cls = jnp.broadcast_to(cls_token, (b, 1, cfg.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1) + pos[None].astype(
            self.dtype
        )
        regs = jnp.broadcast_to(reg_tokens, (b, cfg.num_registers, cfg.embed_dim))
        tokens = jnp.concatenate(
            [tokens[:, :1], regs.astype(self.dtype), tokens[:, 1:]], axis=1
        )
        # the block stack carries the residual stream in residual_dtype —
        # cast here so the scan carry type is invariant across blocks
        tokens = tokens.astype(self.residual_dtype)

        # pad the TOKEN axis to the attention kernel's preferred quantum
        # once for the whole stack (instead of per-block at the pallas
        # boundary): every block-level elementwise op then sees a
        # 16-aligned token count — the requirement for the fused
        # residual+LN kernel — and the per-block pad/slice pair vanishes.
        # Padded keys are masked in-kernel via true_len; padded rows are
        # sliced off at the end.
        n_tok = tokens.shape[1]
        true_len = None
        fused_ln_fn = None
        if self.pair_attention_fn is not None:
            from cryovit_tpu.ops.flash_attention import preferred_len

            n_run = preferred_len(n_tok)
            if n_run != n_tok:
                tokens = jnp.pad(tokens, ((0, 0), (0, n_run - n_tok), (0, 0)))
                true_len = n_tok
        if self.fused_ln_fn is not None:
            fused_ln_fn = partial(
                self.fused_ln_fn, eps=cfg.layer_norm_eps, y_dtype=self.dtype
            )

        block_kwargs = dict(
            dtype=self.dtype,
            attention_fn=self.attention_fn,
            qkv_attention_fn=self.qkv_attention_fn,
            pair_attention_fn=self.pair_attention_fn,
            residual_dtype=self.residual_dtype,
            quant_int8=self.quant_int8,
            fused_ln_fn=fused_ln_fn,
            true_len=true_len,
        )
        carry = (tokens, jnp.zeros_like(tokens))
        if self.scan_blocks:
            block = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.depth,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(
                cfg.num_heads,
                cfg.ffn_hidden,
                cfg.layer_norm_eps,
                name="blocks",
                **block_kwargs,
            )
            carry, _ = block(carry, None)
        else:
            for i in range(cfg.depth):
                carry = Block(
                    cfg.num_heads,
                    cfg.ffn_hidden,
                    cfg.layer_norm_eps,
                    name=f"block{i}",
                    **block_kwargs,
                )(carry)
        # flush the last block's deferred residual
        tokens = (carry[0].astype(self.residual_dtype)
                  + carry[1].astype(self.residual_dtype))

        tokens = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="norm"
        )(tokens)
        patch0 = 1 + cfg.num_registers
        return tokens[:, patch0 : patch0 + gh * gw].astype(jnp.float32)


# ---- torch weight conversion ---------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def fold_patch_embed(
    weight: np.ndarray, bias: np.ndarray, normalize: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Fold 3-channel replication (+ optional ImageNet normalization) of
    grayscale slices into the patch-embed kernel/bias.

    ``weight``: torch ``(embed, 3, p, p)``; returns ``(p·p, embed)`` kernel
    and ``(embed,)`` bias for single-channel input. With identical channels
    x: ``Σ_c W_c ⊛ (x−m_c)/s_c = (Σ_c W_c/s_c) ⊛ x − Σ_c m_c/s_c·(ΣW_c)``.
    """
    w = np.asarray(weight, dtype=np.float64)  # (E, 3, p, p)
    b = np.asarray(bias, dtype=np.float64)
    if normalize:
        scale = np.asarray(IMAGENET_STD, dtype=np.float64)
        mean = np.asarray(IMAGENET_MEAN, dtype=np.float64)
        folded = (w / scale[None, :, None, None]).sum(axis=1)  # (E, p, p)
        shift = (w.sum(axis=(2, 3)) * (mean / scale)[None, :]).sum(axis=1)
        b = b - shift
    else:
        folded = w.sum(axis=1)
    # (E, p, p) → (p·p, E): row-major over (ph, pw) to match the unfold order
    kernel = folded.reshape(folded.shape[0], -1).T
    return kernel.astype(np.float32), b.astype(np.float32)


def convert_torch_state_dict(
    state_dict: dict[str, Any],
    cfg: DinoV2Config,
    normalize: bool = True,
    scan_blocks: bool = False,
) -> dict[str, Any]:
    """Map a torch DINOv2 ``state_dict`` onto this module's param pytree.

    Accepts torch tensors or numpy arrays. Linear weights transpose
    (out,in) → (in,out); the patch conv folds to single-channel. With
    ``scan_blocks`` the per-block params stack on a leading depth axis.
    """

    def arr(key: str) -> np.ndarray:
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def dense(prefix: str) -> dict[str, np.ndarray]:
        return {"kernel": arr(f"{prefix}.weight").T, "bias": arr(f"{prefix}.bias")}

    def ln(prefix: str) -> dict[str, np.ndarray]:
        return {"scale": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    kernel, bias = fold_patch_embed(
        arr("patch_embed.proj.weight"), arr("patch_embed.proj.bias"), normalize
    )
    params: dict[str, Any] = {
        "patch_kernel": kernel,
        "patch_bias": bias,
        "cls_token": arr("cls_token").reshape(1, -1),
        "register_tokens": arr("register_tokens").reshape(cfg.num_registers, -1),
        "pos_embed": arr("pos_embed").reshape(-1, cfg.embed_dim),
        "norm": ln("norm"),
    }
    def block_params(i: int) -> dict[str, Any]:
        p = f"blocks.{i}"
        return {
            "norm1": ln(f"{p}.norm1"),
            "norm2": ln(f"{p}.norm2"),
            "ls1_gamma": arr(f"{p}.ls1.gamma"),
            "ls2_gamma": arr(f"{p}.ls2.gamma"),
            "attn": {"qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj")},
            "mlp": {"w12": dense(f"{p}.mlp.w12"), "w3": dense(f"{p}.mlp.w3")},
        }

    if scan_blocks:
        blocks = [block_params(i) for i in range(cfg.depth)]
        params["blocks"] = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *blocks
        )
    else:
        for i in range(cfg.depth):
            params[f"block{i}"] = block_params(i)
    return {"params": params}


def make_dinov2(
    cfg: DinoV2Config | None = None,
    dtype: Any = jnp.bfloat16,
    use_flash_attention: bool | None = None,
    scan_blocks: bool | None = None,
    pair_heads: bool | None = None,
    residual_dtype: Any = None,
    quant_int8: bool = False,
    fused_ln: bool | None = None,
    flash_interpret: bool = False,
) -> DinoV2:
    """Build the extractor module, selecting the attention kernel.

    Pallas flash attention on TPU backends; XLA attention elsewhere
    (CPU tests / interpret mode). Deep stacks default to scan-over-blocks
    (one compiled block instead of ``depth``). With flash attention and
    64-wide heads, adjacent head pairs pack into 128-lane planes
    (full-width VMEM tiles end to end — see ``flash_attention_pairs``).
    """
    cfg = cfg or DinoV2Config.giant()
    if use_flash_attention is None:
        use_flash_attention = jax.default_backend() not in ("cpu",)
    if scan_blocks is None:
        scan_blocks = cfg.depth >= 12
    head_dim = cfg.embed_dim // cfg.num_heads
    if pair_heads is None:
        pair_heads = head_dim == 64 and cfg.num_heads % 2 == 0
    if residual_dtype is None:
        # follow the compute dtype: a bf16 residual stream halves the HBM
        # traffic of every LN read and residual read-modify-write (feature
        # fidelity vs the f32 oracle: cosine 0.999997, BASELINE.md)
        residual_dtype = dtype
    qkv_attention_fn = None
    pair_attention_fn = None
    if use_flash_attention:
        from cryovit_tpu.ops.flash_attention import (
            flash_attention_bhnd,
            flash_attention_pairs,
        )

        # flash_interpret: run the Pallas kernel in interpret mode — used
        # by the CPU-mesh dryrun/tests to execute the *kernel* path inside
        # shard_map without TPU hardware (parallel/mesh shard_map story)
        if pair_heads:
            pair_attention_fn = (
                partial(flash_attention_pairs, interpret=True)
                if flash_interpret
                else flash_attention_pairs
            )
        else:
            qkv_attention_fn = (
                partial(flash_attention_bhnd, interpret=True)
                if flash_interpret
                else flash_attention_bhnd
            )
    if fused_ln is None:
        # measured OFF-by-default: on v5e the Pallas fused residual+LN op
        # is a consistent ~5% end-to-end LOSS (57.2 → 54.2 slices/s at
        # 512², invariant to block size 80–520 and parallel grid
        # semantics) — the custom-call boundary forces the branch tensor
        # h to materialize in HBM, where XLA's own loop fusion folds the
        # LayerScale multiply and residual add into producer epilogues.
        # The op stays available for shapes/backends where XLA fuses
        # worse; requires the pair-packed path's 16-aligned token pad.
        fused_ln = False
    fused_ln_fn = None
    if fused_ln:
        from cryovit_tpu.ops.fused_norm import residual_layernorm

        fused_ln_fn = residual_layernorm
    return DinoV2(
        cfg=cfg,
        dtype=dtype,
        qkv_attention_fn=qkv_attention_fn,
        pair_attention_fn=pair_attention_fn,
        scan_blocks=scan_blocks,
        residual_dtype=residual_dtype,
        quant_int8=quant_int8,
        fused_ln_fn=fused_ln_fn,
    )
