"""SAM mask decoder: two-way transformer + upscaling + IoU/object heads.

Mirrors the sam2 MaskDecoder (SAM2.1 flavor: object-score token,
high-res skip features s0/s1, 3+1 mask tokens) with LoRA adapters on the
q/v projections of every decoder attention — the reference's
``LoRAMaskDecoderFactory(r=128, alpha=128)`` applied to self-attn, both
cross-attns of each layer, and the final token-to-image attention
(``models/sam2_blocks.py:251-286``, r/α at ``models/sam2.py:343-346``).

LoRA here is built into the attention module (``lora_rank > 0``): base
projections stay frozen by the optimizer partition (see ``model.py``);
``w_a``/``w_b`` are the trainable adapters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cryovit_tpu.models.sam2.config import SAM2Config

__all__ = ["MaskDecoder", "LoRAAttention"]


class LoRALinear(nn.Module):
    """Dense layer with additive low-rank adaptation (reference
    ``sam2_blocks.py:226-248``): ``y = Wx + (a/r)·B(Ax)``, A kaiming, B zeros."""

    features: int
    rank: int
    alpha: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        base = nn.Dense(self.features, dtype=self.dtype, name="proj")(x)
        if self.rank <= 0:
            return base
        a = nn.Dense(self.rank, use_bias=False, name="w_a", dtype=self.dtype,
                     kernel_init=nn.initializers.he_uniform())(x)
        b = nn.Dense(self.features, use_bias=False, name="w_b", dtype=self.dtype,
                     kernel_init=nn.initializers.zeros)(a)
        return base + b * (self.alpha / self.rank)


class LoRAAttention(nn.Module):
    """SAM decoder attention with optional internal downsampling and LoRA
    on q/v (the reference adapts exactly q_proj and v_proj)."""

    dim: int
    num_heads: int
    downsample_rate: int = 1
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim // self.downsample_rate
        head_dim = inner // self.num_heads
        lora_kw = dict(dtype=self.dtype)
        qp = LoRALinear(inner, self.lora_rank, self.lora_alpha, name="q_proj", **lora_kw)(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k)
        vp = LoRALinear(inner, self.lora_rank, self.lora_alpha, name="v_proj", **lora_kw)(v)

        def split(x):
            return x.reshape(*x.shape[:2], self.num_heads, head_dim)

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qh * head_dim**-0.5, kh,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(*out.shape[:2], inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class _MLPBlock(nn.Module):
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="lin1")(x)
        y = nn.relu(y)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="lin2")(y)


class TwoWayAttentionBlock(nn.Module):
    """One decoder layer: token self-attn, token→image cross-attn, MLP,
    image→token cross-attn (all LoRA-adapted on q/v)."""

    dim: int
    num_heads: int
    lora_rank: int
    lora_alpha: float
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                    dtype=self.dtype)
        if self.skip_first_layer_pe:
            queries = LoRAAttention(self.dim, self.num_heads, name="self_attn", **lora)(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + LoRAAttention(
                self.dim, self.num_heads, name="self_attn", **lora
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + LoRAAttention(
            self.dim, self.num_heads, downsample_rate=2,
            name="cross_attn_token_to_image", **lora,
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(queries)

        queries = queries + _MLPBlock(self.dim * 8, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + LoRAAttention(
            self.dim, self.num_heads, downsample_rate=2,
            name="cross_attn_image_to_token", **lora,
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class _HyperMLP(nn.Module):
    hidden: int
    out: int
    depth: int = 3
    sigmoid_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"layer{i}")(x))
        x = nn.Dense(self.out, dtype=self.dtype, name=f"layer{self.depth - 1}")(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    """Two-way transformer mask decoder with multimask + IoU + object score."""

    cfg: SAM2Config = SAM2Config.large()
    lora_rank: int = 128
    lora_alpha: float = 128.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # (B, e, e, d)
        image_pe: jnp.ndarray,  # (e, e, d)
        sparse_prompts: jnp.ndarray,  # (B, n, d)
        dense_prompts: jnp.ndarray,  # (B, e, e, d)
        high_res_features: tuple[jnp.ndarray, jnp.ndarray] | None,
    ):
        cfg = self.cfg
        d = cfg.d_model
        num_masks = cfg.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, d))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(0.02), (num_masks, d)
        )
        obj_token = self.param("obj_score_token", nn.initializers.normal(0.02), (1, d))

        b = image_embeddings.shape[0]
        out_tokens = jnp.concatenate(
            [obj_token, iou_token, mask_tokens], axis=0
        ).astype(self.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (b, *out_tokens.shape)), sparse_prompts],
            axis=1,
        )

        src = (image_embeddings + dense_prompts).astype(self.dtype)
        e = src.shape[1]
        src_seq = src.reshape(b, e * e, d)
        pe_seq = jnp.broadcast_to(
            image_pe.reshape(1, e * e, d), (b, e * e, d)
        ).astype(self.dtype)

        queries, keys = tokens, src_seq
        for i in range(cfg.decoder_depth):
            queries, keys = TwoWayAttentionBlock(
                d,
                cfg.decoder_heads,
                self.lora_rank,
                self.lora_alpha,
                skip_first_layer_pe=i == 0,
                dtype=self.dtype,
                name=f"layer{i}",
            )(queries, keys, tokens, pe_seq)
        q = queries + tokens
        k = keys + pe_seq
        queries = queries + LoRAAttention(
            d, cfg.decoder_heads, downsample_rate=2,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_final")(queries)

        obj_out = queries[:, 0]
        iou_out = queries[:, 1]
        mask_out = queries[:, 2 : 2 + num_masks]

        # upscale image features 4× with transposed convs (+ high-res skips)
        img = keys.reshape(b, e, e, d)
        up1 = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="upscale1")(img)
        if high_res_features is not None:
            up1 = up1 + nn.Conv(d // 4, (1, 1), dtype=self.dtype, name="conv_s1")(high_res_features[1])
        up1 = nn.gelu(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="upscale_ln")(up1), approximate=False)
        up2 = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), dtype=self.dtype, name="upscale2")(up1)
        if high_res_features is not None:
            up2 = up2 + nn.Conv(d // 8, (1, 1), dtype=self.dtype, name="conv_s0")(high_res_features[0])
        up2 = nn.gelu(up2, approximate=False)

        hyper = jnp.stack(
            [
                _HyperMLP(d, d // 8, dtype=self.dtype, name=f"hyper{i}")(mask_out[:, i])
                for i in range(num_masks)
            ],
            axis=1,
        )  # (B, M, d/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up2,
                   preferred_element_type=jnp.float32)  # (B, M, 4e, 4e)

        # heads and logits return in f32: the mask logits feed sigmoid /
        # NO_OBJ_SCORE gating and the IoU argmax selection downstream
        ious = _HyperMLP(d, num_masks, depth=cfg.iou_head_depth, dtype=self.dtype,
                         sigmoid_output=True, name="iou_head")(iou_out)
        obj_score = _HyperMLP(d, 1, depth=3, dtype=self.dtype,
                              name="obj_score_head")(obj_out)
        masks = masks.astype(jnp.float32)
        ious = ious.astype(jnp.float32)
        obj_score = obj_score.astype(jnp.float32)
        return masks, ious, mask_out, obj_score
