"""SAM2 video-style 3D segmentation model with a compiled tracking scan.

Parity target: reference ``SAM2Train`` (``models/sam2.py:322-796``) — box +
dense-mask prompts from the PromptPredictor on every slice, a (possibly
random, reference ``prepare_prompt_inputs`` 404-443) number of initial
conditioning slices processed first, sequential memory-conditioned
tracking over the z-stack, multimask best/max selection, object-score
gating at ``NO_OBJ_SCORE``, 4× upsampling of low-res masks, sigmoid output.

TPU-native redesign of the tracking loop: the reference keeps a python
dict of per-frame outputs and re-concatenates memories every step
(``models/sam2.py:457-532``); here the memory bank is a fixed-size ring
buffer (``max_cond_slices`` cond slots + ``num_maskmem−1`` rolling slots,
plus an object-pointer ring) carried through ``jax.lax.scan`` — the entire
D-slice tracking pass is a single compiled XLA program with static shapes,
and the processing order / cond count are traced values so the random
cond-count recipe reuses one compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cryovit_tpu.models.sam2.config import SAM2Config
from cryovit_tpu.models.sam2.decoder import MaskDecoder
from cryovit_tpu.models.sam2.encoder import ImageEncoder
from cryovit_tpu.models.sam2.memory import MemoryAttention, MemoryEncoder
from cryovit_tpu.models.sam2.prompt_predictor import PromptPredictor
from cryovit_tpu.models.sam2.prompts import PromptEncoder

__all__ = ["SAM2Model", "MemoryBank"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MemoryBank:
    """Scan-carried tracking state (all static shapes).

    Slot layout: ``[0, max_cond_slices)`` hold conditioning-slice memories
    (reference ``cond_frame_outputs``), the following ``num_maskmem − 1``
    slots are the rolling ring of recent non-cond memories. Object
    pointers use the same split on their own axis.
    """

    spatial: jnp.ndarray  # (B, max_cond + num_maskmem - 1, e·e, mem_dim)
    spatial_valid: jnp.ndarray  # (B, slots) bool
    obj_ptrs: jnp.ndarray  # (B, P, d_model)
    ptr_valid: jnp.ndarray  # (B, P) bool
    write_idx: jnp.ndarray  # () int32 — count of non-cond writes + 1
    cond_count: jnp.ndarray  # () int32 — count of cond writes
    # per-slot cross-attention k/v caches for the memory-attention layers
    # (SAM2Model.kv_cache; None on the uncached/training path): projected
    # ONCE at write time instead of re-projecting all M·e² memory tokens
    # per slice per layer — see memory._MemAttnLayer.cached
    k_sp: jnp.ndarray | None = None  # (B, slots, e·e, L·d_model)
    v_sp: jnp.ndarray | None = None
    k_pt: jnp.ndarray | None = None  # (B, P, d_model//mem_dim, L·d_model)
    v_pt: jnp.ndarray | None = None

    @classmethod
    def empty(
        cls, b: int, cfg: SAM2Config, dtype=jnp.float32, kv_cache: bool = False
    ) -> "MemoryBank":
        e2 = cfg.embed_size * cfg.embed_size
        slots = cfg.max_cond_slices + cfg.num_maskmem - 1
        caches: dict = {}
        if kv_cache:
            ld = cfg.memory_attention_layers * cfg.d_model
            ratio = cfg.d_model // cfg.mem_dim
            caches = dict(
                k_sp=jnp.zeros((b, slots, e2, ld), dtype=dtype),
                v_sp=jnp.zeros((b, slots, e2, ld), dtype=dtype),
                k_pt=jnp.zeros((b, cfg.max_obj_ptrs, ratio, ld), dtype=dtype),
                v_pt=jnp.zeros((b, cfg.max_obj_ptrs, ratio, ld), dtype=dtype),
            )
        return cls(
            spatial=jnp.zeros((b, slots, e2, cfg.mem_dim), dtype=dtype),
            spatial_valid=jnp.zeros((b, slots), dtype=bool),
            obj_ptrs=jnp.zeros((b, cfg.max_obj_ptrs, cfg.d_model), dtype=dtype),
            ptr_valid=jnp.zeros((b, cfg.max_obj_ptrs), dtype=bool),
            write_idx=jnp.asarray(1, dtype=jnp.int32),
            cond_count=jnp.asarray(0, dtype=jnp.int32),
            **caches,
        )


class SAM2Model(nn.Module):
    """Composition of all SAM2 submodules + the per-tomogram tracking pass."""

    cfg: SAM2Config = SAM2Config.large()
    lora_rank: int = 128  # reference models/sam2.py:343-346
    lora_alpha: float = 128.0
    dtype: Any = jnp.float32
    # live-encoder micro-batching: when the tracking pass must encode more
    # than this many slices (the `evaluate`/`infer` path on a full volume —
    # up to MAX_SAM_DEPTH=255), the backbone runs as an nn.scan over
    # `encoder_chunk`-slice chunks instead of one giant batch. Hiera-L at
    # batch 255 @512² needs ~22 GB of activations (OOM on a 16 GB chip);
    # chunked, the live pass peaks at one chunk's activations plus the
    # output pyramids. 0 disables chunking. The reference encodes
    # per-frame anyway (models/sam2.py:457-532), so this changes nothing
    # semantically.
    encoder_chunk: int = 64
    # per-slot cross-attention k/v caching for the tracking scan (exact
    # math — see memory._MemAttnLayer.cached). Default OFF — implemented
    # and MEASURED FLAT on the real chip (BASELINE.md r5: 470 vs 485
    # slices/s at depth 255, 137.5 vs 136.7 ms at depth 64): the
    # per-layer cost is the (1024, 7232) attention traffic and the
    # assembly passes, not the k/v projections the cache removes, and
    # the caches add ~30 MB to the scan carry. Kept as a tested opt-in
    # (test_tracking_kv_cache_matches_uncached) with the negative result
    # documented, same policy as ops/fused_norm.py.
    kv_cache: bool = False

    def setup(self) -> None:
        cfg = self.cfg
        self.image_encoder = ImageEncoder(cfg, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(cfg, dtype=self.dtype)
        self.mask_decoder = MaskDecoder(
            cfg, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.dtype,
        )
        self.memory_encoder = MemoryEncoder(cfg, dtype=self.dtype)
        self.memory_attention = MemoryAttention(cfg, dtype=self.dtype)
        self.prompt_predictor = PromptPredictor(
            in_channels=cfg.d_model, dtype=self.dtype
        )
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, cfg.d_model)
        )
        # sam2's dummy-token fallback pos enc; unused by the
        # directly_add_no_mem_embed path (the sam2.1 config) but kept so
        # checkpoints map completely
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", nn.initializers.normal(0.02), (1, 1, cfg.d_model)
        )
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc",
            nn.initializers.normal(0.02),
            (cfg.num_maskmem, cfg.mem_dim),
        )
        self.obj_ptr_proj = nn.Dense(
            cfg.d_model, dtype=self.dtype, name="obj_ptr_proj"
        )
        if cfg.add_tpos_enc_to_obj_ptrs:
            # sam2.1: temporal sine PE (dim d_model) projected to mem_dim
            # and added to object-pointer tokens' pos embeddings
            self.obj_ptr_tpos_proj = nn.Dense(
                cfg.mem_dim, dtype=self.dtype, name="obj_ptr_tpos_proj"
            )
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.normal(0.02), (cfg.d_model,)
        )

    # ---- sub-steps ------------------------------------------------------

    def encode_images(self, slices: jnp.ndarray) -> dict[str, list[jnp.ndarray]]:
        """(N, S, S) grayscale slices → backbone pyramids (RGB replication
        is folded by broadcasting a single channel three ways)."""
        x = jnp.repeat(slices[..., None], 3, axis=-1)
        return self.image_encoder(x)

    def _slot_recency(self, bank: MemoryBank) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-slot recency indices: spatial slots → ``maskmem_tpos_enc``
        row (cond slots pin the conditioning index), pointer slots →
        temporal distance (0 for cond). Pure index arithmetic on the
        ring-buffer state."""
        cfg = self.cfg
        m = bank.spatial.shape[1]
        mc = cfg.max_cond_slices
        slot_ids = jnp.arange(m)
        recency = jnp.where(
            slot_ids < mc,
            cfg.num_maskmem - 1,
            jnp.mod(bank.write_idx - 1 - (slot_ids - mc + 1), cfg.num_maskmem - 1),
        )
        p = bank.obj_ptrs.shape[1]
        pdist = jnp.where(
            jnp.arange(p) < mc,
            0,
            1 + jnp.mod(bank.write_idx - 1 - (jnp.arange(p) - mc + 1),
                        cfg.max_obj_ptrs - mc),
        )
        return recency, pdist

    def _ptr_pe(self, pdist: jnp.ndarray, dtype) -> jnp.ndarray:
        """(P,) pointer distances → (P, mem_dim) projected temporal sine
        PE (sam2.1 ``add_tpos_enc_to_obj_ptrs``); zeros when disabled."""
        from cryovit_tpu.models.sam2.memory import sine_pe_1d

        cfg = self.cfg
        if not cfg.add_tpos_enc_to_obj_ptrs:
            return jnp.zeros((pdist.shape[0], cfg.mem_dim), dtype=dtype)
        tdiff_max = max(cfg.max_obj_ptrs - 1, 1)
        return self.obj_ptr_tpos_proj(
            sine_pe_1d(pdist / tdiff_max, cfg.d_model)
        ).astype(dtype)

    def _memory_tokens(
        self, bank: MemoryBank
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
        """Flatten the ring buffer into (B, M, mem_dim) tokens, their pos
        embeddings, and a validity mask; returns the spatial (RoPE'd)
        token count as well.

        Following sam2 ``_prepare_memory_conditioned_features``: position
        embeddings (the memory grid's sine PE + the per-recency
        ``maskmem_tpos_enc``) ride on a SEPARATE pos stream that the
        memory attention adds to k only — the memory *values* stay
        pos-free. Object-pointer tokens carry a projected temporal sine
        PE (sam2.1 ``add_tpos_enc_to_obj_ptrs``) with slot recency
        standing in for frame distance (the ring buffer does not track
        absolute slice indices — a documented redesign, see MemoryBank).
        """
        from cryovit_tpu.models.sam2.encoder import sine_position_encoding

        cfg = self.cfg
        b, m, e2, md = bank.spatial.shape
        e = cfg.embed_size
        recency, pdist = self._slot_recency(bank)
        tpos = self.maskmem_tpos_enc[recency].astype(
            bank.spatial.dtype
        )  # (m, mem_dim)
        grid_pe = jnp.asarray(
            sine_position_encoding(e, e, md), dtype=bank.spatial.dtype
        ).reshape(1, e2, md)
        spatial_pos = (grid_pe[None] + tpos[:, None, :][None]).reshape(
            1, m * e2, md
        )
        spatial = bank.spatial.reshape(b, m * e2, md)
        spatial_pos = jnp.broadcast_to(spatial_pos, spatial.shape)
        spatial_mask = jnp.repeat(bank.spatial_valid, e2, axis=1)

        # object pointers: split d_model-dim pointers into mem_dim tokens
        ratio = cfg.d_model // cfg.mem_dim
        ptrs = bank.obj_ptrs.reshape(b, -1, cfg.mem_dim)
        ptr_mask = jnp.repeat(bank.ptr_valid, ratio, axis=1)
        if cfg.add_tpos_enc_to_obj_ptrs:
            ptr_pe = self._ptr_pe(pdist, ptrs.dtype)  # (P, mem_dim)
            ptr_pos = jnp.repeat(ptr_pe, ratio, axis=0)[None]
            ptr_pos = jnp.broadcast_to(ptr_pos.astype(ptrs.dtype), ptrs.shape)
        else:
            ptr_pos = jnp.zeros_like(ptrs)
        tokens = jnp.concatenate([spatial, ptrs], axis=1)
        pos = jnp.concatenate([spatial_pos, ptr_pos], axis=1)
        mask = jnp.concatenate([spatial_mask, ptr_mask], axis=1)
        return tokens, pos, mask, m * e2

    def _condition_features(
        self,
        feats: jnp.ndarray,
        pos: jnp.ndarray,
        bank: MemoryBank,
        use_memory=True,
    ) -> jnp.ndarray:
        """Memory-conditioned pixel features; learned no-mem embedding when
        the bank is empty or the slice is a conditioning slice (reference:
        init cond frames skip memory attention entirely, ``track_step`` →
        ``_prepare_memory_conditioned_features``)."""
        has_memory = jnp.logical_and(jnp.any(bank.spatial_valid), use_memory)
        # branch-free: with an all-masked bank the cross-attention reads
        # zeros, so the with-memory path is computed unconditionally and the
        # no-mem slices select the learned embedding instead
        if bank.k_sp is not None:
            # cached path (kv_cache): per-slot k/v come from the bank's
            # write-time projections; only recency indices, the pointer
            # PE, and the validity mask are rebuilt per slice
            e2 = bank.spatial.shape[2]
            ratio = self.cfg.d_model // self.cfg.mem_dim
            recency, pdist = self._slot_recency(bank)
            ptr_pe = self._ptr_pe(pdist, bank.k_sp.dtype)
            mask = jnp.concatenate(
                [
                    jnp.repeat(bank.spatial_valid, e2, axis=1),
                    jnp.repeat(bank.ptr_valid, ratio, axis=1),
                ],
                axis=1,
            )
            conditioned = self.memory_attention.cached(
                feats, pos, bank.k_sp, bank.v_sp, bank.k_pt, bank.v_pt,
                recency, self.maskmem_tpos_enc, ptr_pe, mask,
            )
        else:
            tokens, mem_pos, mask, n_rope_k = self._memory_tokens(bank)
            conditioned = self.memory_attention(
                feats, pos, tokens, mem_pos, mask, n_rope_k
            )
        no_mem = feats + self.no_mem_embed.reshape(1, 1, 1, -1).astype(
            feats.dtype
        )
        return jnp.where(has_memory, conditioned, no_mem)

    def _encode_prompts(self, boxes, prompts):
        """Batch the prompt-side work over ALL slices before the scan
        (r5: the prompt encoder's mask-downscaling convs and the
        antialiased prompt resize depend only on the up-front
        PromptPredictor outputs — running them per slice inside the scan
        paid their lane-hostile shapes and dispatch floors D times).

        boxes (B, D, 4) in [0,1]; prompts (B, D, S, S) mask-prompt logits
        → (sparse (B, D, 3, d), dense (B, D, e, e, d))."""
        cfg = self.cfg
        b, d = boxes.shape[:2]
        s = cfg.mask_input_size
        mp = jax.image.resize(
            prompts.reshape(b * d, *prompts.shape[2:])[..., None],
            (b * d, s, s, 1), method="linear", antialias=True,
        )
        sparse, dense = self.prompt_encoder(
            boxes.reshape(b * d, 4) * cfg.image_size, mp
        )
        return (
            sparse.reshape(b, d, *sparse.shape[1:]),
            dense.reshape(b, d, *dense.shape[1:]),
        )

    def _sam_heads(
        self,
        pix_feat: jnp.ndarray,
        sparse: jnp.ndarray,
        dense: jnp.ndarray,
        high_res_feats: tuple[jnp.ndarray, jnp.ndarray],
        multimask: jnp.ndarray,
    ):
        """Mask decode + selection/gating on pre-encoded prompts
        (reference ``_forward_sam_heads``, ``models/sam2.py:670-796``;
        prompt encoding is batched outside the scan, ``_encode_prompts``).

        ``multimask`` is a traced bool (cond slice → True): both the
        multimask-max and single-mask selections are computed and chosen
        branch-free so the whole step stays scannable.
        """
        cfg = self.cfg
        b = pix_feat.shape[0]
        masks, ious, mask_tokens_out, obj_score = self.mask_decoder(
            pix_feat,
            self.prompt_encoder.dense_pe(),
            sparse,
            dense,
            high_res_feats,
        )
        # object-score gating (NO_OBJ_SCORE placeholder); obj_score is (B, 1)
        is_obj = obj_score > 0
        masks = jnp.where(is_obj[:, :, None, None], masks, cfg.no_obj_score)

        # multimask branch: prediction = max over outputs 1..3 (reference
        # track_step, sam2.py:576-580); the memory encoder instead receives
        # the best-IoU mask (reference _forward_sam_heads, sam2.py:757-768)
        multi_low = jnp.max(masks[:, 1:], axis=1)
        best = jnp.argmax(ious[:, 1:], axis=-1)
        best_low = jnp.take_along_axis(
            masks[:, 1:], best[:, None, None, None].repeat(masks.shape[-2], 2)
            .repeat(masks.shape[-1], 3), axis=1,
        )[:, 0]
        multi_token = jnp.take_along_axis(
            mask_tokens_out[:, 1:],
            best[:, None, None].repeat(mask_tokens_out.shape[-1], axis=-1),
            axis=1,
        )[:, 0]
        # single-mask branch: output 0
        low_res = jnp.where(multimask, multi_low, masks[:, 0])
        mem_mask = jnp.where(multimask, best_low, masks[:, 0])
        token = jnp.where(multimask, multi_token, mask_tokens_out[:, 0])

        obj_ptr = self.obj_ptr_proj(token)
        lam = is_obj[:, 0:1].astype(obj_ptr.dtype)
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr.astype(obj_ptr.dtype)
        # high-res (best-IoU) mask for the memory encoder
        high_res = jax.image.resize(
            mem_mask[..., None],
            (b, cfg.image_size, cfg.image_size, 1),
            method="linear",
        )
        return low_res, high_res, obj_ptr

    def _write_memory(
        self,
        bank: MemoryBank,
        pix_feat: jnp.ndarray,
        high_res_mask: jnp.ndarray,
        obj_ptr: jnp.ndarray,
        is_cond,
    ) -> MemoryBank:
        """Write one memory, branch-free on the (traced) ``is_cond`` flag:
        cond memories fill the next cond slot, non-cond memories the ring."""
        cfg = self.cfg
        mc = cfg.max_cond_slices
        b = pix_feat.shape[0]
        # sam2 _encode_new_memory: sigmoid then the sam2.1 affine
        # (scale 20, bias −10) before the mask downsampler
        mask_for_mem = (
            nn.sigmoid(high_res_mask) * cfg.sigmoid_scale_for_mem_enc
            + cfg.sigmoid_bias_for_mem_enc
        )
        mem = self.memory_encoder(pix_feat, mask_for_mem, skip_sigmoid=True)
        mem = mem.reshape(b, -1, cfg.mem_dim)
        is_cond = jnp.asarray(is_cond)
        cond_slot = jnp.minimum(bank.cond_count, mc - 1)
        roll_slot = mc + jnp.mod(bank.write_idx - 1, cfg.num_maskmem - 1)
        slot = jnp.where(is_cond, cond_slot, roll_slot)
        roll_pslot = mc + jnp.mod(bank.write_idx - 1, cfg.max_obj_ptrs - mc)
        pslot = jnp.where(is_cond, cond_slot, roll_pslot)
        spatial = jax.lax.dynamic_update_index_in_dim(bank.spatial, mem, slot, 1)
        valid = bank.spatial_valid.at[:, slot].set(True)
        ptrs = jax.lax.dynamic_update_index_in_dim(bank.obj_ptrs, obj_ptr, pslot, 1)
        pvalid = bank.ptr_valid.at[:, pslot].set(True)
        inc = jnp.where(is_cond, 0, 1).astype(bank.write_idx.dtype)
        caches: dict = {}
        if bank.k_sp is not None:
            # project the ONE written slot through every memory-attention
            # layer's cross k/v (memory.MemoryAttention.project_memory) —
            # the per-slice cross-attention then reads these caches
            # instead of re-projecting the whole bank (exact by linearity)
            dt = bank.k_sp.dtype
            k_new, v_new = self.memory_attention.project_memory(mem)
            ptr_tok = obj_ptr.reshape(b, -1, cfg.mem_dim)
            kp_new, vp_new = self.memory_attention.project_ptr(ptr_tok)
            caches = dict(
                k_sp=jax.lax.dynamic_update_index_in_dim(
                    bank.k_sp, k_new.astype(dt), slot, 1
                ),
                v_sp=jax.lax.dynamic_update_index_in_dim(
                    bank.v_sp, v_new.astype(dt), slot, 1
                ),
                k_pt=jax.lax.dynamic_update_index_in_dim(
                    bank.k_pt, kp_new.astype(dt), pslot, 1
                ),
                v_pt=jax.lax.dynamic_update_index_in_dim(
                    bank.v_pt, vp_new.astype(dt), pslot, 1
                ),
            )
        return MemoryBank(
            spatial,
            valid,
            ptrs,
            pvalid,
            bank.write_idx + inc,
            bank.cond_count + (1 - inc),
            **caches,
        )

    def _slice_step(self, bank: MemoryBank, xs):
        """One tracking step (scanned over slices in processing order —
        conditioning slices first, reference ``forward_tracking``)."""
        idx, is_cond, feat2, p2, s0i, s1i, sparse, dense = xs
        # cond slices skip memory conditioning (no-mem embedding) and use
        # multimask outputs; tracked slices attend to the bank, single-mask
        pix = self._condition_features(
            feat2, p2, bank, use_memory=jnp.logical_not(is_cond)
        )
        low_res, high_res, obj_ptr = self._sam_heads(
            pix, sparse, dense, (s0i, s1i), is_cond
        )
        # sam2 encodes the RAW backbone features into memory, not the
        # memory-conditioned ones (_encode_new_memory(current_vision_feats))
        bank = self._write_memory(bank, feat2, high_res, obj_ptr, is_cond)
        return bank, low_res

    # ---- full tracking pass ---------------------------------------------

    def __call__(
        self,
        slices: jnp.ndarray,  # (B, D, S, S) preprocessed grayscale
        backbone: dict[str, jnp.ndarray] | None = None,  # cached features
        order: jnp.ndarray | None = None,  # (D,) processing order
        num_cond: jnp.ndarray | int | None = None,  # cond slices (first of order)
    ) -> dict[str, jnp.ndarray]:
        """Track through the z-stack → per-voxel probabilities.

        ``order`` is the slice processing order with the conditioning
        slices first (reference ``forward_tracking`` processes
        ``init_cond_slices + slices_not_in_init_cond``); ``num_cond`` of
        them are treated as conditioning slices. Both are traced values —
        the random-cond-count training recipe (reference
        ``prepare_prompt_inputs``, models/sam2.py:404-443) reuses one
        compiled program for every draw. Defaults: natural order, 1 cond.

        Returns {"preds": (B, D, S, S) sigmoid probs in the original slice
        order, "prompts": the predicted dense mask prompts (B, D, S, S)}.
        """
        cfg = self.cfg
        b, d, s, _ = slices.shape
        if order is None:
            order = jnp.arange(d)
        if num_cond is None:
            num_cond = 1
        num_cond = jnp.asarray(num_cond, dtype=jnp.int32)

        if backbone is None:
            flat = slices.reshape(b * d, s, s)
            ch = self.encoder_chunk
            if ch and flat.shape[0] > ch:
                n = flat.shape[0]
                pad = (-n) % ch
                if pad:
                    flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))
                chunks = flat.reshape(-1, ch, s, s)

                def enc_step(mdl, carry, xc):
                    return carry, mdl.encode_images(xc)

                scan_enc = nn.scan(
                    enc_step,
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=0,
                    out_axes=0,
                )
                _, stacked = scan_enc(self, None, chunks)
                backbone = jax.tree.map(
                    lambda x: x.reshape(-1, *x.shape[2:])[:n], stacked
                )
            else:
                backbone = self.encode_images(flat)
        fpn = backbone["backbone_fpn"]
        pos = backbone["vision_pos_enc"]

        def unflat(x):
            return x.reshape(b, d, *x.shape[1:])

        s0, s1, s2 = (unflat(f) for f in fpn[:3])  # strides 4, 8, 16
        pos2 = unflat(pos[2])

        boxes, prompts = self.prompt_predictor(s0)  # (B·D, 4), (B·D, 4h0, 4w0, 1)
        boxes = boxes.reshape(b, d, 4)
        prompts = prompts.reshape(b, d, s, s)
        # prompt-side work batched over all slices (see _encode_prompts)
        sparse, dense = self._encode_prompts(boxes, prompts)

        def sel(x):  # (B, D, ...) → (D, B, ...) in processing order
            return jnp.take(jnp.moveaxis(x, 0, 1), order, axis=0)

        xs = (
            order,
            jnp.arange(d) < num_cond,
            sel(s2),
            sel(pos2),
            sel(s0),
            sel(s1),
            sel(sparse),
            sel(dense),
        )
        bank = MemoryBank.empty(b, cfg, dtype=self.dtype, kv_cache=self.kv_cache)
        # lifted scan: params broadcast across slices, memory bank carried
        scan = nn.scan(
            type(self)._slice_step,
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        _, low_res_masks = scan(self, bank, xs)
        # undo the processing permutation, then (D, B, e4, e4) → (B, D, S, S)
        low = jnp.take(low_res_masks, jnp.argsort(order), axis=0)
        low = jnp.moveaxis(low, 0, 1)
        up = jax.image.resize(low, (b, d, s, s), method="linear")
        return {"preds": nn.sigmoid(up), "prompts": prompts}
