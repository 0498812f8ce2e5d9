#!/usr/bin/env python
"""SAM2 tracking-inference ablation lab (real TPU) — VERDICT r5 item 7.

Decomposes the tracking scan body (reference ``models/sam2.py:457-532``;
here one compiled ring-buffer ``lax.scan``, ``models/sam2/model.py``) the
way the DINOv2 kernel lab decomposed the 1024² flash kernel: each variant
swaps ONE component of the per-slice step for a shape-preserving stub (or
shrinks one axis), so ``full − variant`` attributes that component's cost
in situ — with the surrounding program, DMA overlap, and dispatch
pipeline intact. Values/params are synthesized (eval_shape + random);
only time is read.

Variants:
- full        the production cached-pyramid tracking pass
- nomem       memory attention replaced by the no-mem embedding path
- layers1     1 memory-attention layer instead of 4 (per-layer cost)
- smallbank   num_maskmem 7→2, max_obj_ptrs 16→4 (cross-attn K length
              7232→2112: K-length scaling of the cross-attention)
- noheads     prompt-encoder + mask-decoder + obj-ptr heads stubbed
- nomemenc    memory-encoder writes skipped (bank stays empty)
- empty       trivial scan body (scan + glue + up-front floor)

Run: python tools/track_lab.py [--depth 64] [--variants full,nomem,...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import dataclasses

import jax.numpy as jnp
import numpy as np

from cryovit_tpu.models.sam2.config import SAM2Config
from cryovit_tpu.models.sam2.model import SAM2Model


class _NoMemAttn(SAM2Model):
    def _condition_features(self, feats, pos, bank, use_memory=True):
        return feats + self.no_mem_embed.reshape(1, 1, 1, -1).astype(feats.dtype)


class _NoHeads(SAM2Model):
    def _sam_heads(self, pix_feat, sparse, dense, high_res_feats, multimask):
        cfg = self.cfg
        b = pix_feat.shape[0]
        e4 = cfg.embed_size * 4
        # keep a data dependency on pix_feat so XLA cannot dead-code the
        # conditioned features the stub replaces the heads of
        seed = jnp.mean(pix_feat, dtype=jnp.float32)
        low = jnp.full((b, e4, e4), 0.0, jnp.float32) + seed
        high = jnp.zeros((b, cfg.image_size, cfg.image_size, 1), jnp.float32) + seed
        ptr = jnp.zeros((b, cfg.d_model), pix_feat.dtype) + seed.astype(pix_feat.dtype)
        return low, high, ptr


class _NoMemEnc(SAM2Model):
    def _write_memory(self, bank, pix_feat, high_res_mask, obj_ptr, is_cond):
        return bank


class _CheapMemEnc(SAM2Model):
    """Keep the bank DYNAMICS (writes happen, nothing hoists) but replace
    the MemoryEncoder NN — the MaskDownSampler's 1→4→16-channel convs at
    512² are lane-hostile — with a cheap shape-preserving stand-in.
    full − cheapmemenc isolates the encoder NN from the hoisting effect
    that contaminates the nomemenc reading."""

    def _write_memory(self, bank, pix_feat, high_res_mask, obj_ptr, is_cond):
        cfg = self.cfg
        b, e, _, _ = pix_feat.shape
        seed = jnp.mean(high_res_mask, dtype=jnp.float32).astype(pix_feat.dtype)
        mem = pix_feat[..., : cfg.mem_dim] + seed
        # inline the production write path with the stub encoder output
        import jax as _jax

        mc = cfg.max_cond_slices
        memf = mem.reshape(b, -1, cfg.mem_dim)
        is_cond = jnp.asarray(is_cond)
        cond_slot = jnp.minimum(bank.cond_count, mc - 1)
        roll_slot = mc + jnp.mod(bank.write_idx - 1, cfg.num_maskmem - 1)
        slot = jnp.where(is_cond, cond_slot, roll_slot)
        roll_pslot = mc + jnp.mod(bank.write_idx - 1, cfg.max_obj_ptrs - mc)
        pslot = jnp.where(is_cond, cond_slot, roll_pslot)
        spatial = _jax.lax.dynamic_update_index_in_dim(bank.spatial, memf, slot, 1)
        valid = bank.spatial_valid.at[:, slot].set(True)
        ptrs = _jax.lax.dynamic_update_index_in_dim(bank.obj_ptrs, obj_ptr, pslot, 1)
        pvalid = bank.ptr_valid.at[:, pslot].set(True)
        inc = jnp.where(is_cond, 0, 1).astype(bank.write_idx.dtype)
        caches = {}
        if bank.k_sp is not None:
            dt = bank.k_sp.dtype
            k_new, v_new = self.memory_attention.project_memory(memf)
            ptr_tok = obj_ptr.reshape(b, -1, cfg.mem_dim)
            kp_new, vp_new = self.memory_attention.project_ptr(ptr_tok)
            caches = dict(
                k_sp=_jax.lax.dynamic_update_index_in_dim(bank.k_sp, k_new.astype(dt), slot, 1),
                v_sp=_jax.lax.dynamic_update_index_in_dim(bank.v_sp, v_new.astype(dt), slot, 1),
                k_pt=_jax.lax.dynamic_update_index_in_dim(bank.k_pt, kp_new.astype(dt), pslot, 1),
                v_pt=_jax.lax.dynamic_update_index_in_dim(bank.v_pt, vp_new.astype(dt), pslot, 1),
            )
        from cryovit_tpu.models.sam2.model import MemoryBank
        return MemoryBank(spatial, valid, ptrs, pvalid,
                          bank.write_idx + inc, bank.cond_count + (1 - inc),
                          **caches)


class _EmptyBody(SAM2Model):
    def _slice_step(self, bank, xs):
        idx, is_cond, feat2, p2, s0i, s1i, box, prompt = xs
        cfg = self.cfg
        e4 = cfg.embed_size * 4
        low = jnp.zeros((feat2.shape[0], e4, e4), jnp.float32) + jnp.mean(
            feat2, dtype=jnp.float32
        )
        return bank, low


VARIANTS = {
    "full": (SAM2Model, {}),
    "nomem": (_NoMemAttn, {}),
    "layers1": (SAM2Model, {"memory_attention_layers": 1}),
    "smallbank": (SAM2Model, {"num_maskmem": 2, "max_obj_ptrs": 4}),
    "noheads": (_NoHeads, {}),
    "nomemenc": (_NoMemEnc, {}),
    "cheapmemenc": (_CheapMemEnc, {}),
    "empty": (_EmptyBody, {}),
}


def synth_variables(model, depth, s):
    shapes = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jnp.zeros((1, 2, s, s), jnp.float32),
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def synth(k):
        ks = jax.random.split(k, len(leaves))
        return treedef.unflatten([
            (0.02 * jax.random.normal(ki, l.shape, l.dtype))
            if jnp.issubdtype(l.dtype, jnp.floating)
            else jnp.zeros(l.shape, l.dtype)
            for ki, l in zip(ks, leaves)
        ])

    variables = synth(jax.random.key(1))
    jax.block_until_ready(variables)
    return variables


def time_variant(name, depth=64, n=5):
    cls, overrides = VARIANTS[name]
    cfg = SAM2Config.large()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    model = cls(cfg=cfg, dtype=jnp.bfloat16)
    s = cfg.image_size
    variables = synth_variables(model, depth, s)
    data = jax.jit(
        lambda k: jax.random.uniform(k, (1, depth, s, s), jnp.float32)
    )(jax.random.key(0))
    d_model = cfg.d_model
    levels = tuple(
        jax.jit(
            lambda k, st=st: jax.random.uniform(
                k, (depth, s // st, s // st, d_model), jnp.bfloat16
            )
        )(jax.random.key(10 + st))
        for st in (4, 8, 16)
    )
    backbone = {"backbone_fpn": levels, "vision_pos_enc": levels}
    fwd = jax.jit(
        lambda v, sl, bb: model.apply(v, sl, backbone=bb)["preds"]
    )
    t0 = time.perf_counter()
    float(jnp.sum(fwd(variables, data, backbone).astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sums = [
        jnp.sum(fwd(variables, data, backbone).astype(jnp.float32))
        for _ in range(n)
    ]
    for x in sums:
        float(x)
    dt = (time.perf_counter() - t0) / n
    print(
        f"{name:10s}: {dt * 1e3:7.1f} ms/volume  "
        f"({depth / dt:6.1f} slices/s, {dt / depth * 1e3:6.3f} ms/slice) "
        f"[compile {compile_s:.0f}s]",
        flush=True,
    )
    return dt


def main():
    depth = 64
    if "--depth" in sys.argv:
        depth = int(sys.argv[sys.argv.index("--depth") + 1])
    names = list(VARIANTS)
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1].split(",")
    times = {}
    for name in names:
        times[name] = time_variant(name, depth=depth)
    if "full" in times:
        full = times["full"]
        print("\nattribution (full − variant):")
        for name, dt in times.items():
            if name == "full":
                continue
            print(
                f"  {name:10s}: {(full - dt) * 1e3:7.1f} ms/volume "
                f"({(full - dt) / depth * 1e3:6.3f} ms/slice, "
                f"{(full - dt) / full * 100:5.1f}% of full)"
            )


if __name__ == "__main__":
    main()
