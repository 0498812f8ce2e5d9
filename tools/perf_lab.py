#!/usr/bin/env python
"""Ablation timing lab for the DINOv2 extraction path (real TPU).

Times end-to-end extraction variants (bench.py methodology: batch 64 of
512² slices, 8 batches, scalar-read forced) so individual optimizations
can be attributed. Run: python tools/perf_lab.py [variant ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

from cryovit_tpu.models.dinov2 import DinoV2Config, make_dinov2
from cryovit_tpu.ops.resize import bicubic_resize_matrix

BATCH, SIDE, NBATCH = 64, 512, 8
if "--side" in sys.argv:
    i = sys.argv.index("--side")
    SIDE = int(sys.argv[i + 1])
    del sys.argv[i : i + 2]
    if SIDE > 512:
        BATCH = 24  # the 1024² bench batch
if "--batch" in sys.argv:
    i = sys.argv.index("--batch")
    BATCH = int(sys.argv[i + 1])
    del sys.argv[i : i + 2]


def build_fn(module, variables, side):
    out_h = side // 16 * 14
    rh = bicubic_resize_matrix(side, out_h)

    @jax.jit
    def fn(variables, slices):
        x = jnp.einsum("oh,bhw->bow", rh, slices)
        x = jnp.einsum("pw,bow->bop", rh, x)
        feats = module.apply(variables, x)
        return feats.astype(jnp.float16)

    return fn


def time_variant(name, module, variables, stacks):
    fn = build_fn(module, variables, SIDE)
    float(jnp.sum(fn(variables, stacks[0]).astype(jnp.float32)))  # warmup
    t0 = time.perf_counter()
    sums = [jnp.sum(fn(variables, s).astype(jnp.float32)) for s in stacks]
    for s in sums:
        float(s)
    dt = time.perf_counter() - t0
    rate = BATCH * NBATCH / dt
    print(f"{name:24s} {rate:7.2f} slices/s  ({dt:.2f}s)", flush=True)
    return rate


def main():
    cfg = DinoV2Config.giant()
    base = make_dinov2(cfg, use_flash_attention=False)
    probe = jnp.zeros((1, 2 * 14, 2 * 14))
    variables = jax.jit(base.init)(jax.random.key(0), probe)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    rng = np.random.default_rng(0)
    stacks = [
        jnp.asarray(rng.random((BATCH, SIDE, SIDE)).astype(np.float32))
        for _ in range(NBATCH)
    ]

    import functools

    from cryovit_tpu.models.dinov2 import DinoV2
    from cryovit_tpu.ops.flash_attention import flash_attention_pairs

    def pairs_module(fn, rdtype=jnp.bfloat16):
        return DinoV2(
            cfg=cfg, pair_attention_fn=fn, scan_blocks=True, residual_dtype=rdtype
        )

    fa = flash_attention_pairs
    variants = {
        "headmajor_f32res": lambda: make_dinov2(cfg, use_flash_attention=True, pair_heads=False),
        "pairs_f32res": lambda: make_dinov2(cfg, use_flash_attention=True, pair_heads=True),
        "headmajor_bf16res": lambda: make_dinov2(
            cfg, use_flash_attention=True, pair_heads=False, residual_dtype=jnp.bfloat16
        ),
        "pairs_bf16res": lambda: make_dinov2(
            cfg, use_flash_attention=True, pair_heads=True, residual_dtype=jnp.bfloat16
        ),
        "attnfree": lambda: pairs_module(lambda q, k, v, **_: v),
        # all planes stay live → isolates the kernel itself (attnfree lets
        # XLA dead-code 2/3 of the qkv projection)
        "attnsum": lambda: pairs_module(lambda q, k, v, **_: q + k + v),
        # kernel twice → marginal kernel cost = attn2x − pairs_bf16res
        "attn2x": lambda: pairs_module(
            lambda q, k, v, **kw: fa(q, k, fa(q, k, v, **kw), **kw)
        ),
        "pairs_bq576": lambda: pairs_module(functools.partial(fa, block_q=576)),
        "pairs_bk576": lambda: pairs_module(functools.partial(fa, block_k=576)),
        "pairs_bq384": lambda: pairs_module(functools.partial(fa, block_q=384)),
        "pairs_bq128": lambda: pairs_module(functools.partial(fa, block_q=128)),
        # pipelined single-K-block kernel: q-chunk sweep (auto = VMEM cap)
        "pairs_qc1": lambda: pairs_module(functools.partial(fa, q_chunks=1)),
        "pairs_qc2": lambda: pairs_module(functools.partial(fa, q_chunks=2)),
        "pairs_qc5": lambda: pairs_module(functools.partial(fa, q_chunks=5)),
        "pairs_qc13": lambda: pairs_module(functools.partial(fa, q_chunks=13)),
        "pairs_qc65": lambda: pairs_module(functools.partial(fa, q_chunks=65)),
        # r3: no row-max pass (exp2 overflow bound documented in the kernel)
        "pairs_noshift": lambda: pairs_module(
            functools.partial(fa, softmax_shift=False)
        ),
        "pairs_noshift_qc1": lambda: pairs_module(
            functools.partial(fa, softmax_shift=False, q_chunks=1)
        ),
        # kernel-body attribution (wrong math, timing only)
        "pairs_noexp": lambda: pairs_module(functools.partial(fa, ablate="noexp")),
        "pairs_nopv": lambda: pairs_module(functools.partial(fa, ablate="nopv")),
        # same attribution on the production (no-shift) softmax recipe —
        # the deltas vs pairs_noshift split the kernel into QK / exp / PV
        "pairs_noshift_noexp": lambda: pairs_module(
            functools.partial(fa, softmax_shift=False, ablate="noexp")
        ),
        "pairs_noshift_nopv": lambda: pairs_module(
            functools.partial(fa, softmax_shift=False, ablate="nopv")
        ),
        "pairs_noshift_cheappv": lambda: pairs_module(
            functools.partial(fa, softmax_shift=False, ablate="cheappv")
        ),
        "pairs_noshift_noqk": lambda: pairs_module(
            functools.partial(fa, softmax_shift=False, ablate="noqk")
        ),
        # r5: int8 attention internals (BASELINE 1024² ceiling: the only
        # lever left at d=64 is narrower score/PV operands)
        "pairs_int8pv": lambda: pairs_module(functools.partial(fa, quant="pv")),
        "pairs_int8qk": lambda: pairs_module(functools.partial(fa, quant="qk")),
        "pairs_int8qkpv": lambda: pairs_module(
            functools.partial(fa, quant="qkpv")
        ),
        # block-choice control: same 832-row blocks as the production
        # bf16 path (ch 64, the largest 32-aligned chunk dividing 832)
        "pairs_int8pv_bq832": lambda: pairs_module(
            functools.partial(fa, quant="pv", block_q=832, q_chunks=13)
        ),
        "pairs_shift_ctl": lambda: pairs_module(
            functools.partial(fa, softmax_shift=True)
        ),
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        time_variant(name, variants[name](), variables, stacks)


if __name__ == "__main__":
    main()
