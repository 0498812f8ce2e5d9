#!/usr/bin/env python
"""Standalone flash-kernel timing lab (real TPU).

Times flash_attention_pairs in isolation with the production call
signature (pre-padded tokens, folded scale, in-kernel bias), amortizing
the axon tunnel's timing noise over many iterations. Run:
    python tools/kernel_lab.py [variant ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

from cryovit_tpu.ops.flash_attention import flash_attention_pairs

import os
B = int(os.environ.get("KL_B", "64"))
G, P = 12, 128
N_TRUE = int(os.environ.get("KL_N", "1029"))
N_PAD = (N_TRUE + 15) // 16 * 16
REPS = int(os.environ.get("KL_REPS", "20"))


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, G, N_PAD, P)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, G, N_PAD, P)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, G, N_PAD, P)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((3, G, P)) * 0.1, jnp.bfloat16)

    def run(name, **kw):
        # chain REPS kernel applications inside ONE jit program (v feeds
        # back) so the per-dispatch tunnel latency (~25 ms) is amortized
        # to nothing — per-call timing through the tunnel is unusable
        import functools

        base = dict(
            pre_scaled=True, exp2_bf16=True, true_len=N_TRUE,
        )
        base.update(kw)

        @jax.jit
        def many(q, k, v, bias):
            def body(v, _):
                out = flash_attention_pairs(q, k, v, kv_bias=bias, **base)
                return out, ()

            v, _ = jax.lax.scan(body, v, None, length=REPS)
            return jnp.sum(v.astype(jnp.float32))

        try:
            float(many(q, k, v, bias))  # compile + warm
            t0 = time.perf_counter()
            float(many(q, k, v, bias))
            dt = (time.perf_counter() - t0) / REPS * 1000
            # attention flops (useful): 4*B*G*2*N^2*D
            fl = 4 * B * G * 2 * N_TRUE * N_TRUE * 64
            print(f"{name:28s} {dt:8.2f} ms/call  ({fl / dt / 1e9:6.1f} TF/s)", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)

    variants = {
        "auto": {},
        "qc1": {"q_chunks": 1},
        "qc5": {"q_chunks": 5},
        "qc13": {"q_chunks": 13},
        "qc65": {"q_chunks": 65},
        "bq520": {"block_q": 520, "q_chunks": 1},
        "bq208": {"block_q": 208, "q_chunks": 1},
        "bq640qc4": {"block_q": 640, "q_chunks": 4},
        "bq320qc2": {"block_q": 320, "q_chunks": 2},
        "bq320qc1": {"block_q": 320, "q_chunks": 1},
        "bq160qc1": {"block_q": 160, "q_chunks": 1},
        "bq480qc3": {"block_q": 480, "q_chunks": 3},
        "bq832qc4": {"block_q": 832, "q_chunks": 4},
        "bq208_bk208": {"block_q": 208, "block_k": 208, "q_chunks": 1},
        "noexp": {"ablate": "noexp"},
        "nopv": {"ablate": "nopv"},
        # f32 probability tile (exp at f32): if PV barely slows, the MXU
        # dots are overhead-bound, not compute-bound
        "f32p": {"exp2_bf16": False},
        "noshift": {"softmax_shift": False},
        # multi-plane programs (amortize fixed per-program cost)
        "pb2": {"planes_per_block": 2},
        "pb4": {"planes_per_block": 4},
        "pb6": {"planes_per_block": 6},
        "pb12": {"planes_per_block": 12},
    }
    for name in (sys.argv[1:] or list(variants)):
        run(name, **variants[name])


if __name__ == "__main__":
    main()
