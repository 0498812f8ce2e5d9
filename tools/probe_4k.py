#!/usr/bin/env python
"""Probe: the 4k-token (1024² slice) flash-attention dot shapes.

The chunked single-K-block path at 4112 tokens runs (208, 64)·(4112, 64)
QK dots and (208, 4112)·(4112, 72) PV dots — the q-chunk height is
capped by the f32 score tile's VMEM (chunk × 4112 × 4B). The r3 kernel
lab measured M=1040 dots 2.6× more efficient than M=208 at 1040-token
shapes; this probe asks whether splitting K into column blocks (legal
without online-softmax state because the production path runs
``softmax_shift=False`` — accumulation only) buys that M-efficiency at
the 4k shape: same score-tile VMEM, 4× taller q chunks.

Run on the real TPU: python tools/probe_4k.py
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20000
NB = 8


def probe(name, a_shape, b_shape, dims, flops):
    """Like mxu_probe.probe but the sink accumulates only the first 128
    output lanes — the full-output accumulate is itself a VPU pass over
    the (M, N) f32 tile (3.4 MB for the 4k QK shapes) and swamps the
    dot being measured."""

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        a = a_ref[...]

        def body(i, _):
            b = b_ref[jax.lax.rem(i, NB)]
            out = jax.lax.dot_general(
                a, b, (dims, ((), ())), preferred_element_type=jnp.float32
            )
            acc_ref[...] += out[:, : acc_ref.shape[1]]
            return 0

        acc_ref[...] = jnp.zeros_like(acc_ref)
        jax.lax.fori_loop(0, REPS, body, 0)
        o_ref[0, 0] = acc_ref[0, 0]

    m = a_shape[0]
    n_out = b_shape[1] if dims[1] == (0,) else b_shape[0]
    n_acc = min(n_out, 128)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((m, n_acc), jnp.float32)],
        )(a, b)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(a_shape) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((NB, *b_shape)) * 0.1, jnp.bfloat16)
    float(run(a, b)[0, 0])  # compile+warm
    t0 = time.perf_counter()
    float(run(a, b)[0, 0])
    us = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:34s} {us:8.2f} us/dot  ({flops / us / 1e6:6.1f} TF/s)", flush=True)

N = 4112
D = 64

cases = {
    # --- QK^T stage: same total work (208×4112 vs 4×(832×1040)) ---
    "qk cur (208,64)x(4112,64)": ((208, D), (N, D), ((1,), (1,)), 2 * 208 * N * D),
    "qk alt (416,64)x(2056,64)": ((416, D), (N // 2, D), ((1,), (1,)), 2 * 416 * (N // 2) * D),
    "qk alt (832,64)x(1028,64)": ((832, D), (N // 4, D), ((1,), (1,)), 2 * 832 * (N // 4) * D),
    "qk alt (1644,64)x(520,64)": ((1648, D), (520, D), ((1,), (1,)), 2 * 1648 * 520 * D),
    # --- PV stage: (chunk, K-block) x (K-block, 72) ---
    "pv cur (208,4112)x(4112,72)": ((208, N), (N, 72), ((1,), (0,)), 2 * 208 * N * 72),
    "pv alt (416,2056)x(2056,72)": ((416, N // 2), (N // 2, 72), ((1,), (0,)), 2 * 416 * (N // 2) * 72),
    "pv alt (832,1028)x(1028,72)": ((832, N // 4), (N // 4, 72), ((1,), (0,)), 2 * 832 * (N // 4) * 72),
}

for name, (a, b, dims, fl) in cases.items():
    probe(name, a, b, dims, fl)
