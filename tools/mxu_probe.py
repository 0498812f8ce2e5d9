#!/usr/bin/env python
"""Micro-probe: MXU dot cost by operand orientation/shape (real TPU).

Times isolated in-kernel dots shaped like the flash kernel's QK^T and PV
stages, with the contraction on either operand axis, to attribute the
kernel's per-dot inefficiency (transpose-free A·B vs A·B^T forms).
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


NB = 8  # rotate through NB distinct b operands so the loop cannot hoist


def probe(name, a_shape, b_shape, dims, flops):
    def kernel(a_ref, b_ref, o_ref, acc_ref):
        a = a_ref[...]

        def body(i, _):
            b = b_ref[jax.lax.rem(i, NB)]
            out = jax.lax.dot_general(
                a, b, (dims, ((), ())), preferred_element_type=jnp.float32
            )
            acc_ref[...] += out
            return 0

        acc_ref[...] = jnp.zeros_like(acc_ref)
        jax.lax.fori_loop(0, REPS, body, 0)
        o_ref[0, 0] = acc_ref[0, 0]

    m = a_shape[0]
    n_out = b_shape[1] if dims[1] == (0,) else b_shape[0]

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
            scratch_shapes=[pltpu.VMEM((m, n_out), jnp.float32)],
        )(a, b)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(a_shape) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((NB, *b_shape)) * 0.1, jnp.bfloat16)
    float(run(a, b)[0, 0])  # compile+warm
    t0 = time.perf_counter()
    float(run(a, b)[0, 0])
    us = (time.perf_counter() - t0) / REPS * 1e6
    print(f"{name:34s} {us:8.2f} us/dot  ({flops / us / 1e6:6.1f} TF/s)", flush=True)


def main():
    ch, n, d = 208, 1040, 64
    cases = {
        # QK^T as used today: (ch, d) x (n, d) contracting d with d (A·B^T)
        "qk_abT (208,64)x(1040,64)c(1,1)": ((ch, d), (n, d), ((1,), (1,)), 2 * ch * n * d),
        # same math, pre-transposed K: standard A·B
        "qk_ab  (208,64)x(64,1040)c(1,0)": ((ch, d), (d, n), ((1,), (0,)), 2 * ch * n * d),
        # PV as used today: (ch, n) x (n, 72) A·B
        "pv_ab  (208,1040)x(1040,72)": ((ch, n), (n, 72), ((1,), (0,)), 2 * ch * n * 72),
        # PV with full-width output
        "pv_ab  (208,1040)x(1040,128)": ((ch, n), (n, 128), ((1,), (0,)), 2 * ch * n * 128),
        # d=128 contraction QK (the block-diagonal alternative's shape)
        "qk_ab  (208,128)x(128,2080)": ((ch, 128), (128, 2 * n), ((1,), (0,)), 2 * ch * 2 * n * 128),
        # big M
        "qk_abT (1040,64)x(1040,64)": ((n, d), (n, d), ((1,), (1,)), 2 * n * n * d),
        "qk_ab  (1040,64)x(64,1040)": ((n, d), (d, n), ((1,), (0,)), 2 * n * n * d),
    }
    for name in (sys.argv[1:] or list(cases)):
        a, b, dims, fl = cases[name]
        probe(name, a, b, dims, fl)


if __name__ == "__main__":
    main()
