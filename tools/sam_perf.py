#!/usr/bin/env python
"""SAM2 Hiera-L pyramid-extraction timing lab (real TPU).

Times the ``features --use-sam`` hot loop (bench.py methodology: scalar
read forced per batch) for the bf16 path and the opt-in w8a8 trunk mode.
Run: python tools/sam_perf.py [--int8-only] [--batch N]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cryovit_tpu.run.sam_features import (
    SamFeatureExtractor,
    make_sam_encoder_variables,
)

NBATCH = 8


def time_variant(name, extractor, stacks):
    fn = extractor._batch_fn()
    float(jnp.sum(fn(stacks[0])["backbone_fpn"][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    sums = [
        jnp.sum(fn(s)["backbone_fpn"][0].astype(jnp.float32)) for s in stacks
    ]
    for s in sums:
        float(s)
    dt = time.perf_counter() - t0
    rate = stacks[0].shape[0] * len(stacks) / dt
    print(f"{name}: {rate:6.2f} slices/s")
    return rate


def main():
    batch = 24
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    variables = make_sam_encoder_variables("", random_init=True)
    rng = np.random.default_rng(3)
    stacks = [
        jnp.asarray(rng.random((batch, 512, 512)).astype(np.float32))
        for _ in range(NBATCH)
    ]
    if "--int8-only" not in sys.argv:
        time_variant(
            f"bf16 (batch {batch})",
            SamFeatureExtractor(variables, batch_size=batch),
            stacks,
        )
    time_variant(
        f"int8 (batch {batch})",
        SamFeatureExtractor(variables, batch_size=batch, quant_int8=True),
        stacks,
    )


if __name__ == "__main__":
    main()
