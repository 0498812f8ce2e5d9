#!/usr/bin/env python
"""Benchmark: DINOv2 ViT-g/14 feature extraction throughput (slices/sec/chip).

Measures the jit-compiled extraction pipeline (bicubic 14/16 resize + folded
single-channel patch embed + 40-block ViT-g with Pallas flash attention +
fp16 cast) on 512×512 tomogram slices — the reference's hot loop
(``run/dino_features.py:31-64``, batch 128 on one A100, SURVEY §3.3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares per-chip throughput against the estimated reference
PyTorch pipeline on its actual hardware (1× A100, ``slurm_scripts/*.sh``):
ViT-g ≈ 2.5 TFLOP per 1029-token 448×448 slice; A100 ≈ 312 TFLOP/s bf16 at
~25% end-to-end MFU (per-batch fp16→CPU transfers, no fusion) ≈ 31
slices/sec. The repo publishes no measured numbers (BASELINE.md), so this
documented estimate is the stand-in. A v5e-8 runs 8 of these chips
data-parallel over ICI (slices are independent), so whole-pod throughput is
~8× the per-chip value reported here.

Measured reference point (2026-08-16, TPU v5e single chip, this code):
~32 slices/sec/chip with flash attention (≈41% MFU); XLA attention reaches
~20 slices/sec — the Pallas kernel is a 1.6× end-to-end win.
"""

import json
import sys
import time

A100_REFERENCE_SLICES_PER_SEC = 31.0


def _extra_shapes(extractor, jnp, np) -> None:
    """--all: throughput at more shapes (reference tomograms vary widely,
    reference utils.py:186-225) + a multi-bucket extraction run. Results go
    to stderr; stdout keeps the single driver JSON line."""

    def run(batch, h, w, n_batches=4):
        rng = np.random.default_rng(1)
        fn = extractor._batch_fn(h, w)
        stacks = [
            jnp.asarray(rng.random((batch, h, w)).astype(np.float32))
            for _ in range(n_batches)
        ]
        float(jnp.sum(fn(extractor.variables, stacks[0]).astype(jnp.float32)))
        t0 = time.perf_counter()
        sums = [jnp.sum(fn(extractor.variables, s).astype(jnp.float32)) for s in stacks]
        for s in sums:
            float(s)
        dt = time.perf_counter() - t0
        rate = batch * n_batches / dt
        print(f"  {h}x{w} (batch {batch}): {rate:6.2f} slices/s", file=sys.stderr)
        return rate

    print("extra shapes:", file=sys.stderr)
    run(24, 1024, 1024)  # 4.2k tokens/slice — exercises the n>1280 block path
    run(32, 768, 512)  # non-square

    # SAM2 Hiera-L+FPN pyramid extraction (the features --use-sam hot loop)
    from cryovit_tpu.run.sam_features import (
        SamFeatureExtractor,
        make_sam_encoder_variables,
    )

    sam_vars = make_sam_encoder_variables("", random_init=True)
    sam_ex = SamFeatureExtractor(
        sam_vars, quant_int8="--int8" in sys.argv
    )  # measured-sweet-spot batch
    sam_fn = sam_ex._batch_fn()
    rng = np.random.default_rng(3)
    sam_stacks = [
        jnp.asarray(
            rng.random((sam_ex.batch_size, 512, 512)).astype(np.float32)
        )
        for _ in range(8)
    ]
    float(jnp.sum(sam_fn(sam_stacks[0])["backbone_fpn"][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    sums = [
        jnp.sum(sam_fn(s)["backbone_fpn"][0].astype(jnp.float32))
        for s in sam_stacks
    ]
    for s in sums:
        float(s)
    dt = time.perf_counter() - t0
    print(
        f"  sam2 hiera-l pyramids (batch {sam_ex.batch_size}): "
        f"{sam_ex.batch_size * len(sam_stacks) / dt:6.2f} slices/s",
        file=sys.stderr,
    )
    # SAM2 tracking inference (the evaluate/infer eval workload, reference
    # models/sam2.py:457-532): full-depth memory-conditioned tracking with
    # cached sam_features pyramids through the ring-buffer scan
    _sam_tracking_rate(jnp, depth=255)

    # multi-bucket: alternate shapes through one extractor (compile reuse)
    rng = np.random.default_rng(2)
    stacks = [
        rng.random((8, 512, 512)).astype(np.float32),
        rng.random((8, 768, 512)).astype(np.float32),
        rng.random((8, 1024, 1024)).astype(np.float32),
    ]
    for s in stacks:  # warm all buckets
        extractor.extract(s)
    t0 = time.perf_counter()
    n = 0
    for s in stacks * 2:
        feats = extractor.extract(s)
        n += s.shape[0]
    dt = time.perf_counter() - t0
    print(
        f"  multi-bucket (512/768x512/1024 mix): {n / dt:6.2f} slices/s "
        "incl. feature download — D2H through the axon tunnel (~5 MB/s) "
        "dominates here; on a TPU-attached host this matches the compute "
        "rates above",
        file=sys.stderr,
    )


def _sam_tracking_rate(jnp, depth: int = 255) -> None:
    """SAM2 tracking inference throughput (cached pyramids, depth slices
    @512² per volume) — the reference's sequential eval loop, here one
    compiled ring-buffer scan. Shares tools/sam_perf.py --track methodology
    (eval_shape param synthesis, device-side inputs)."""
    import jax

    from cryovit_tpu.config import compose
    from cryovit_tpu.run.common import build_model

    cfg = compose(
        "train_model", ["model=sam2", "datamodule=single", "label_key=mito"]
    )
    model = build_model(cfg, "bf16")
    model.train_mode = False
    s = 512
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 2, s, s, 1), jnp.float32)
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
    data = jax.jit(
        lambda k: jax.random.uniform(k, (1, depth, s, s, 1), jnp.float32)
    )(jax.random.key(0))
    d_model = model.sam_cfg.d_model
    levels = tuple(
        jax.jit(
            lambda k, st=st: jax.random.uniform(
                k, (depth, s // st, s // st, d_model), jnp.bfloat16
            )
        )(jax.random.key(10 + st))
        for st in (4, 8, 16)
    )
    inputs = {"slices": data, "backbone": {
        "backbone_fpn": levels, "vision_pos_enc": levels}}
    fwd = jax.jit(lambda v, inp: model.apply(v, inp))
    float(jnp.sum(fwd(variables, inputs).astype(jnp.float32)))  # warmup
    n = 3
    t0 = time.perf_counter()
    sums = [
        jnp.sum(fwd(variables, inputs).astype(jnp.float32)) for _ in range(n)
    ]
    for x in sums:
        float(x)
    dt = (time.perf_counter() - t0) / n
    print(
        f"  sam2 tracking inference (cached pyramids, {depth}x512² volume): "
        f"{dt * 1e3:7.1f} ms/volume ({depth / dt:6.1f} slices/s)",
        file=sys.stderr,
    )


def main() -> None:
    import jax

    # persistent compile cache: first-ever run pays full compilation,
    # subsequent bench runs on this machine start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from cryovit_tpu.models.dinov2 import DinoV2Config
    from cryovit_tpu.run.dino_features import DinoExtractor, load_dinov2_variables

    batch = 96  # measured sweet spot (48.6 slices/s vs 47.9 at 64, 47.5 at 128)
    side = 512  # raw slice side (multiple of 16) → 448×448 after 14/16
    n_batches = 6

    cfg = DinoV2Config.giant()
    variables, _ = load_dinov2_variables("", random_init=True, cfg=cfg)
    # bf16 params: halves HBM traffic for the weight streams
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
    )
    # --int8: measure the opt-in w8a8 projection mode (not the official
    # number the driver records — that stays bf16)
    quant_int8 = "--int8" in sys.argv
    extractor = DinoExtractor(
        variables, cfg=cfg, batch_size=batch, quant_int8=quant_int8
    )

    rng = np.random.default_rng(0)
    # distinct input per timed step: the tunneled runtime has been observed
    # to memoize pure executions on identical inputs, which breaks timing
    stacks = [
        jnp.asarray(rng.random((batch, side, side)).astype(np.float32))
        for _ in range(n_batches)
    ]

    fn = extractor._batch_fn(side, side)
    # warmup: force a real value read (the tunneled runtime's
    # block_until_ready has been observed to return early)
    float(jnp.sum(fn(extractor.variables, stacks[0]).astype(jnp.float32)))

    def timed_run() -> float:
        t0 = time.perf_counter()
        # dispatch everything (queues on device), then force a scalar read
        # per output — each read depends on its computation, so the wall
        # clock covers all real work even if block_until_ready lies
        sums = [
            jnp.sum(fn(extractor.variables, s).astype(jnp.float32))
            for s in stacks
        ]
        for s in sums:
            float(s)
        return time.perf_counter() - t0

    dt = timed_run()
    n_chips = jax.local_device_count()
    per_chip = batch * n_batches / dt / max(n_chips, 1)
    # physical ceiling on v5e ≈ 86 slices/s/chip (197 TFLOP/s ÷ 2.3 TFLOP);
    # anything above means the runtime served stale results — retry once
    if per_chip > 150:
        dt = timed_run()
        per_chip = batch * n_batches / dt / max(n_chips, 1)
    if "--all" in sys.argv:
        extractor.batch_size = 16
        _extra_shapes(extractor, jnp, np)
    print(
        json.dumps(
            {
                "metric": "dinov2_vitg14_extraction_throughput"
                + ("_int8" if quant_int8 else ""),
                "value": round(per_chip, 2),
                "unit": "slices/sec/chip (512x512 slices)",
                "vs_baseline": round(per_chip / A100_REFERENCE_SLICES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
