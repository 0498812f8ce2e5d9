#!/usr/bin/env python
"""Benchmark: the repo's perf frontier as driver-parsed JSON lines.

Prints ONE JSON line per metric on stdout, each of the shape
``{"metric", "value", "unit", "vs_baseline"}``. The FIRST line is the
headline DINOv2 ViT-g/14 extraction throughput (the driver's historical
metric); the remaining lines report the rest of the measured frontier —
SAM2 Hiera-L pyramid extraction (bf16 + int8), SAM2 tracking inference
(cached pyramids + live encoder), and the CryoVIT / UNet3D train steps.
Every section is independently guarded: a failure prints to stderr and
the remaining metrics still report.

``--quick`` runs only the headline metric. ``--all`` additionally prints
extra-shape numbers (1024², 768×512, multi-bucket) to stderr.

vs_baseline convention: measured per-chip value ÷ the estimated
*reference PyTorch pipeline on its actual hardware* (1× A100,
``slurm_scripts/*.sh``). The reference repo publishes no numbers
(BASELINE.md), so each denominator is a documented estimate:

- DINOv2 extraction, 31 slices/s: ViT-g ≈ 2.5 TFLOP per 1029-token
  448×448 slice; A100 ≈ 312 TFLOP/s bf16 at ~25% end-to-end MFU
  (per-batch fp16→CPU transfers, no fusion).
- SAM2 extraction, 120 slices/s: Hiera-L ≈ 0.66 TFLOP per 512² slice
  (published ~127 GFLOPs @224² scaled by area + FPN) at the same ~25%
  A100 MFU ≈ 118; consistent with FAIR's ~30 FPS @1024² whole-model
  A100 figure (≈4× lighter at 512²).
- SAM2 tracking inference: the reference's sequential per-frame Python
  loop (``models/sam2.py:457-532``). Live ≈ 40 slices/s (whole-model
  ~30 FPS @1024² on A100, encoder 4× lighter at 512² but the
  per-frame loop overhead and memory attention don't shrink); cached
  pyramids skip the encoder ≈ 80 slices/s.
- CryoVIT train step, 260 slices/s at the reference's full 128×512×512
  crop; UNet3D, 390 slices/s at 32×256×256: conv-bound 16-mixed torch
  steps estimated at ~30% A100 utilization from this repo's measured
  v5e step times and MXU rates (393.9 ms / 65.4 ms, BASELINE.md) via
  (312·0.30)/(197·0.60) effective-rate scaling.

A v5e-8 runs 8 chips data-parallel over ICI (slices are independent;
``DinoExtractor(mesh=...)`` / ``SamFeatureExtractor(mesh=...)``), so
whole-pod throughput is ~8× the per-chip values reported here.
"""

import gc
import json
import sys
import time

A100_REFERENCE_SLICES_PER_SEC = 31.0
SAM_EXTRACT_A100_SLICES_PER_SEC = 120.0
TRACKING_CACHED_A100_SLICES_PER_SEC = 80.0
TRACKING_LIVE_A100_SLICES_PER_SEC = 40.0
CRYOVIT_STEP_A100_SLICES_PER_SEC = 260.0
UNET3D_STEP_A100_SLICES_PER_SEC = 390.0


def _emit(metric: str, value: float, unit: str, baseline: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3),
            }
        ),
        flush=True,
    )


def _section(name):
    """Run a metric section, isolating failures and freeing device memory."""

    def deco(fn):
        def run(*a, **kw):
            try:
                fn(*a, **kw)
            except Exception as e:  # pragma: no cover - defensive
                print(f"[bench] section {name} failed: {e!r}", file=sys.stderr)
            gc.collect()

        return run

    return deco


# ---------------------------------------------------------------------------
# DINOv2 extraction (headline)
# ---------------------------------------------------------------------------


def _dino_extraction(jnp, quant_int8: bool) -> float:
    """Jit-compiled extraction pipeline (bicubic 14/16 resize + folded
    single-channel patch embed + 40-block ViT-g with Pallas flash attention
    + fp16 cast) on 512×512 slices — the reference's hot loop
    (``run/dino_features.py:31-64``, batch 128 on one A100, SURVEY §3.3)."""
    import jax

    from cryovit_tpu.models.dinov2 import DinoV2Config
    from cryovit_tpu.run.dino_features import DinoExtractor, load_dinov2_variables

    batch = 96  # measured sweet spot (48.6 slices/s vs 47.9 at 64, 47.5 at 128)
    side = 512  # raw slice side (multiple of 16) → 448×448 after 14/16
    n_batches = 6

    cfg = DinoV2Config.giant()
    variables, _ = load_dinov2_variables("", random_init=True, cfg=cfg)
    # bf16 params: halves HBM traffic for the weight streams
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    extractor = DinoExtractor(
        variables, cfg=cfg, batch_size=batch, quant_int8=quant_int8
    )

    # distinct input per timed step: the tunneled runtime has been observed
    # to memoize pure executions on identical inputs, which breaks timing.
    # Generated ON DEVICE: host-side stacks would upload ~600 MB through
    # the ~5 MB/s axon tunnel and dominate bench wall time.
    mk = jax.jit(
        lambda k: jax.random.uniform(k, (batch, side, side), jnp.float32)
    )
    stacks = [mk(jax.random.key(i)) for i in range(n_batches)]

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
    # physical ceiling on v5e ≈ 86 slices/s/chip bf16 (197 TFLOP/s ÷ 2.3
    # TFLOP); far above means the runtime served stale results — retry once
    if per_chip > 150:
        dt = timed_run()
        per_chip = batch * n_batches / dt / max(n_chips, 1)
    if "--all" in sys.argv and not quant_int8:
        import numpy as np

        extractor.batch_size = 16
        _extra_shapes(extractor, jnp, np)
    return per_chip


@_section("dinov2_int8")
def _dino_int8_section(jnp) -> None:
    per_chip = _dino_extraction(jnp, quant_int8=True)
    _emit(
        "dinov2_vitg14_extraction_throughput_int8",
        per_chip,
        "slices/sec/chip (512x512 slices, opt-in w8a8 projections)",
        A100_REFERENCE_SLICES_PER_SEC,
    )


# ---------------------------------------------------------------------------
# SAM2 Hiera-L pyramid extraction (features --use-sam hot loop)
# ---------------------------------------------------------------------------


@_section("sam2_extraction")
def _sam_extraction_section(jnp, quant_int8: bool) -> None:
    from cryovit_tpu.run.sam_features import (
        SamFeatureExtractor,
        make_sam_encoder_variables,
    )

    import jax

    sam_vars = make_sam_encoder_variables("", random_init=True)
    sam_ex = SamFeatureExtractor(sam_vars, quant_int8=quant_int8)
    sam_fn = sam_ex._batch_fn()
    mk = jax.jit(
        lambda k: jax.random.uniform(
            k, (sam_ex.batch_size, 512, 512), jnp.float32
        )
    )
    stacks = [mk(jax.random.key(100 + i)) for i in range(8)]
    float(jnp.sum(sam_fn(stacks[0])["backbone_fpn"][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    sums = [
        jnp.sum(sam_fn(s)["backbone_fpn"][0].astype(jnp.float32))
        for s in stacks
    ]
    for s in sums:
        float(s)
    dt = time.perf_counter() - t0
    rate = sam_ex.batch_size * len(stacks) / dt
    _emit(
        "sam2_hiera_l_extraction_throughput" + ("_int8" if quant_int8 else ""),
        rate,
        "slices/sec/chip (512x512 slices, FPN pyramids"
        + (", opt-in w8a8 trunk)" if quant_int8 else ")"),
        SAM_EXTRACT_A100_SLICES_PER_SEC,
    )


# ---------------------------------------------------------------------------
# SAM2 tracking inference (evaluate/infer eval workload)
# ---------------------------------------------------------------------------


def _tracking_rate(jnp, cached: bool, depth: int = 255) -> float:
    """Sequential memory-conditioned tracking over ``depth`` slices @512²
    as one compiled ring-buffer scan (reference ``models/sam2.py:457-532``).
    Shares tools/sam_perf.py --track methodology (eval_shape param
    synthesis, device-side inputs)."""
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
    if cached:
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
    else:
        inputs = data
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
    return depth / dt


@_section("sam2_tracking")
def _tracking_section(jnp, cached: bool) -> None:
    rate = _tracking_rate(jnp, cached=cached)
    _emit(
        "sam2_tracking_inference_"
        + ("cached_pyramids" if cached else "live_encoder"),
        rate,
        "slices/sec (255x512x512 volume, memory-conditioned scan"
        + (", cached sam_features)" if cached else ", live Hiera-L)"),
        TRACKING_CACHED_A100_SLICES_PER_SEC
        if cached
        else TRACKING_LIVE_A100_SLICES_PER_SEC,
    )


# ---------------------------------------------------------------------------
# Train steps (CryoVIT decoder, UNet3D)
# ---------------------------------------------------------------------------


@_section("train_step")
def _train_step_section(jnp, kind: str) -> None:
    """One full jitted train step (fwd + bwd + AdamW update, bf16 compute,
    masked dice loss) at the reference recipe's crop sizes."""
    import jax

    from cryovit_tpu.models import CryoVIT, UNet3D
    from cryovit_tpu.models.losses import DiceLoss
    from cryovit_tpu.models.metrics import DiceMetric
    from cryovit_tpu.train.loop import Trainer, TrainState

    def mk_data(shape, key):  # on device — see the tunnel note above
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32)
        )(jax.random.key(key))

    def mk_label(shape, key):
        return jax.jit(
            lambda k: jax.random.randint(k, shape, -1, 2).astype(jnp.float32)
        )(jax.random.key(key))

    if kind == "cryovit":
        # the reference's full training crop: 128×512×512 voxels =
        # 128×32×32 DINO patch grid (tomo_dataset.py:148-178)
        fam = CryoVIT(
            "bench", "dino_features", lr=1e-4,
            losses={"dice_loss": DiceLoss()},
            metrics={"dice_metric": DiceMetric()}, dtype=jnp.bfloat16,
        )
        depth = 128
        data = mk_data((1, depth, 32, 32, 1536), 11)
        label = mk_label((1, depth, 512, 512), 12)
        baseline = CRYOVIT_STEP_A100_SLICES_PER_SEC
        unit = "slices/sec (128x512x512 crop, fwd+bwd+AdamW)"
    else:
        fam = UNet3D(
            "bench", "data", lr=3e-3,
            losses={"dice_loss": DiceLoss()},
            metrics={"dice_metric": DiceMetric()}, dtype=jnp.bfloat16,
        )
        depth = 32
        data = mk_data((1, depth, 256, 256, 1), 13)
        label = mk_label((1, depth, 256, 256), 14)
        baseline = UNET3D_STEP_A100_SLICES_PER_SEC
        unit = "slices/sec (32x256x256 raw-voxel crop, fwd+bwd+AdamW)"

    variables = fam.init(jax.random.key(0), data)
    opt = fam.make_optimizer()
    trainer = Trainer(donate_state=False)
    step = trainer._train_step_fn(fam, opt)
    state = TrainState.create(variables, opt)
    state, logs = step(state, data, label)  # compile + warmup
    float(logs["train_total"])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, logs = step(state, data, label)
    float(logs["train_total"])  # forces the whole chain via state deps
    dt = (time.perf_counter() - t0) / n
    _emit(f"{kind}_train_step_throughput", depth / dt, unit, baseline)
    print(f"[bench] {kind} train step: {dt * 1e3:.1f} ms/step", file=sys.stderr)


# ---------------------------------------------------------------------------
# --all extra shapes (stderr only)
# ---------------------------------------------------------------------------


def _extra_shapes(extractor, jnp, np) -> None:
    """--all: throughput at more shapes (reference tomograms vary widely,
    reference utils.py:186-225) + a multi-bucket extraction run. Results go
    to stderr; stdout keeps the driver JSON lines."""

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


def main() -> None:
    import jax

    # persistent compile cache: first-ever run pays full compilation,
    # subsequent bench runs on this machine start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import jax.numpy as jnp
    import numpy as np

    # headline metric first: even if a later section dies, the driver's
    # historical metric is already on stdout
    per_chip = _dino_extraction(jnp, quant_int8="--int8" in sys.argv)
    _emit(
        "dinov2_vitg14_extraction_throughput"
        + ("_int8" if "--int8" in sys.argv else ""),
        per_chip,
        "slices/sec/chip (512x512 slices)",
        A100_REFERENCE_SLICES_PER_SEC,
    )
    if "--quick" in sys.argv:
        return
    gc.collect()
    if "--int8" not in sys.argv:
        _dino_int8_section(jnp)
    _sam_extraction_section(jnp, quant_int8=False)
    _sam_extraction_section(jnp, quant_int8=True)
    _tracking_section(jnp, cached=True)
    _tracking_section(jnp, cached=False)
    _train_step_section(jnp, "cryovit")
    _train_step_section(jnp, "unet3d")


if __name__ == "__main__":
    sys.exit(main())
