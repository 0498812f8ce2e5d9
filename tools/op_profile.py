#!/usr/bin/env python
"""Per-op device-time profiler: run a jitted fn under jax.profiler.trace
and print the aggregated XLA-op table from the device plane.

Device-side op durations come from the hardware trace, so they stay
reliable even when the host is loaded (unlike wall-clock timing through
the axon tunnel). Usage::

    python tools/op_profile.py sam      # SAM2 Hiera+FPN extractor batch
    python tools/op_profile.py dino     # DINOv2 ViT-g extractor batch

or import :func:`profile_fn` from another script.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict


def _device_op_table(trace_dir: str) -> list[tuple[str, float, int]]:
    """Parse .xplane.pb under ``trace_dir`` → [(op_name, total_ms, count)]
    aggregated over the device planes (TPU/accelerator lines only)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for path in paths:
        spaces = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            spaces.ParseFromString(f.read())
        for plane in spaces.planes:
            name = plane.name.lower()
            # device planes: "/device:TPU:0" / "TPU:0" / "/device:tpu ..."
            if "tpu" not in name and "gpu" not in name and "device" not in name:
                continue
            if "host" in name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                # ONLY the synchronous 'XLA Ops' line: it is the true
                # serialized device timeline (its event durations sum to
                # the program wall time). 'XLA Modules' duplicates it as
                # one umbrella event and 'Async XLA Ops' carries DMA
                # spans that overlap compute — counting either
                # double-books the timeline.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    meta = ev_meta.get(ev.metadata_id)
                    if meta is None:
                        continue
                    totals[meta.name] += ev.duration_ps / 1e9  # ps → ms
                    counts[meta.name] += 1
    return sorted(
        ((k, v, counts[k]) for k, v in totals.items()), key=lambda t: -t[1]
    )


def profile_fn(fn, *args, top: int = 30, warmup: int = 1, runs: int = 1):
    """Trace ``runs`` executions of ``fn(*args)`` (after ``warmup``) and
    print the per-op device-time table."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(runs):
                out = jax.block_until_ready(fn(*args))
        rows = _device_op_table(td)
    # drop umbrella whole-program events (jit_<fn> markers on module lines)
    rows = [r for r in rows if not r[0].startswith("jit_")]
    total = sum(r[1] for r in rows)
    print(f"total device time: {total:.1f} ms over {len(rows)} distinct ops")

    # aggregate by op category: '%fusion.336 = bf16[64,...' → 'fusion bf16'
    import re

    cats: dict[str, float] = defaultdict(float)
    ncat: dict[str, int] = defaultdict(int)
    for name, ms, n in rows:
        m = re.match(r"%?([a-zA-Z_\-]+)[\.\d]* = \(?(\w+)\[", name)
        key = f"{m.group(1)} {m.group(2)}" if m else name.split(".")[0]
        cats[key] += ms
        ncat[key] += n
    print(f"\n{'category':40s} {'ms':>9s} {'%':>6s} {'n':>6s}")
    for key, ms in sorted(cats.items(), key=lambda t: -t[1])[:top]:
        print(f"{key:40s} {ms:9.2f} {100 * ms / total:5.1f}% {ncat[key]:6d}")
    print(f"\ntop individual ops:\n{'op':64s} {'ms':>9s} {'%':>6s} {'n':>5s}")
    for name, ms, n in rows[:top]:
        print(f"{name[:64]:64s} {ms:9.2f} {100 * ms / total:5.1f}% {n:5d}")
    return rows


def _sam_batch():
    import jax.numpy as jnp
    import numpy as np

    from cryovit_tpu.run.sam_features import (
        SamFeatureExtractor,
        make_sam_encoder_variables,
    )

    import jax

    variables = make_sam_encoder_variables("", random_init=True)
    if "--bf16-params" in sys.argv:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables,
        )
    ex = SamFeatureExtractor(
        variables, quant_int8="--int8" in sys.argv
    )  # measured-sweet-spot batch
    fn = ex._batch_fn()
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.random((ex.batch_size, 512, 512)).astype(np.float32)
    )
    return lambda: fn(stack)


def _dino_batch():
    import jax.numpy as jnp
    import numpy as np

    from cryovit_tpu.models.dinov2 import DinoV2Config
    from cryovit_tpu.run.dino_features import (
        DinoExtractor,
        load_dinov2_variables,
    )

    cfg = DinoV2Config.giant()
    variables, _ = load_dinov2_variables("", random_init=True, cfg=cfg)
    variables = __import__("jax").tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    size = 512
    if "--size" in sys.argv:
        size = int(sys.argv[sys.argv.index("--size") + 1])
    batch = 64 if size == 512 else 24
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    ex = DinoExtractor(variables, cfg=cfg, batch_size=batch)
    fn = ex._batch_fn(size, size)
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.random((batch, size, size)).astype(np.float32))
    return lambda: fn(ex.variables, stack)


def _sam_track():
    """SAM2 tracking inference (the evaluate/infer eval path): one
    cached-pyramid tracking pass through the ring-buffer scan. Depth via
    ``--depth N`` (default 64); ``--live`` runs the live encoder."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cryovit_tpu.config import compose
    from cryovit_tpu.run.common import build_model

    depth = 64
    if "--depth" in sys.argv:
        depth = int(sys.argv[sys.argv.index("--depth") + 1])
    cfg = compose(
        "train_model", ["model=sam2", "datamodule=single", "label_key=mito"]
    )
    model = build_model(cfg, "bf16")
    model.train_mode = False
    s = 512
    data = jax.jit(
        lambda k: jax.random.uniform(k, (1, depth, s, s, 1), jnp.float32)
    )(jax.random.key(0))
    # synthesize params from init SHAPES (jitting the real init compiles a
    # program as large as the forward — minutes; see tools/sam_perf.py)
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
    if "--live" in sys.argv:
        inputs = data
    else:
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
    return lambda: fwd(variables, inputs)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    which = sys.argv[1] if len(sys.argv) > 1 else "sam"
    fn = {"sam": _sam_batch, "dino": _dino_batch, "track": _sam_track}[which]()
    top = 30
    if len(sys.argv) > 2 and sys.argv[2].isdigit():
        top = int(sys.argv[2])
    profile_fn(fn, top=top)


if __name__ == "__main__":
    main()
