#!/usr/bin/env python
"""End-to-end extraction-with-IO benchmark (tunnel-independent).

Measures the full host pipeline — gzip-HDF5 decode → device extract →
gzip-HDF5 feature write — on synthetic tomograms, attributing time per
stage and reporting the overlap factor (stage-time sum ÷ wall). The
device D2H through the axon tunnel (~5 MB/s) makes TPU end-to-end
unmeasurable in this environment (BASELINE.md), so this runs the same
code on the CPU backend with a reduced DINOv2 (IO cost is
backend-independent; the overlap machinery under test is
``run/common.pipeline_io`` + ``io/hdf.read_dataset``).

Usage: JAX_PLATFORMS=cpu python tools/io_bench.py [--tomos N] [--depth D]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tomos", type=int, default=6)
    parser.add_argument("--depth", type=int, default=32)
    parser.add_argument("--side", type=int, default=256)
    args = parser.parse_args()

    import os
    import tempfile
    from pathlib import Path

    import numpy as np

    from cryovit_tpu.io.hdf import write_hdf
    from cryovit_tpu.models.dinov2 import DinoV2Config
    from cryovit_tpu.run.dino_features import run_dino

    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="iobench"))
    src = tmp / "src"
    src.mkdir()
    files = []
    for i in range(args.tomos):
        vol = rng.integers(0, 255, size=(args.depth, args.side, args.side)).astype(
            np.uint8
        )
        path = src / f"tomo{i}.hdf"
        write_hdf(path, {"data": vol}, compressed_keys=("data",))
        files.append(path)

    cfg = DinoV2Config(
        embed_dim=384, depth=6, num_heads=6, ffn_hidden=1024, pos_grid=16
    )

    # stage attribution: monkeypatch timers around the pipeline stages
    import cryovit_tpu.run.dino_features as df

    stage = {"read": 0.0, "compute": 0.0, "write": 0.0}

    real_read = df._read_source
    orig_extract = df.DinoExtractor.extract
    orig_save = df.save_feature_hdf

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            stage[name] += time.perf_counter() - t0
            return out

        return wrap

    df.DinoExtractor.extract = timed("compute", orig_extract)
    df.save_feature_hdf = timed("write", orig_save)

    from cryovit_tpu.data.datasets import FileDataset

    orig_getitem = FileDataset.__getitem__
    FileDataset.__getitem__ = timed("read", orig_getitem)

    out_dir = tmp / "out"
    run_dino(files, out_dir, batch_size=16, random_init=True, dino_cfg=cfg)  # warm
    for k in stage:
        stage[k] = 0.0
    t0 = time.perf_counter()
    run_dino(files, out_dir, batch_size=16, random_init=True, dino_cfg=cfg)
    wall = time.perf_counter() - t0

    total = sum(stage.values())
    print(
        f"tomos={args.tomos} {args.depth}x{args.side}^2 | "
        f"read {stage['read']:.2f}s compute {stage['compute']:.2f}s "
        f"write {stage['write']:.2f}s | stage-sum {total:.2f}s wall {wall:.2f}s "
        f"| overlap factor {total / wall:.2f}x (cpus={os.cpu_count()})"
    )


if __name__ == "__main__":
    main()
