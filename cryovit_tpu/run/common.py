"""Shared wiring between config nodes and runtime objects."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import jax.numpy as jnp

from cryovit_tpu.composer import DotDict, instantiate
from cryovit_tpu.models.base import BaseModel
from cryovit_tpu.train.loop import Trainer

logger = logging.getLogger(__name__)

__all__ = [
    "build_datamodule",
    "build_file_datamodule",
    "build_trainer",
    "build_model",
    "setup_exp_dir",
]

_PRECISION_DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32, "fp32": jnp.float32}


def build_model(cfg: DotDict, precision: str | None = None) -> BaseModel:
    """Instantiate the model family from ``cfg.model`` with the trainer's
    compute-dtype policy applied."""
    model: BaseModel = instantiate(cfg.model)
    dtype = _PRECISION_DTYPES.get(precision or "", None)
    if dtype is not None and dtype != model.dtype:
        model.dtype = dtype
        model.module = model.build_module()
    return model


def build_datamodule(cfg: DotDict):
    """Experiment-mode datamodule from ``cfg.datamodule`` + splits CSV
    (reference ``run/train_model.py:224-232``)."""
    dm_cfg = dict(cfg.datamodule)
    dataset_fn = instantiate(dm_cfg.pop("dataset"))
    dataloader_fn = instantiate(dm_cfg.pop("dataloader"))
    target = dm_cfg.pop("_target_")
    split_file = (
        Path(cfg.paths.data_dir) / cfg.paths.csv_name / cfg.paths.split_name
    )
    from cryovit_tpu.composer import _import_target

    cls = _import_target(target)
    dm_cfg.pop("_partial_", None)
    return cls(
        split_file=split_file,
        dataset_fn=dataset_fn,
        dataloader_fn=dataloader_fn,
        input_key=cfg.model.input_key,
        **dm_cfg,
    )


def build_file_datamodule(
    cfg: DotDict,
    data_paths: list,
    data_labels: list | None = None,
    val_paths: list | None = None,
    val_labels: list | None = None,
    labels: list[str] | None = None,
):
    """CLI-mode FileDataModule (reference ``run/train_model.py:82-92``)."""
    from cryovit_tpu.data import FileDataModule

    dataset_fn = instantiate(cfg.datamodule.dataset)
    dataloader_fn = instantiate(cfg.datamodule.dataloader)
    return FileDataModule(
        data_paths=data_paths,
        data_labels=data_labels,
        val_paths=val_paths,
        val_labels=val_labels,
        labels=labels,
        dataset_fn=dataset_fn,
        dataloader_fn=dataloader_fn,
        input_key=cfg.model.input_key,
    )


def build_trainer(cfg: DotDict, extra_callbacks: list | None = None) -> Trainer:
    """Trainer + callbacks + loggers from config."""
    callbacks = [instantiate(node) for node in (cfg.get("callbacks") or {}).values()]
    loggers = [instantiate(node) for node in (cfg.get("logger") or {}).values()]
    callbacks.extend(extra_callbacks or [])
    trainer_cfg: dict[str, Any] = dict(cfg.get("trainer") or {})
    return Trainer(
        callbacks=callbacks,
        loggers=loggers,
        seed=int(cfg.get("random_seed", 42)),
        **trainer_cfg,
    )


def setup_exp_dir(cfg: DotDict) -> Path:
    """Experiment directory layout ``exp_dir/<name>/<sample>[/split_k][/test_X]``
    (reference ``run/train_model.py:159-203``)."""
    exp_dir = Path(cfg.paths.exp_dir) / str(cfg.name)
    dm = cfg.get("datamodule", {})
    sample = dm.get("sample")
    if isinstance(sample, (list, tuple)):
        sample = "_".join(sorted(map(str, sample)))
    if sample is not None:
        exp_dir = exp_dir / str(sample)
    if dm.get("split_id") is not None:
        exp_dir = exp_dir / f"split_{dm.split_id}"
    test_sample = dm.get("test_sample")
    if isinstance(test_sample, (list, tuple)):
        test_sample = "_".join(sorted(map(str, test_sample)))
    # test_<X> level only exists for fractional sweeps (reference
    # run/train_model.py:184-186)
    if "Fractional" in str(dm.get("_target_", "")) and test_sample is not None:
        exp_dir = exp_dir / f"test_{test_sample}"
    exp_dir.mkdir(parents=True, exist_ok=True)
    return exp_dir


def pipeline_io(
    n: int,
    read_fn,
    compute_fn,
    write_fn,
    read_ahead: int = 2,
    writers: int = 2,
) -> list:
    """Read → compute → write pipeline for extraction sweeps.

    Reads prefetch in a small thread pool (``read_ahead`` items deep),
    writes retire in a writer pool with bounded backpressure, and compute
    (the jit'd device program) stays on the caller thread — so host HDF5
    decode and gzip encode overlap device time instead of serializing
    with it (the reference gets the read half of this from its 8
    DataLoader workers; the write half it does serially).

    ``read_fn(i)`` → item; ``compute_fn(i, item)`` → result;
    ``write_fn(i, result)`` → value collected into the returned list
    (in order).
    """
    import concurrent.futures as cf
    import time as _time
    from collections import deque

    if n <= 0:
        return []
    with cf.ThreadPoolExecutor(
        max_workers=max(1, read_ahead), thread_name_prefix="cryovit-read"
    ) as rpool, cf.ThreadPoolExecutor(
        max_workers=max(1, writers), thread_name_prefix="cryovit-write"
    ) as wpool:
        pending = deque(
            rpool.submit(read_fn, i) for i in range(min(read_ahead, n))
        )
        write_futures = []
        for i in range(n):
            item = pending.popleft().result()
            if i + read_ahead < n:
                pending.append(rpool.submit(read_fn, i + read_ahead))
            result = compute_fn(i, item)
            write_futures.append(wpool.submit(write_fn, i, result))
            while sum(not f.done() for f in write_futures) > 2 * writers:
                _time.sleep(0.005)
        return [f.result() for f in write_futures]
