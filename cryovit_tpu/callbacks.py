"""Callbacks: prediction writers, CSV metrics, progress, TensorBoard.

Parity target: reference ``models/callbacks.py`` (TestPredictionWriter
15-58, PredictionWriter 61-109, CsvWriter 112-206) and the Lightning
progress/logging callbacks. Output file layouts are byte-compatible with
the reference so downstream analysis (visualization, napari plugin) keeps
working.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import h5py
import numpy as np
import pandas as pd

from cryovit_tpu.types import BatchedModelResult

logger = logging.getLogger(__name__)

__all__ = [
    "ProgressBar",
    "TestPredictionWriter",
    "PredictionWriter",
    "CsvWriter",
    "TensorBoardLogger",
    "WandbLogger",
]


class ProgressBar:
    """Console progress reporting (stands in for RichProgressBar)."""

    def __init__(self, **_: object) -> None:
        self.enabled = True

    def on_train_epoch_end(self, epoch: int, logs: dict[str, float]) -> None:
        if not self.enabled:
            return
        parts = [f"{k}={v:.4f}" for k, v in sorted(logs.items()) if "time" not in k]
        logger.info("epoch %d | %s", epoch, " ".join(parts[:8]))


class TestPredictionWriter:
    """Writes per-tomogram eval predictions to
    ``results_dir/<sample>/<tomo_name>`` HDF5 with ``{data, <label_key>,
    <label_key>_preds}`` (reference ``callbacks.py:15-58``)."""

    def __init__(self, results_dir: str | Path, label_key: str, **_: object) -> None:
        self.results_dir = Path(results_dir)
        self.label_key = label_key

    def on_test_batch_end(self, outputs: BatchedModelResult) -> None:
        for n in range(outputs.batch_size):
            out = self.results_dir / outputs.samples[n] / outputs.tomo_names[n]
            out.parent.mkdir(parents=True, exist_ok=True)
            with h5py.File(out, "w") as f:
                f.create_dataset("data", data=outputs.data[n])
                f.create_dataset(
                    self.label_key, data=outputs.label[n], compression="gzip"
                )
                f.create_dataset(
                    f"{self.label_key}_preds",
                    data=outputs.preds[n],
                    compression="gzip",
                )


class PredictionWriter:
    """Writes thresholded uint8 segmentations during inference
    (reference ``callbacks.py:61-109``)."""

    def __init__(
        self,
        results_dir: str | Path,
        label_key: str,
        threshold: float = 0.5,
        **_: object,
    ) -> None:
        self.results_dir = Path(results_dir)
        self.label_key = label_key
        self.threshold = threshold
        self.result_paths: list[Path] = []

    def on_predict_batch_end(self, prediction: BatchedModelResult) -> None:
        for n in range(prediction.batch_size):
            path = (self.results_dir / prediction.tomo_names[n]).with_suffix(".hdf")
            path.parent.mkdir(parents=True, exist_ok=True)
            segs = (prediction.preds[n] >= self.threshold).astype(np.uint8)
            with h5py.File(path, "w") as f:
                f.create_dataset(
                    "data",
                    data=prediction.data[n].astype(np.float32),
                    compression="gzip",
                )
                f.create_dataset(
                    f"{self.label_key}_preds", data=segs, compression="gzip"
                )
            self.result_paths.append(path)


class CsvWriter:
    """Per-sample CSV of eval metrics with replace-on-rerun semantics
    (reference ``callbacks.py:112-206``). File:
    ``results_dir/<sample>[_<split_id>].csv`` with columns
    ``sample, tomo_name, <metrics...>[, split_id]``."""

    def __init__(self, results_dir: str | Path, **_: object) -> None:
        self.results_dir = Path(results_dir)
        self.results_dir.mkdir(parents=True, exist_ok=True)

    def on_test_batch_end(self, outputs: BatchedModelResult) -> None:
        assert outputs.batch_size == 1, "CsvWriter supports single-tomogram batches."
        sample = outputs.samples[0]
        tomo_name = outputs.tomo_names[0]
        split_id = outputs.split_id[0]

        path = self.results_dir / (
            f"{sample}.csv" if split_id is None else f"{sample}_{split_id}.csv"
        )
        columns = ["sample", "tomo_name"] + list(outputs.metrics)
        if split_id is not None:
            columns.append("split_id")
        df = pd.read_csv(path) if path.exists() else pd.DataFrame(columns=columns)

        match = (df["tomo_name"] == tomo_name) & (df["sample"] == sample)
        if split_id is not None and "split_id" in df.columns:
            match &= df["split_id"] == split_id
        if match.any():
            logger.warning(
                "Replacing %d existing row(s) for %s/%s split %s",
                int(match.sum()),
                sample,
                tomo_name,
                split_id,
            )
            df = df[~match]

        row: dict[str, Any] = {"sample": sample, "tomo_name": tomo_name}
        row.update({k: [v] for k, v in outputs.metrics.items()})
        if split_id is not None:
            row["split_id"] = [split_id]
        new_df = pd.DataFrame(row)
        df = new_df if df.empty else pd.concat([df, new_df], ignore_index=True)
        df.to_csv(path, index=False)


class TensorBoardLogger:
    """Scalar logging via torch's SummaryWriter (stands in for the W&B
    logger, which needs network access; gated import)."""

    def __init__(self, save_dir: str | Path, name: str = "run", **_: object) -> None:
        self.log_dir = Path(save_dir) / "tb" / name
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._writer = SummaryWriter(log_dir=str(self.log_dir))
        except Exception as e:  # pragma: no cover - env without tensorboard
            logger.warning("TensorBoard unavailable (%s); scalars not logged", e)

    def log_scalars(self, scalars: dict[str, float], step: int) -> None:
        if self._writer is None:
            return
        for key, val in scalars.items():
            self._writer.add_scalar(key, val, step)

    def log_hparams(self, hparams: dict[str, Any]) -> None:
        if self._writer is None:
            return
        self._writer.add_text("hparams", "\n".join(f"{k}: {v}" for k, v in hparams.items()))

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class WandbLogger:
    """Weights & Biases scalar/hparam logging (reference
    ``configs/logger/wandb.yaml`` + hparam logging at
    ``run/train_model.py:251-287``). The import is guarded: in air-gapped
    deployments wandb is absent and the logger degrades to a no-op with a
    warning, keeping TensorBoard as the default observability path."""

    def __init__(
        self,
        save_dir: str | Path,
        entity: str | None = None,
        project: str = "CryoVIT",
        group: str | None = None,
        log_model: bool = False,
        config: dict[str, Any] | None = None,
        **_: object,
    ) -> None:
        self._run = None
        try:
            import wandb
        except ImportError:
            logger.warning(
                "wandb is not installed; WandbLogger is a no-op "
                "(use logger=tensorboard or pip install wandb)"
            )
            return
        try:
            self._run = wandb.init(
                dir=str(save_dir),
                entity=entity,
                project=project,
                group=group,
                config=config or {},
            )
        except Exception as e:  # pragma: no cover - network/auth failures
            logger.warning("wandb.init failed (%s); scalars not logged", e)

    def log_scalars(self, scalars: dict[str, float], step: int) -> None:
        if self._run is not None:
            self._run.log(scalars, step=step)

    def log_hparams(self, hparams: dict[str, Any]) -> None:
        if self._run is not None:
            self._run.config.update(
                {k: v for k, v in hparams.items() if isinstance(v, (int, float, str, bool, type(None)))},
                allow_val_change=True,
            )

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()
