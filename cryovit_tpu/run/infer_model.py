"""Inference runner (reference ``run/infer_model.py``)."""

from __future__ import annotations

import logging
from pathlib import Path

from cryovit_tpu.callbacks import PredictionWriter
from cryovit_tpu.config import compose
from cryovit_tpu.run.common import build_file_datamodule, build_trainer
from cryovit_tpu.train.checkpoint import load_model

logger = logging.getLogger(__name__)

__all__ = ["run_inference"]


def run_inference(
    data: list[Path],
    model_path: Path,
    result_dir: Path,
    threshold: float = 0.5,
    **overrides: object,
) -> list[Path]:
    """Segment tomograms with a ``.model`` artifact → thresholded uint8
    HDF5s (reference ``run/infer_model.py:18-85``)."""
    result_dir = Path(result_dir)
    model, variables, model_type, model_name, label_key = load_model(model_path)

    ov = [
        f"model={model_type.value}",
        f"label_key={label_key}",
        f"name={model_name}",
        f"paths.exp_dir={result_dir}",
    ] + [f"{k}={v}" for k, v in overrides.items()]
    cfg = compose("infer_model", ov)

    datamodule = build_file_datamodule(cfg, data_paths=data)
    writer = PredictionWriter(
        results_dir=result_dir, label_key=label_key, threshold=threshold
    )
    trainer = build_trainer(cfg, extra_callbacks=[writer])
    trainer.predict(model, variables, datamodule)
    logger.info("wrote %d segmentations under %s", len(writer.result_paths), result_dir)
    return writer.result_paths
