"""Evaluation runners (reference ``run/eval_model.py``)."""

from __future__ import annotations

import logging
from pathlib import Path

from cryovit_tpu.composer import DotDict
from cryovit_tpu.config import compose, validate_experiment_config
from cryovit_tpu.run.common import (
    build_datamodule,
    build_file_datamodule,
    build_model,
    build_trainer,
)
from cryovit_tpu.train.checkpoint import load_model, load_weights

logger = logging.getLogger(__name__)

__all__ = ["run_evaluation", "run_trainer"]


def run_evaluation(
    test_data: list[Path],
    test_labels: list[Path],
    labels: list[str],
    model_path: Path,
    result_dir: Path,
    visualize: bool = False,
    **overrides: object,
) -> Path:
    """Evaluate a ``.model`` artifact on explicit files → metrics CSV
    (reference ``run/eval_model.py:21-97``)."""
    result_dir = Path(result_dir)
    model, variables, model_type, model_name, label_key = load_model(model_path)

    ov = [
        f"model={model_type.value}",
        "datamodule=file",
        f"label_key={label_key}",
        f"name={model_name}",
        f"paths.exp_dir={result_dir}",
        f"paths.results_dir={result_dir}",
    ] + [f"{k}={v}" for k, v in overrides.items()]
    cfg = compose("eval_model", ov)
    if not visualize:
        # drop the prediction writer to speed up evaluation
        cfg.callbacks.pop("test_pred_writer", None)

    datamodule = build_file_datamodule(
        cfg, data_paths=test_data, data_labels=test_labels, labels=labels
    )
    trainer = build_trainer(cfg)
    trainer.test(model, variables, datamodule)

    csv_dir = result_dir / "results" / model_name
    logger.info("evaluation metrics written under %s", csv_dir)
    return csv_dir


def run_trainer(cfg: DotDict):
    """Experiment-mode evaluation (reference ``run/eval_model.py:103-197``):
    load ``weights.msgpack`` from the experiment dir and run ``test``."""
    from cryovit_tpu.run.common import setup_exp_dir

    validate_experiment_config(cfg)
    exp_dir = setup_exp_dir(cfg)
    weights_path = exp_dir / "weights.msgpack"
    if not weights_path.exists():
        raise FileNotFoundError(
            f"no trained weights at {weights_path}; run train_model first"
        )
    datamodule = build_datamodule(cfg)
    model = build_model(cfg, cfg.trainer.get("precision"))
    variables = load_weights(weights_path)
    trainer = build_trainer(cfg)
    results = trainer.test(model, variables, datamodule)
    return results
