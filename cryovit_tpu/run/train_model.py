"""Training runners (reference ``run/train_model.py``).

- :func:`run_training` — file-path API used by the CLI: train on explicit
  tomogram/label files, export a distributable ``.model`` artifact.
- :func:`run_trainer` — config API used by experiments: splits CSV
  datamodule, experiment dirs, weights export, optional resume.
"""

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
    setup_exp_dir,
)
from cryovit_tpu.train.checkpoint import load_model, load_weights, save_model, save_weights
from cryovit_tpu.types import ModelType

logger = logging.getLogger(__name__)

__all__ = ["run_training", "run_trainer"]


def run_training(
    train_data: list[Path],
    train_labels: list[Path],
    labels: list[str],
    label_key: str,
    model_name: str,
    result_dir: Path,
    val_data: list[Path] | None = None,
    val_labels: list[Path] | None = None,
    model_type: str = "cryovit",
    num_epochs: int = 50,
    ckpt_path: Path | None = None,
    log_training: bool = False,
    export_torch: bool = False,
    **overrides: object,
) -> Path:
    """Train a model on explicit file paths and export ``<name>.model``
    (reference ``run/train_model.py:24-153``). With ``export_torch`` an
    additional ``<name>.torch.model`` is written that the REFERENCE stack
    opens directly (torch state_dict weights + hydra-instantiable cfg,
    ``train/torch_export.py``)."""
    result_dir = Path(result_dir)
    result_dir.mkdir(parents=True, exist_ok=True)

    ov = [
        f"model={model_type}",
        "datamodule=file",
        f"label_key={label_key}",
        f"trainer.max_epochs={num_epochs}",
        f"name={model_name}",
        f"paths.exp_dir={result_dir}",
    ] + [f"{k}={v}" for k, v in overrides.items()]
    cfg = compose("train_model", ov)
    if not log_training:
        cfg["logger"] = DotDict()

    datamodule = build_file_datamodule(
        cfg,
        data_paths=train_data,
        data_labels=train_labels,
        val_paths=val_data,
        val_labels=val_labels,
        labels=labels,
    )

    variables = None
    if ckpt_path is not None:
        suffix = Path(ckpt_path).suffix
        if suffix == ".model":
            model, variables, *_ = load_model(ckpt_path)
            logger.info("fine-tuning from %s", ckpt_path)
        else:
            variables = load_weights(ckpt_path)
            model = build_model(cfg, cfg.trainer.get("precision"))
    else:
        model = build_model(cfg, cfg.trainer.get("precision"))

    trainer = build_trainer(cfg)
    state = trainer.fit(
        model,
        datamodule,
        variables=variables,
        pretrained_variables=(
            _sam_pretrained(model, cfg) if variables is None else None
        ),
    )

    out_path = result_dir / f"{model_name}.model"
    save_model(model_name, label_key, model, state.params, cfg.model, out_path)
    logger.info("saved model artifact to %s", out_path)
    if export_torch:
        from cryovit_tpu.train.torch_export import save_torch_model

        torch_path = result_dir / f"{model_name}.torch.model"
        save_torch_model(model_name, label_key, model, state.params, torch_path)
        logger.info("saved reference-readable torch artifact to %s", torch_path)
    return out_path


def _sam_pretrained(model, cfg):
    """Pretrained SAM2/MedSAM weights for the reference's
    ``create_sam_model_from_weights`` path (``run/train_model.py:242-248``):
    looked up under ``model_dir/<sam_name>``; None for other families or
    when no checkpoint is present."""
    if not hasattr(model, "load_pretrained_variables"):
        return None
    sam_dir = Path(str(cfg.paths.model_dir)) / str(
        cfg.paths.get("sam_name", "SAM2")
    )
    return model.load_pretrained_variables(sam_dir)


def run_trainer(cfg: DotDict):
    """Experiment-mode training (reference ``run/train_model.py:206-312``):
    seed, experiment dir, splits datamodule, fit, save ``weights.msgpack``."""
    validate_experiment_config(cfg)
    exp_dir = setup_exp_dir(cfg)
    datamodule = build_datamodule(cfg)
    model = build_model(cfg, cfg.trainer.get("precision"))

    trainer = build_trainer(cfg)
    trainer.default_root_dir = exp_dir
    if cfg.get("resume_ckpt"):
        trainer.enable_checkpointing = True

    # hparam logging (reference run/train_model.py:251-287)
    if trainer.loggers:
        dm = cfg.get("datamodule", {})
        sample = dm.get("sample")
        hparams = {
            "datamodule_type": str(dm.get("_target_", "")),
            "model_name": cfg.model.name,
            "label_key": cfg.label_key,
            "experiment": cfg.name,
            "split_id": dm.get("split_id"),
            "sample": (
                "_".join(sorted(map(str, sample)))
                if isinstance(sample, (list, tuple))
                else sample
            ),
            "test_sample": dm.get("test_sample"),
            "resume_ckpt": cfg.get("resume_ckpt"),
            "ckpt_path": cfg.get("ckpt_path"),
            "seed": cfg.get("random_seed", 42),
            "lr": cfg.model.get("lr"),
            "weight_decay": cfg.model.get("weight_decay"),
        }
        if "sam2" in str(cfg.model.get("_target_", "")).lower():
            custom = cfg.model.get("custom_kwargs") or {}
            hparams["prompt_lr"] = custom.get("prompt_lr")
        for lg in trainer.loggers:
            if hasattr(lg, "log_hparams"):
                lg.log_hparams(hparams)

    ckpt = exp_dir / "last.ckpt"
    state = trainer.fit(
        model,
        datamodule,
        ckpt_path=ckpt if cfg.get("resume_ckpt") and ckpt.exists() else None,
        pretrained_variables=_sam_pretrained(model, cfg),
    )

    save_weights(exp_dir / "weights.msgpack", state.params)
    logger.info("saved weights to %s", exp_dir / "weights.msgpack")
    return exp_dir
