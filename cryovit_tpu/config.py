"""Structured config schemas, constants, and validators.

Parity target: reference ``config.py`` (dataclasses at lines 21-189,
ConfigStore registration 192-200, validators 205-284). The trainer schema is
redesigned for the JAX engine (no Lightning accelerator/strategy knobs; a
device mesh spec instead), everything else keeps the same keys so configs
and overrides carry over.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

from cryovit_tpu.composer import (
    MISSING,
    ConfigError,
    DotDict,
    compose,
    expand_sweep,
    instantiate,
    missing_keys,
    register_schema,
)
from cryovit_tpu.types import Sample

__all__ = [
    "DINO_PATCH_SIZE",
    "SAM_IMAGE_SIZE",
    "tomogram_exts",
    "samples",
    "BaseModelConfig",
    "TrainerConfig",
    "DataModuleConfig",
    "ExperimentPaths",
    "DinoFeaturesConfig",
    "ExperimentConfig",
    "validate_experiment_config",
    "validate_dino_config",
    "compose",
    "instantiate",
    "expand_sweep",
    "ConfigError",
    "MISSING",
    "DotDict",
]

logger = logging.getLogger(__name__)

samples: list[str] = [s.name for s in Sample]
tomogram_exts: list[str] = [".hdf", ".mrc"]

DINO_PATCH_SIZE = 14
SAM_IMAGE_SIZE = 512


@dataclasses.dataclass
class BaseModelConfig:
    """Model group schema (reference ``config.py:21-46``)."""

    _target_: str = MISSING
    name: str = MISSING
    input_key: str = MISSING
    model_dir: str | None = None
    lr: float = MISSING
    weight_decay: float = 1e-3
    losses: Any = MISSING
    metrics: Any = MISSING
    custom_kwargs: dict | None = None


@dataclasses.dataclass
class TrainerConfig:
    """Trainer schema, redesigned for the JAX engine.

    The reference pins Lightning to one GPU with 16-mixed precision
    (``config.py:49-77``). Here precision is a compute-dtype policy and
    scale-out is a mesh spec: ``mesh_shape`` names → sizes, −1 = fill with
    available devices.
    """

    precision: str = "bf16"  # compute dtype policy: bf16 | f32
    max_epochs: int | None = None
    log_every_n_steps: int = 1
    enable_checkpointing: bool = False
    enable_model_summary: bool = True
    default_root_dir: str | None = None
    gradient_clip_val: float | None = None
    gradient_clip_algorithm: str = "norm"
    mesh_shape: dict | None = None  # e.g. {"data": -1} or {"data": 4, "model": 2}
    donate_state: bool = True


@dataclasses.dataclass
class DataModuleConfig:
    """Datamodule group schema (reference ``config.py:80-103``)."""

    _target_: str = MISSING
    sample: Any = MISSING  # str or list[str]
    split_id: int | None = None
    split_key: str = "split_id"
    test_sample: Any = None


@dataclasses.dataclass
class ExperimentPaths:
    """Directory layout conventions (reference ``config.py:106-132``)."""

    model_dir: str = MISSING
    data_dir: str = MISSING
    exp_dir: str = MISSING
    results_dir: str = MISSING
    tomo_name: str = "tomograms"
    feature_name: str = "dino_features"
    dino_name: str = "DINOv2"
    sam_name: str = "SAM2"
    csv_name: str = "csv"
    split_name: str = "splits.csv"


@dataclasses.dataclass
class DinoFeaturesConfig:
    """Feature-extraction schema (reference ``config.py:135-156``)."""

    batch_size: int = 128
    model_dir: str = MISSING
    sample: Any = None
    export_features: bool = False


@dataclasses.dataclass
class ExperimentConfig:
    """Root experiment schema (reference ``config.py:159-189``)."""

    name: str = MISSING
    label_key: str = MISSING
    additional_keys: Any = dataclasses.field(default_factory=list)
    random_seed: int = 42
    ckpt_path: str | None = None
    resume_ckpt: bool = False


register_schema("base_model", BaseModelConfig)
register_schema("base_trainer", TrainerConfig)
register_schema("base_datamodule", DataModuleConfig)
register_schema("base_env", ExperimentPaths)
register_schema("dino_features_config", DinoFeaturesConfig)
register_schema("base_experiment_config", ExperimentConfig)


def _check_missing(cfg: DotDict, error_msg: str) -> None:
    missing = missing_keys(cfg)
    if missing:
        for key in missing:
            logger.error("%s: %s", error_msg, key)
        raise ConfigError(f"{error_msg}: {missing}")


def _validate_samples(value: Any) -> None:
    names = value if isinstance(value, list) else [value]
    for name in names:
        if name is None:
            continue
        if isinstance(name, str) and name not in Sample.__members__:
            raise ConfigError(
                f"invalid sample {name!r}; valid samples: {samples}"
            )


def validate_experiment_config(cfg: DotDict) -> DotDict:
    """Validate a train/eval experiment config (reference ``config.py:234-284``).

    Raises ConfigError on missing keys or unknown sample names (the reference
    logs and ``sys.exit(1)``; entry points catch ConfigError and exit 1).
    """
    _check_missing(cfg, "missing config key")
    dm = cfg.get("datamodule", {})
    if "sample" in dm:
        _validate_samples(dm.get("sample"))
    if dm.get("test_sample") is not None and not isinstance(dm.get("test_sample"), int):
        _validate_samples(dm.get("test_sample"))
    return cfg


def validate_dino_config(cfg: DotDict) -> DotDict:
    """Validate a dino/sam feature-extraction config (reference ``config.py:205-231``)."""
    _check_missing(cfg, "missing config key")
    if cfg.get("sample") is not None:
        _validate_samples(cfg.get("sample"))
    return cfg
