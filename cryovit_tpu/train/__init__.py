"""Training engine: jit step functions, Trainer loop, SWA, checkpointing."""

from cryovit_tpu.train.checkpoint import (
    SavedModel,
    load_model,
    restore_checkpoint,
    save_checkpoint,
    save_model,
    save_model_from_weights,
)
from cryovit_tpu.train.loop import Trainer, TrainState, seed_everything
from cryovit_tpu.train.swa import StochasticWeightAveraging

__all__ = [
    "Trainer",
    "TrainState",
    "seed_everything",
    "StochasticWeightAveraging",
    "SavedModel",
    "save_model",
    "save_model_from_weights",
    "load_model",
    "save_checkpoint",
    "restore_checkpoint",
]
