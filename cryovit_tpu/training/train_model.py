"""Train-experiment entry point (reference ``training/train_model.py``)."""

from cryovit_tpu.config import validate_experiment_config
from cryovit_tpu.run.train_model import run_trainer
from cryovit_tpu.training import run_module_main

if __name__ == "__main__":
    run_module_main("train_model", run_trainer, validate_experiment_config)
