"""DINO feature-extraction entry point (reference ``training/dino_features.py``)."""

from cryovit_tpu.config import validate_dino_config
from cryovit_tpu.run.dino_features import run_trainer
from cryovit_tpu.training import run_module_main

if __name__ == "__main__":
    run_module_main("dino_features", run_trainer, validate_dino_config)
