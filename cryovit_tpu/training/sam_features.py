"""SAM2 feature-extraction entry point (reference ``training/sam_features.py``)."""

from cryovit_tpu.config import validate_dino_config
from cryovit_tpu.training import run_module_main


def _run(cfg):
    from cryovit_tpu.run.sam_features import run_trainer

    run_trainer(cfg)


if __name__ == "__main__":
    run_module_main("sam_features", _run, validate_dino_config)
