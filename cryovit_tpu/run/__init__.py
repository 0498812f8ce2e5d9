"""Runner entry points (reference ``src/cryovit/run/__init__.py:1-8``).

File-path API for end users (``run_training``, ``run_evaluation``,
``run_inference``, ``run_dino``) and Hydra-config API (``run_trainer``
variants) for experiments.
"""

from cryovit_tpu.run.eval_model import run_evaluation
from cryovit_tpu.run.infer_model import run_inference
from cryovit_tpu.run.train_model import run_training

__all__ = ["run_training", "run_evaluation", "run_inference"]
