"""Experiment entry points (reference ``src/cryovit/training/``).

Run as ``python -m cryovit_tpu.training.<name> [overrides...]`` with
hydra-style overrides (``model=cryovit``, ``datamodule.sample=AD``,
``+experiments=single_hd_mito``). MULTIRUN sweeps defined in experiment
YAMLs expand automatically; ``--sweep-index N`` runs a single grid point
(the cluster fan-out mechanism, replacing the reference's hydra MULTIRUN ×
SLURM array jobs).
"""

from __future__ import annotations

import argparse
import logging
import sys
import traceback
from typing import Callable

from cryovit_tpu._logging_config import setup_logging
from cryovit_tpu.composer import ConfigError, expand_sweep_file
from cryovit_tpu.config import compose

logger = logging.getLogger(__name__)


def sweep_main(
    config_name: str,
    run_fn: Callable,
    validate_fn: Callable,
    argv: list[str] | None = None,
) -> int:
    """Shared driver for experiment mains (reference ``training/train_model.py:20-55``):
    compose → validate → run, with sweep expansion and blanket error logging."""
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("overrides", nargs="*", help="hydra-style key=value overrides")
    parser.add_argument("--sweep-index", type=int, default=None,
                        help="run only the Nth sweep grid point")
    parser.add_argument("--list-sweep", action="store_true",
                        help="print the sweep grid and exit")
    args = parser.parse_args(argv)
    setup_logging("INFO")

    overrides = list(args.overrides)
    experiment = next(
        (ov.split("=", 1)[1] for ov in overrides if ov.lstrip("+").startswith("experiments=")),
        None,
    )
    grids: list[list[str]] = [[]]
    if experiment is not None:
        grids = expand_sweep_file(experiment)
    if args.list_sweep:
        for i, g in enumerate(grids):
            print(i, g)
        return 0
    if args.sweep_index is not None:
        grids = [grids[args.sweep_index]]

    exit_code = 0
    for i, grid in enumerate(grids):
        try:
            cfg = compose(config_name, overrides + grid)
            validate_fn(cfg)
            if len(grids) > 1:
                logger.info("sweep %d/%d: %s", i + 1, len(grids), grid)
            run_fn(cfg)
        except ConfigError as e:
            logger.error("config error: %s", e)
            return 1
        except Exception:
            logger.error("run failed for %s:\n%s", grid, traceback.format_exc())
            exit_code = 1
    return exit_code


def run_module_main(config_name: str, run_fn: Callable, validate_fn: Callable) -> None:
    sys.exit(sweep_main(config_name, run_fn, validate_fn))
