"""Analysis and figure generation (reference ``visualization/__init__.py:1-27``)."""

from cryovit_tpu.visualization.dino_pca import export_pca, process_samples
from cryovit_tpu.visualization.experiments import (
    process_fractional_experiment,
    process_multi_experiment,
    process_multi_label_experiment,
    process_multi_label_sample_experiment,
    process_single_experiment,
    process_sparse_experiment,
)
from cryovit_tpu.visualization.segmentations import process_experiment
from cryovit_tpu.visualization.utils import (
    compute_stats,
    merge_experiments,
    significance_test,
)

__all__ = [
    "export_pca",
    "process_samples",
    "process_single_experiment",
    "process_multi_experiment",
    "process_multi_label_experiment",
    "process_multi_label_sample_experiment",
    "process_fractional_experiment",
    "process_sparse_experiment",
    "process_experiment",
    "merge_experiments",
    "significance_test",
    "compute_stats",
]
