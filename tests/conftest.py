"""Test configuration: run everything on CPU with 8 virtual devices.

This is the TPU-native answer to "test multi-chip without a cluster": the
same mesh/sharding code paths compile and execute on 8 host-platform devices
(SURVEY.md §4). Must run before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment pre-sets jax_platforms to prefer the tunneled TPU; the env
# var alone is not enough — force the config before any backend initializes,
# otherwise every eager op round-trips through the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the model-compile times that dominate this
# suite on a 1-CPU host (VERDICT r4 weak #8) are paid once per program,
# not once per run. Shared with bench.py / __graft_entry__.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def tmp_hdf(tmp_path):
    """Factory: write a dict of arrays into an HDF5 file and return the path."""
    import h5py

    def _make(name: str, datasets: dict):
        path = tmp_path / name
        with h5py.File(path, "w") as f:
            for k, v in datasets.items():
                f.create_dataset(k, data=v)
        return path

    return _make


def make_synthetic_tomogram(
    rng: np.random.Generator,
    depth: int = 8,
    side: int = 32,
    feature_dim: int = 1536,
    feat_side: int = 2,
):
    """A tiny synthetic annotated tomogram in the reference HDF5 layout:
    uint8 ``data`` (D,H,W), int8 ``labels/mito`` with −1 sparsity, and fp16
    ``dino_features`` (C, D, h, w)."""
    data = rng.integers(0, 255, size=(depth, side, side), dtype=np.uint8)
    label = rng.integers(0, 2, size=(depth, side, side)).astype(np.int8)
    label[: depth // 4] = -1  # unlabeled slab
    feats = rng.standard_normal((feature_dim, depth, feat_side, feat_side)).astype(
        np.float16
    )
    return {"data": data, "labels/mito": label, "dino_features": feats}
