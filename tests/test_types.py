"""Tests for batch containers and padding helpers."""

import jax
import numpy as np

from cryovit_tpu.types import ModelType, Sample, TomogramBatch, pad_to, round_up


def test_sample_registry_complete():
    assert len(Sample) == 29
    assert Sample.BACHD.value == "BACHD"
    assert Sample.CZI_Fibroblast.value == "Mouse Fibroblast"


def test_model_registry():
    assert {m.value for m in ModelType} == {"cryovit", "unet3d", "sam2", "medsam"}


def test_round_up():
    assert round_up(5, 16) == 16
    assert round_up(16, 16) == 16
    assert round_up(17, 16) == 32


def test_pad_to_constant_and_edge(rng):
    arr = rng.standard_normal((3, 5)).astype(np.float32)
    out = pad_to(arr, (4, 8), value=-1.0)
    assert out.shape == (4, 8)
    assert (out[3, :] == -1.0).all() and (out[:, 5:] == -1.0).all()
    np.testing.assert_array_equal(out[:3, :5], arr)

    edge = pad_to(arr, (3, 8), mode="edge")
    np.testing.assert_array_equal(edge[:, 5:], np.repeat(arr[:, 4:5], 3, axis=1))


def test_tomogram_batch_is_pytree(rng):
    batch = TomogramBatch(
        data=rng.standard_normal((2, 4, 8, 8, 3)).astype(np.float32),
        label=rng.integers(-1, 2, size=(2, 4, 8, 8)).astype(np.int8),
        num_slices=np.array([4, 3], dtype=np.int32),
    )
    leaves = jax.tree_util.tree_leaves(batch)
    assert len(leaves) == 3
    moved = jax.device_put(batch)
    assert isinstance(moved, TomogramBatch)
    assert moved.num_tomos == 2
