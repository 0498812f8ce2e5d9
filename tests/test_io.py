"""Unit tests for the pure-numpy MRC/TIFF parsers and HDF5 utilities."""

import numpy as np
import pytest

from cryovit_tpu.io import (
    load_data,
    load_files_from_path,
    load_labels,
    match_label_keys_to_data,
    read_hdf,
    read_mrc,
    read_tiff,
    write_hdf,
    write_mrc,
    write_tiff,
)
from cryovit_tpu.io.hdf import FileMetadata


@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.float32, np.uint16, np.float16])
def test_mrc_roundtrip(tmp_path, rng, dtype):
    if np.dtype(dtype).kind == "f":
        arr = rng.standard_normal((4, 6, 8)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, size=(4, 6, 8)).astype(dtype)
    path = tmp_path / "vol.mrc"
    write_mrc(path, arr)
    out = read_mrc(path)
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
def test_tiff_roundtrip_multipage(tmp_path, rng, dtype):
    if np.dtype(dtype).kind == "f":
        arr = rng.standard_normal((3, 5, 7)).astype(dtype)
    else:
        arr = rng.integers(0, 200, size=(3, 5, 7)).astype(dtype)
    path = tmp_path / "stack.tif"
    write_tiff(path, arr)
    out = read_tiff(path)
    np.testing.assert_array_equal(out, arr)


def test_tiff_single_page(tmp_path, rng):
    arr = rng.integers(0, 255, size=(9, 11), dtype=np.uint8)
    path = tmp_path / "img.tiff"
    write_tiff(path, arr)
    out = read_tiff(path)
    assert out.ndim == 2
    np.testing.assert_array_equal(out, arr)


def test_read_hdf_auto_key_picks_most_unique(tmp_hdf, rng):
    # label has 2 unique values, data has many → auto-detect picks "raw/data"
    path = tmp_hdf(
        "t.hdf",
        {
            "labels/mito": rng.integers(0, 2, size=(4, 8, 8)).astype(np.int8),
            "raw/data": rng.standard_normal((4, 8, 8)).astype(np.float32),
        },
    )
    key, data, meta = read_hdf(path)
    assert key == "raw/data"
    assert meta.dshape == (4, 8, 8)


def test_read_hdf_missing_key_falls_back(tmp_hdf, rng):
    path = tmp_hdf("t.hdf", {"data": rng.standard_normal((2, 4, 4)).astype(np.float32)})
    key, data, _ = read_hdf(path, key="nope")
    assert key == "data"


def test_load_data_uint8_normalized(tmp_hdf):
    arr = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    path = tmp_hdf("t.hdf", {"data": arr})
    data, key = load_data(path, key="data")
    assert key == "data"
    assert data.dtype == np.float32
    assert data.shape == (1, 2, 4, 4)  # channel dim added
    np.testing.assert_allclose(data[0], arr / 255.0)


def test_load_data_mrc(tmp_path, rng):
    arr = rng.standard_normal((3, 4, 4)).astype(np.float32)
    write_mrc(tmp_path / "v.mrc", arr)
    data, _ = load_data(tmp_path / "v.mrc")
    np.testing.assert_allclose(data[0], arr)


def test_match_label_keys_implicit_background():
    # values {0,1,2}, two keys → 0 is background
    data = np.array([[0, 1], [2, 0]], dtype=np.int8)
    meta = FileMetadata((0, 2), data.shape, data.dtype, nunique=3)
    labels = match_label_keys_to_data(data, ["mito", "cristae"], meta)
    np.testing.assert_array_equal(labels["mito"], [[0, 1], [0, 0]])
    np.testing.assert_array_equal(labels["cristae"], [[0, 0], [1, 0]])


def test_match_label_keys_preserves_ignore():
    data = np.array([[-1, 1], [2, 0]], dtype=np.int8)
    meta = FileMetadata((-1, 2), data.shape, data.dtype, nunique=4)
    # nunique adjusted for −1 = 3 = len(keys)+1 with 0 present → implicit bg
    labels = match_label_keys_to_data(data, ["mito", "cristae"], meta)
    np.testing.assert_array_equal(labels["mito"], [[-1, 1], [0, 0]])
    np.testing.assert_array_equal(labels["cristae"], [[-1, 0], [1, 0]])


def test_load_labels_single_key(tmp_hdf):
    lab = np.array([[[0, 1], [1, -1]]], dtype=np.int8)
    path = tmp_hdf("lab.hdf", {"mito": lab})
    labels = load_labels(path, ["mito"], key="mito")
    np.testing.assert_array_equal(labels["mito"], lab)


def test_load_files_from_path_dir_and_manifest(tmp_path, rng):
    d = tmp_path / "tomos"
    d.mkdir()
    write_mrc(d / "a.mrc", rng.standard_normal((2, 4, 4)).astype(np.float32))
    write_mrc(d / "b.mrc", rng.standard_normal((2, 4, 4)).astype(np.float32))
    (d / "ignore.txt").write_text("x")
    files = load_files_from_path(d)
    assert [f.name for f in files] == ["a.mrc", "b.mrc"]

    manifest = tmp_path / "list.txt"
    manifest.write_text(f"{d / 'a.mrc'}\n\n{d / 'b.mrc'}\n")
    files = load_files_from_path(manifest)
    assert len(files) == 2


def test_write_hdf_layout(tmp_path, rng):
    import h5py

    feats = rng.standard_normal((8, 2, 2, 2)).astype(np.float16)
    data = rng.integers(0, 255, size=(2, 8, 8), dtype=np.uint8)
    path = tmp_path / "out.hdf"
    write_hdf(path, {"data": data, "labels/mito": data.astype(np.int8), "dino_features": feats})
    with h5py.File(path, "r") as f:
        assert f["data"].compression == "gzip"
        assert f["labels/mito"].compression == "gzip"
        assert f["dino_features"].compression is None  # fp16 uncompressed
        np.testing.assert_array_equal(f["dino_features"][()], feats)
