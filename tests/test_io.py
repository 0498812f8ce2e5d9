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


def test_read_dataset_parallel_gzip_roundtrip(tmp_path):
    """The parallel chunk decoder reproduces h5py's own read exactly —
    gzip, gzip+shuffle, partial edge chunks, and small/uncompressed
    fallbacks."""
    import h5py

    from cryovit_tpu.io.hdf import read_dataset

    rng = np.random.default_rng(3)
    big = rng.integers(0, 255, size=(37, 300, 290)).astype(np.uint8)
    f16 = rng.standard_normal((64, 64)).astype(np.float16)
    path = tmp_path / "chunks.hdf"
    with h5py.File(path, "w") as f:
        f.create_dataset("gz", data=big, compression="gzip", chunks=(8, 128, 128))
        f.create_dataset(
            "gzsh", data=big.astype(np.int16), compression="gzip",
            shuffle=True, chunks=(16, 64, 64),
        )
        f.create_dataset("plain", data=f16)
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(read_dataset(f["gz"]), big)
        np.testing.assert_array_equal(read_dataset(f["gzsh"]), big.astype(np.int16))
        np.testing.assert_array_equal(read_dataset(f["plain"]), f16)


def test_parallel_gzip_decode_beats_serial(tmp_path):
    """Decode throughput: the chunk-parallel reader must beat h5py's
    locked inline decompression on a multi-chunk gzip volume (this is the
    parallelism the reference gets from 8 DataLoader worker processes,
    reference configs/datamodule/dataloader/default.yaml:2-7)."""
    import os
    import time

    import h5py

    from cryovit_tpu.io.hdf import read_dataset

    if (os.cpu_count() or 1) < 4:
        pytest.skip("needs ≥4 CPUs for a meaningful parallelism check")

    rng = np.random.default_rng(4)
    # incompressible-ish payload → decode cost is real inflate work
    vol = rng.integers(0, 255, size=(64, 512, 512)).astype(np.uint8)
    path = tmp_path / "big.hdf"
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=vol, compression="gzip", chunks=(4, 512, 512))

    with h5py.File(path, "r") as f:
        ds = f["data"]
        for _ in range(2):  # warm page cache + pool
            read_dataset(ds)
        t0 = time.perf_counter()
        for _ in range(3):
            out = read_dataset(ds)
        par = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        for _ in range(3):
            ref = ds[()]
        ser = (time.perf_counter() - t0) / 3
    np.testing.assert_array_equal(out, vol)
    assert ser / par > 1.5, f"parallel decode only {ser / par:.2f}x faster"


def test_dataloader_workers_overlap(tmp_path):
    """Loader-level overlap: 4 decode workers must beat 1 on a
    GIL-releasing per-item decode (zlib), proving items genuinely decode
    concurrently rather than through a single producer thread."""
    import os
    import time
    import zlib

    from cryovit_tpu.data.pipeline import DataLoader

    if (os.cpu_count() or 1) < 4:
        pytest.skip("needs ≥4 CPUs for a meaningful parallelism check")

    rng = np.random.default_rng(5)
    blob = zlib.compress(rng.integers(0, 255, size=24 << 20).astype(np.uint8).tobytes(), 6)

    class _Decode:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return len(zlib.decompress(blob))

    def timed(workers):
        loader = DataLoader(
            _Decode(), batch_size=1, num_workers=workers,
            collate_fn=lambda items: items,
        )
        list(iter(loader))  # warm
        t0 = time.perf_counter()
        out = list(iter(loader))
        assert len(out) == 12
        return time.perf_counter() - t0

    serial = timed(1)
    parallel = timed(4)
    assert serial / parallel > 1.6, (
        f"num_workers=4 only {serial / parallel:.2f}x faster than 1"
    )
