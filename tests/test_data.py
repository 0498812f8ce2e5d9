"""Tests for datasets, split-policy datamodules, collation, and the loader."""

import numpy as np
import pandas as pd
import pytest

from cryovit_tpu.data import (
    BucketSpec,
    DataLoader,
    FileDataModule,
    FileDataset,
    FractionalDataModule,
    FractionalSampleDataModule,
    MultiSampleDataModule,
    SingleSampleDataModule,
    TomoDataset,
    VITDataset,
    collate,
    random_crop,
)
from cryovit_tpu.io import write_hdf, write_mrc
from cryovit_tpu.types import FileData

from conftest import make_synthetic_tomogram


@pytest.fixture
def tomo_root(tmp_path, rng):
    """data_root/<sample>/<tomo>.hdf tree + splits.csv (reference layout)."""
    root = tmp_path / "tomograms"
    rows = []
    for sample in ("AD", "Young"):
        for i in range(6):
            name = f"tomo_{i}.hdf"
            d = make_synthetic_tomogram(rng, depth=6, side=32)
            write_hdf(root / sample / name, d)
            rows.append({"sample": sample, "tomo_name": name, "split_id": i % 3})
    csv = tmp_path / "splits.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return root, csv


def _dataset_fn(root, input_key="dino_features", label_key="mito"):
    def fn(records, train=False):
        return TomoDataset(
            records,
            input_key=input_key,
            label_key=label_key,
            data_root=root,
            train=train,
            seed=0,
        )

    return fn


def _loader_fn(dataset, shuffle=False, collate_fn=None):
    return DataLoader(
        dataset, batch_size=1, shuffle=shuffle, num_workers=2, collate_fn=collate_fn
    )


def test_tomo_dataset_layout(tomo_root):
    root, csv = tomo_root
    records = pd.read_csv(csv)
    ds = _dataset_fn(root)(records[records["sample"] == "AD"])
    item = ds[0]
    assert item.data.shape == (6, 2, 2, 1536)  # channels-last features
    assert item.data.dtype == np.float32
    assert item.label.shape == (6, 32, 32)
    assert item.sample == "AD"


def test_tomo_dataset_voxel_input(tomo_root):
    root, csv = tomo_root
    records = pd.read_csv(csv)
    ds = _dataset_fn(root, input_key="data")(records[records["sample"] == "AD"])
    item = ds[0]
    assert item.data.shape == (6, 32, 32, 1)
    assert 0.0 <= item.data.min() and item.data.max() <= 1.0  # uint8/255


def test_tomo_dataset_missing_key_raises(tomo_root):
    root, csv = tomo_root
    records = pd.read_csv(csv)
    ds = _dataset_fn(root, input_key="nope")(records)
    with pytest.raises(KeyError, match="nope"):
        ds[0]


def test_random_crop_feature_space(rng):
    data = rng.standard_normal((140, 40, 40, 8)).astype(np.float32)
    label = rng.integers(0, 2, size=(140, 640, 640)).astype(np.int8)
    out_d, out_l = random_crop(data, label, feature_space=True, rng=rng)
    assert out_d.shape == (128, 32, 32, 8)
    assert out_l.shape == (128, 512, 512)


def test_random_crop_max_depth_override(rng):
    """max_crop_depth knob: 16 GB single-chip training uses 64 instead of
    the reference's 128 (BASELINE.md crop envelope)."""
    data = rng.standard_normal((140, 40, 40, 8)).astype(np.float32)
    label = rng.integers(0, 2, size=(140, 640, 640)).astype(np.int8)
    out_d, out_l = random_crop(
        data, label, feature_space=True, rng=rng, max_depth=64
    )
    assert out_d.shape == (64, 32, 32, 8)
    assert out_l.shape == (64, 512, 512)


def test_random_crop_voxel_space_small_volume(rng):
    data = rng.standard_normal((10, 64, 64, 1)).astype(np.float32)
    label = rng.integers(0, 2, size=(10, 64, 64)).astype(np.int8)
    out_d, out_l = random_crop(data, label, feature_space=False, rng=rng)
    # smaller than crop side → unchanged
    assert out_d.shape == (10, 64, 64, 1)
    assert out_l.shape == (10, 64, 64)


def test_collate_pads_labels_with_ignore(rng):
    from cryovit_tpu.types import TomogramData

    items = [
        TomogramData("s", f"t{i}", None,
                     rng.standard_normal((d, 2, 2, 4)).astype(np.float32),
                     rng.integers(0, 2, size=(d, 32, 32)).astype(np.int8))
        for i, d in enumerate((5, 9))
    ]
    batch, originals = collate(items, BucketSpec(depth=8, space=4, label_space=32))
    assert batch.data.shape == (2, 16, 4, 4, 4)
    assert batch.label.shape == (2, 16, 32, 32)
    # label padding must be −1 (ignore), data padding 0
    assert (batch.label[0, 5:] == -1).all()
    assert (batch.data[0, 5:] == 0).all()
    assert batch.num_slices.tolist() == [5, 9]
    assert len(originals) == 2


def test_single_sample_datamodule_splits(tomo_root):
    root, csv = tomo_root
    dm = SingleSampleDataModule(
        sample=["AD"],
        split_id=0,
        split_key="split_id",
        test_sample=["Young"],
        split_file=csv,
        dataset_fn=_dataset_fn(root),
        dataloader_fn=_loader_fn,
        input_key="dino_features",
    )
    train, val, test = dm.train_df(), dm.val_df(), dm.test_df()
    assert set(train["sample"]) == {"AD"} and len(train) == 4
    assert (val["split_id"] == 0).all() and len(val) == 2
    assert set(test["sample"]) == {"Young"} and len(test) == 6
    # loaders yield device batches
    batch, items = next(iter(dm.train_loader()))
    assert batch.data.ndim == 5
    assert items[0].sample == "AD"


def test_multi_sample_datamodule(tomo_root):
    root, csv = tomo_root
    dm = MultiSampleDataModule(
        sample=["AD", "Young"],
        split_id=1,
        split_key="split_id",
        split_file=csv,
        dataset_fn=_dataset_fn(root),
        dataloader_fn=_loader_fn,
    )
    assert len(dm.train_df()) == 8
    assert len(dm.val_df()) == 4
    # test falls back to val when no test_sample
    pd.testing.assert_frame_equal(dm.test_df(), dm.val_df())


def test_fractional_datamodule_kfold_reproducible(tomo_root):
    root, csv = tomo_root
    dm = FractionalDataModule(
        sample=["AD", "Young"],
        split_id=5,
        split_key="split_id",
        test_sample=0,
        split_file=csv,
        dataset_fn=_dataset_fn(root),
        dataloader_fn=_loader_fn,
    )
    # 12 rows over 11 folds: each fold has 1-2 rows; fold 0 held out
    train = dm.train_df()
    val = dm.val_df()
    assert len(train) + len(val) <= 12
    assert not set(train.index) & set(val.index)
    # reproducibility: same folds on second construction
    dm2 = FractionalDataModule(
        sample=["AD", "Young"], split_id=5, split_key="split_id", test_sample=0,
        split_file=csv, dataset_fn=_dataset_fn(root), dataloader_fn=_loader_fn,
    )
    pd.testing.assert_frame_equal(dm.record_df, dm2.record_df)
    # fraction index is reported as split_id in test records
    assert (dm.test_df()["split_id"] == 5).all()


def test_fractional_sample_datamodule(tomo_root):
    root, csv = tomo_root
    dm = FractionalSampleDataModule(
        sample=["AD", "Young"],
        split_id=2,
        split_key="split_id",
        test_sample=["Young"],
        split_file=csv,
        dataset_fn=_dataset_fn(root),
        dataloader_fn=_loader_fn,
    )
    train = dm.train_df()
    assert set(train["sample"]) == {"AD"}
    assert len(train) == 4  # splits {0,1} of AD
    assert set(dm.val_df()["sample"]) == {"Young"}


def test_file_datamodule_and_dataset(tmp_path, rng):
    vols = []
    for i in range(2):
        p = tmp_path / f"v{i}.mrc"
        write_mrc(p, rng.integers(0, 255, size=(4, 32, 32)).astype(np.int16))
        vols.append(p)
    lab = tmp_path / "lab0.hdf"
    labels = rng.integers(0, 2, size=(4, 32, 32)).astype(np.int8)
    write_hdf(lab, {"mito": labels})
    missing = tmp_path / "missing.mrc"

    def dataset_fn(files, train=False):
        return FileDataset(files, input_key=None, label_key="mito", train=train, seed=0)

    dm = FileDataModule(
        data_paths=[vols[0], missing],
        data_labels=[lab, lab],
        labels=["mito"],
        dataset_fn=dataset_fn,
        dataloader_fn=_loader_fn,
    )
    assert len(dm.data_files) == 1  # missing file skipped with warning
    batch, items = next(iter(dm.test_loader()))
    assert batch.data.shape[0] == 1
    assert items[0].aux_data is not None and "data" in items[0].aux_data

    # val loader falls back to train files
    val_batch, _ = next(iter(dm.val_loader()))
    assert val_batch.data.shape[0] == 1


def test_vit_dataset_pads_to_16(tomo_root, tmp_path, rng):
    root, csv = tomo_root
    # write a tomogram with non-multiple-of-16 sides
    d = {"data": rng.integers(0, 255, size=(3, 30, 45), dtype=np.uint8)}
    write_hdf(root / "AD" / "odd.hdf", d)
    records = pd.DataFrame([{"sample": "AD", "tomo_name": "odd.hdf"}])
    ds = VITDataset(records, data_root=root)
    item = ds[0]
    assert item.data.shape == (3, 32, 48, 1)  # padded up
    assert item.aux_data["data"].shape == (3, 30, 45)  # raw rides along


def test_dataloader_shuffle_determinism(tomo_root):
    root, csv = tomo_root
    records = pd.read_csv(csv)
    ds = _dataset_fn(root)(records)
    names = lambda loader: [items[0].tomo_name + items[0].sample for _, items in loader]

    l1 = DataLoader(ds, shuffle=True, num_workers=0, seed=7)
    l2 = DataLoader(ds, shuffle=True, num_workers=0, seed=7)
    assert names(l1) == names(l2)
    l2.set_epoch(1)
    assert names(l1) != names(l2)

    # threaded loader preserves order
    l3 = DataLoader(ds, shuffle=False, num_workers=4)
    l4 = DataLoader(ds, shuffle=False, num_workers=0)
    assert names(l3) == names(l4)
