"""Split-policy datamodules over a pandas splits CSV.

Parity target: reference ``datamodules/`` — each class reproduces the exact
pandas filtering semantics (incl. ``KFold(11, shuffle=True, random_state=42)``
for fractional sweeps) so experiment splits are bit-identical to the
reference. The Lightning plumbing is replaced by plain ``*_loader()``
methods returning prefetching :class:`~cryovit_tpu.data.pipeline.DataLoader`s.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable

import numpy as np
import pandas as pd
from sklearn.model_selection import KFold

from cryovit_tpu.data.pipeline import BucketSpec, collate
from cryovit_tpu.types import FileData

logger = logging.getLogger(__name__)

__all__ = [
    "BaseDataModule",
    "SingleSampleDataModule",
    "MultiSampleDataModule",
    "FractionalDataModule",
    "FractionalSampleDataModule",
    "FileDataModule",
]


def _as_list(value) -> list:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


class BaseDataModule:
    """Common loader plumbing (reference ``base_datamodule.py:14-128``):
    reads ``splits.csv``, exposes abstract ``{train,val,test,predict}_df``,
    builds loaders with shuffle only for train."""

    def __init__(
        self,
        split_file: str | Path,
        dataset_fn: Callable,
        dataloader_fn: Callable,
        input_key: str | None = None,
        **_: object,
    ) -> None:
        self.split_file = Path(split_file)
        self.record_df = pd.read_csv(self.split_file)
        self.dataset_fn = dataset_fn
        self.dataloader_fn = dataloader_fn
        bucket = BucketSpec.for_input(input_key or "data")
        self.collate_fn = lambda items: collate(items, bucket)

    # -- split policies (abstract) --------------------------------------
    def train_df(self) -> pd.DataFrame:
        raise NotImplementedError

    def val_df(self) -> pd.DataFrame:
        raise NotImplementedError

    def test_df(self) -> pd.DataFrame:
        raise NotImplementedError

    def predict_df(self) -> pd.DataFrame:
        raise NotImplementedError

    # -- loaders ---------------------------------------------------------
    def _loader(self, records: pd.DataFrame, train: bool, phase: str):
        if records.empty:
            raise ValueError(f"No {phase} data found in the provided split file.")
        dataset = self.dataset_fn(records, train=train)
        return self.dataloader_fn(
            dataset, shuffle=train, collate_fn=self.collate_fn
        )

    def train_loader(self):
        return self._loader(self.train_df(), train=True, phase="training")

    def val_loader(self):
        return self._loader(self.val_df(), train=False, phase="validation")

    def test_loader(self):
        return self._loader(self.test_df(), train=False, phase="testing")

    def predict_loader(self):
        return self._loader(self.predict_df(), train=False, phase="prediction")


class SingleSampleDataModule(BaseDataModule):
    """Train on one sample excluding ``split_id`` rows; val = that split;
    test = ``test_sample`` (whole other sample) or val — 10-fold CV
    (reference ``single_sample_datamodule.py:44-105``)."""

    def __init__(
        self,
        sample,
        split_id: int | None = None,
        split_key: str = "split_id",
        test_sample=None,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        sample = _as_list(sample)
        test_sample = _as_list(test_sample) or None
        assert len(sample) == 1, f"single-sample 'sample' must be one name, got {sample}"
        assert test_sample is None or len(test_sample) == 1
        self.sample = sample[0]
        self.split_id = split_id
        self.split_key = split_key
        self.test_sample = test_sample[0] if test_sample else None

    def train_df(self) -> pd.DataFrame:
        df = self.record_df
        if self.split_id is not None:
            return df[(df[self.split_key] != self.split_id) & (df["sample"] == self.sample)]
        return df[df["sample"] == self.sample][["sample", "tomo_name"]]

    def val_df(self) -> pd.DataFrame:
        if self.split_id is None:
            return self.train_df()
        df = self.record_df
        return df[(df[self.split_key] == self.split_id) & (df["sample"] == self.sample)]

    def test_df(self) -> pd.DataFrame:
        if self.test_sample is None:
            return self.val_df()
        df = self.record_df
        return df[df["sample"] == self.test_sample][["sample", "tomo_name"]]

    def predict_df(self) -> pd.DataFrame:
        df = self.record_df
        return df[df["sample"] == self.sample][["sample", "tomo_name"]]


class MultiSampleDataModule(BaseDataModule):
    """Same policy with sample lists (``isin``) — used for domain-shift
    experiments (reference ``multi_sample_datamodule.py:42-103``)."""

    def __init__(
        self,
        sample,
        split_id: int | None = None,
        split_key: str = "split_id",
        test_sample=None,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        self.sample = _as_list(sample)
        self.split_id = split_id
        self.split_key = split_key
        self.test_sample = _as_list(test_sample) or None

    def train_df(self) -> pd.DataFrame:
        df = self.record_df
        if self.split_id is not None:
            return df[(df[self.split_key] != self.split_id) & (df["sample"].isin(self.sample))]
        return df[df["sample"].isin(self.sample)][["sample", "tomo_name"]]

    def val_df(self) -> pd.DataFrame:
        if self.split_id is None:
            return self.train_df()
        df = self.record_df
        return df[(df[self.split_key] == self.split_id) & (df["sample"].isin(self.sample))]

    def test_df(self) -> pd.DataFrame:
        if self.test_sample is None:
            return self.val_df()
        df = self.record_df
        return df[df["sample"].isin(self.test_sample)][["sample", "tomo_name"]]

    def predict_df(self) -> pd.DataFrame:
        df = self.record_df
        return df[df["sample"].isin(self.sample)][["sample", "tomo_name"]]


class FractionalDataModule(BaseDataModule):
    """Data-fraction sweep: regenerate 11 folds in-memory with
    ``KFold(11, shuffle=True, random_state=42)``, hold out fold
    ``test_sample`` (int), train on the first ``split_id`` of the remaining
    10 folds (reference ``fractional_datamodule.py``)."""

    def __init__(
        self,
        sample,
        split_id: int | None = None,
        split_key: str = "split_id",
        test_sample: int | None = None,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        assert test_sample is not None, "fractional 'test_sample' cannot be None"
        assert isinstance(test_sample, (int, np.integer)), (
            f"fractional 'test_sample' must be an integer fold id, got {test_sample!r}"
        )
        n = self.record_df.shape[0]
        kf = KFold(n_splits=11, shuffle=True, random_state=42)
        folds = np.full(n, -1, dtype=int)
        for f, (_, test_idx) in enumerate(kf.split(np.zeros((n, 1)))):
            folds[test_idx] = f
        self.record_df[split_key] = folds

        self.sample = _as_list(sample)
        self.split_id = split_id
        self.split_key = split_key
        self.test_id = int(test_sample)

    def train_df(self) -> pd.DataFrame:
        df = self.record_df
        all_splits = sorted(set(df[self.split_key].unique()) - {self.test_id})
        assert len(all_splits) == 10, "expected 10 training folds"
        splits = all_splits[: self.split_id] if self.split_id is not None else all_splits
        return df[df[self.split_key].isin(splits) & df["sample"].isin(self.sample)][
            ["sample", "tomo_name"]
        ]

    def val_df(self) -> pd.DataFrame:
        df = self.record_df
        return df[(df[self.split_key] == self.test_id) & df["sample"].isin(self.sample)]

    def test_df(self) -> pd.DataFrame:
        keys = ["sample", "tomo_name"] + ([self.split_key] if self.split_id is not None else [])
        df = self.val_df()[keys].copy()
        if self.split_key in df.columns:
            # report the data-fraction index as split_id (reference behavior)
            df["split_id"] = self.split_id
        return df

    def predict_df(self) -> pd.DataFrame:
        df = self.record_df
        return df[df["sample"].isin(self.sample)][["sample", "tomo_name"]]


class FractionalSampleDataModule(BaseDataModule):
    """Fractional leave-one-*sample*-out: train on splits ``< split_id`` of
    all samples except ``test_sample``; val/test = the held-out sample
    (reference ``fractional_sample_datamodule.py:42-91``)."""

    def __init__(
        self,
        sample,
        split_id: int | None = None,
        split_key: str = "split_id",
        test_sample=None,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        test_sample = _as_list(test_sample)
        assert len(test_sample) == 1, "fractional-sample 'test_sample' must be one name"
        self.sample = _as_list(sample)
        self.split_id = split_id
        self.split_key = split_key
        self.test_sample = test_sample

    def train_df(self) -> pd.DataFrame:
        df = self.record_df
        if self.split_id is not None:
            splits = list(range(self.split_id))
        else:
            splits = list(range(int(df[self.split_key].max())))
        return df[
            df[self.split_key].isin(splits)
            & df["sample"].isin(self.sample)
            & ~df["sample"].isin(self.test_sample)
        ][["sample", "tomo_name"]]

    def val_df(self) -> pd.DataFrame:
        return self.record_df[self.record_df["sample"].isin(self.test_sample)]

    def test_df(self) -> pd.DataFrame:
        keys = ["sample", "tomo_name"] + ([self.split_key] if self.split_id is not None else [])
        df = self.val_df()[keys].copy()
        if self.split_key in df.columns:
            df["split_id"] = self.split_id
        return df

    def predict_df(self) -> pd.DataFrame:
        df = self.record_df
        return df[df["sample"].isin(self.sample)][["sample", "tomo_name"]]


class FileDataModule:
    """CLI-mode datamodule zipping data paths + label paths into
    :class:`FileData` (reference ``file_datamodule.py``): skips missing
    files with a warning; val falls back to train files."""

    def __init__(
        self,
        data_paths: list,
        dataset_fn: Callable,
        dataloader_fn: Callable,
        val_paths: list | None = None,
        data_labels: list | None = None,
        val_labels: list | None = None,
        labels: list[str] | None = None,
        input_key: str | None = None,
        **_: object,
    ) -> None:
        self.data_files = self._combine(data_paths, data_labels, labels)
        self.val_files = (
            self._combine(val_paths, val_labels, labels) if val_paths else []
        )
        self.dataset_fn = dataset_fn
        self.dataloader_fn = dataloader_fn
        bucket = BucketSpec.for_input(input_key or "data")
        self.collate_fn = lambda items: collate(items, bucket)

    @staticmethod
    def _combine(files, labels, label_keys) -> list[FileData]:
        files = [Path(f) for f in files]
        file_labels = [None] * len(files) if labels is None else [Path(p) for p in labels]
        if len(files) != len(file_labels):
            raise ValueError("Number of data files must match number of label files.")
        out = []
        for fp, lp in zip(files, file_labels, strict=True):
            if not fp.exists() or (lp is not None and not lp.exists()):
                logger.warning("File %s or label %s does not exist, skipping.", fp, lp)
                continue
            out.append(
                FileData(tomo_path=fp, label_path=lp, sample=fp.parent.name, labels=label_keys)
            )
        return out

    def _loader(self, files, train: bool, phase: str):
        if not files:
            raise ValueError(f"No {phase} data provided.")
        dataset = self.dataset_fn(files, train=train)
        return self.dataloader_fn(dataset, shuffle=train, collate_fn=self.collate_fn)

    def train_loader(self):
        return self._loader(self.data_files, True, "training")

    def val_loader(self):
        files = self.val_files
        if not files:
            logger.warning("No validation data provided, using training data.")
            files = self.data_files
        return self._loader(files, False, "validation")

    def test_loader(self):
        return self._loader(self.data_files, False, "testing")

    def predict_loader(self):
        return self._loader(self.data_files, False, "prediction")
