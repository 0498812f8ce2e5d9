"""Host-side datasets: one item = one whole tomogram (numpy).

Parity targets: reference ``datasets/tomo_dataset.py`` (experiment mode),
``datasets/file_dataset.py`` (CLI mode), ``datasets/vit_dataset.py``
(feature extraction). Differences by design:

- arrays are returned **channels-last** ``(D, H, W, C)`` (TPU layout);
  the HDF5 file layout stays channels-first for reference compatibility,
- ViT preprocessing is split host/device (see ``data/transforms.py``):
  datasets only edge-pad H/W to multiples of 16; normalization + 14/16
  bicubic run inside the jitted extractor,
- the ``VITDataset`` normalization inconsistency in the reference (it
  builds an ImageNet ``Normalize`` but never applies it,
  ``vit_dataset.py:39`` vs ``file_dataset.py:225``) is resolved here by
  *always* normalizing — both paths produce identical features.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Sequence

import h5py
import numpy as np
import pandas as pd

from cryovit_tpu.data.transforms import pad_slices_to_multiple
from cryovit_tpu.io import load_data, load_labels
from cryovit_tpu.io.hdf import read_dataset
from cryovit_tpu.types import FileData, TomogramData

logger = logging.getLogger(__name__)

__all__ = ["TomoDataset", "FileDataset", "VITDataset", "random_crop"]

MAX_CROP_DEPTH = 128
FEATURE_CROP_SIDE = 32
VOXEL_CROP_SIDE = 512
FEATURE_STRIDE = 16  # one DINO patch covers 16 voxels


def random_crop(
    data: np.ndarray,
    label: np.ndarray,
    *,
    feature_space: bool,
    rng: np.random.Generator | None = None,
    max_depth: int = MAX_CROP_DEPTH,
) -> tuple[np.ndarray, np.ndarray]:
    """Random train-time crop (reference ``tomo_dataset.py:148-178``).

    ``data`` is channels-last ``(D, H, W, C)``; ``label`` is ``(D, LH, LW)``
    at voxel resolution. In feature space the crop side is 32 patches and
    label coordinates scale by 16. ``max_depth`` defaults to the reference
    recipe's 128; a single 16 GB v5e chip fits up to 64 (BASELINE.md) —
    deeper crops need a ≥2-chip depth-sharded mesh or a smaller setting
    (``datamodule.dataset.max_crop_depth=64``).
    """
    rng = rng or np.random.default_rng()
    side = FEATURE_CROP_SIDE if feature_space else VOXEL_CROP_SIDE
    d, h, w = data.shape[:3]
    x, y, z = min(d, max_depth), side, side
    if (d, h, w) == (x, y, z):
        return data, label

    di = rng.integers(d - x + 1) if d > x else 0
    hi = rng.integers(h - y + 1) if h > y else 0
    wi = rng.integers(w - z + 1) if w > z else 0

    data = data[di : di + x, hi : hi + y, wi : wi + z]
    if feature_space:
        hi, wi, y, z = (v * FEATURE_STRIDE for v in (hi, wi, y, z))
    label = label[di : di + x, hi : hi + y, wi : wi + z]
    return data, label


def _to_channels_last(arr: np.ndarray, key: str) -> np.ndarray:
    """File layout → TPU layout. Features ``(C, D, h, w)`` → ``(D, h, w, C)``;
    volumes ``(D, H, W)`` → ``(D, H, W, 1)``."""
    if arr.ndim == 4:  # channels-first feature volume
        return np.ascontiguousarray(np.moveaxis(arr, 0, -1))
    if arr.ndim == 3:
        return arr[..., np.newaxis]
    raise ValueError(f"unexpected rank for {key}: {arr.shape}")


class TomoDataset:
    """Experiment-mode loader over ``data_root/<sample>/<tomo_name>`` HDF5
    (reference ``tomo_dataset.py``)."""

    def __init__(
        self,
        records: pd.DataFrame,
        input_key: str,
        label_key: str,
        data_root: str | Path,
        train: bool = False,
        aux_keys: Sequence[str] = (),
        split_key: str | None = None,
        seed: int | None = None,
        max_crop_depth: int = MAX_CROP_DEPTH,
    ) -> None:
        self.records = records.reset_index(drop=True)
        self.input_key = input_key
        self.label_key = label_key
        self.data_root = Path(data_root)
        self.train = train
        self.aux_keys = list(aux_keys or [])
        self.split_key = split_key
        self.rng = np.random.default_rng(seed)
        self.max_crop_depth = int(max_crop_depth)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> TomogramData:
        if idx >= len(self):
            raise IndexError(idx)
        row = self.records.iloc[idx]
        tomo_path = self.data_root / str(row["sample"]) / str(row["tomo_name"])
        with h5py.File(tomo_path, "r") as f:
            if self.input_key not in f:
                raise KeyError(f"{tomo_path}: missing input key {self.input_key!r}")
            label_path = f"labels/{self.label_key}"
            if label_path not in f:
                raise KeyError(f"{tomo_path}: missing label key {label_path!r}")
            data = np.asarray(read_dataset(f[self.input_key]))
            label = np.asarray(read_dataset(f[label_path])).astype(np.int8)
            aux = {}
            for key in self.aux_keys:
                if key == "sam_features" and key in f:
                    # cached SAM pyramids: {backbone_fpn, vision_pos_enc} →
                    # per-level (D, C, h, w) arrays (reference
                    # tomo_dataset.py:128-144)
                    grp = f[key]
                    aux[key] = {
                        name: [
                            np.asarray(grp[name][str(i)][()])
                            for i in range(len(grp[name]))
                        ]
                        for name in grp
                    }
                elif key in f:
                    aux[key] = np.asarray(f[key][()])
                else:
                    logger.warning("%s: aux key %s missing", tomo_path, key)

        if data.dtype == np.uint8:
            data = data.astype(np.float32) / 255.0
        data = _to_channels_last(np.asarray(data, dtype=np.float32), self.input_key)

        if self.train:
            data, label = random_crop(
                data,
                label,
                feature_space=self.input_key == "dino_features",
                rng=self.rng,
                max_depth=self.max_crop_depth,
            )

        split_id = (
            int(row[self.split_key])
            if self.split_key and self.split_key in row.index
            else None
        )
        return TomogramData(
            sample=str(row["sample"]),
            tomo_name=str(row["tomo_name"]),
            split_id=split_id,
            data=data,
            label=label,
            aux_data=aux or None,
        )


class FileDataset:
    """CLI-mode loader from explicit file paths (reference ``file_dataset.py``)."""

    def __init__(
        self,
        files: list[FileData],
        input_key: str | None,
        label_key: str | None,
        train: bool = False,
        for_dino: bool = False,
        use_sam: bool = False,
        seed: int | None = None,
        max_crop_depth: int = MAX_CROP_DEPTH,
    ) -> None:
        self.files = files
        self.input_key = input_key
        self.label_key = label_key
        self.train = train
        self.for_dino = for_dino
        self.use_sam = use_sam
        self.rng = np.random.default_rng(seed)
        self.max_crop_depth = int(max_crop_depth)
        self._key_cache: dict[Path, str] = {}

    def __len__(self) -> int:
        return len(self.files)

    def _load(self, fd: FileData) -> tuple[np.ndarray, np.ndarray]:
        if fd.tomo_path in self._key_cache:
            data, _ = load_data(fd.tomo_path, key=self._key_cache[fd.tomo_path])
        else:
            data, key = load_data(fd.tomo_path, key=self.input_key)
            self._key_cache[fd.tomo_path] = key
        data = np.asarray(data, dtype=np.float32)

        if fd.label_path is not None and fd.labels is not None:
            labels = load_labels(fd.label_path, label_keys=fd.labels, key=self.label_key)
            label = labels[self.label_key]
        else:
            label = np.zeros(data.shape[-3:], dtype=np.int8)
        return data, label

    def __getitem__(self, idx: int) -> TomogramData:
        if idx >= len(self):
            raise IndexError(idx)
        fd = self.files[idx]
        data, label = self._load(fd)  # data: (C, D, H, W)

        aux: dict[str, Any] = {}
        if self.for_dino:
            # raw volume rides along for the feature writer
            aux["data"] = data[0]
            stack = data[0] if not self.use_sam else data[0]
            stack = pad_slices_to_multiple(stack) if not self.use_sam else stack
            return TomogramData(
                sample=fd.sample or "",
                tomo_name=fd.tomo_path.name,
                split_id=None,
                data=stack[..., np.newaxis].astype(np.float32),
                label=np.zeros(stack.shape, dtype=np.int8),
                aux_data=aux,
            )

        data_cl = _to_channels_last(
            data[0] if data.ndim == 4 and data.shape[0] == 1 else data,
            self.input_key or "data",
        )
        if self.train:
            data_cl, label = random_crop(
                data_cl,
                label,
                feature_space=self.input_key == "dino_features",
                max_depth=self.max_crop_depth,
                rng=self.rng,
            )
        else:
            # full raw volume for visualization / writers
            if self.input_key != "data":
                raw, _ = load_data(fd.tomo_path, key="data")
                aux["data"] = raw[0]
            else:
                aux["data"] = data[0]

        return TomogramData(
            sample=fd.sample or "",
            tomo_name=fd.tomo_path.name,
            split_id=None,
            data=data_cl,
            label=label,
            aux_data=aux or None,
        )


class VITDataset:
    """Feature-extraction loader (experiment mode): reads only the raw
    ``data`` volume (reference ``vit_dataset.py``)."""

    def __init__(
        self,
        records: pd.DataFrame,
        data_root: str | Path,
        use_sam: bool = False,
        **_: Any,
    ) -> None:
        self.records = records.reset_index(drop=True)
        self.data_root = Path(data_root)
        self.use_sam = use_sam

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> TomogramData:
        if idx >= len(self):
            raise IndexError(idx)
        row = self.records.iloc[idx]
        tomo_path = self.data_root / str(row["sample"]) / str(row["tomo_name"])
        data, _ = load_data(tomo_path, key="data")
        raw = data[0]  # (D, H, W) f32
        stack = raw if self.use_sam else pad_slices_to_multiple(raw)
        return TomogramData(
            sample=str(row["sample"]),
            tomo_name=str(row["tomo_name"]),
            split_id=None,
            data=stack[..., np.newaxis].astype(np.float32),
            label=np.zeros(stack.shape, dtype=np.int8),
            aux_data={"data": raw},
        )
