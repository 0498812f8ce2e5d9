"""Host-side data layer: datasets, split-policy datamodules, device feed."""

from cryovit_tpu.data.datamodules import (
    BaseDataModule,
    FileDataModule,
    FractionalDataModule,
    FractionalSampleDataModule,
    MultiSampleDataModule,
    SingleSampleDataModule,
)
from cryovit_tpu.data.datasets import FileDataset, TomoDataset, VITDataset, random_crop
from cryovit_tpu.data.pipeline import BucketSpec, DataLoader, collate
from cryovit_tpu.data.transforms import (
    dino_device_preprocess,
    dino_grid_shape,
    pad_slices_to_multiple,
)

__all__ = [
    "BaseDataModule",
    "SingleSampleDataModule",
    "MultiSampleDataModule",
    "FractionalDataModule",
    "FractionalSampleDataModule",
    "FileDataModule",
    "TomoDataset",
    "FileDataset",
    "VITDataset",
    "random_crop",
    "DataLoader",
    "BucketSpec",
    "collate",
    "dino_device_preprocess",
    "dino_grid_shape",
    "pad_slices_to_multiple",
]
