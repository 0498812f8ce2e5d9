"""Model families: CryoVIT decoder, 3D U-Net, SAM2, DINOv2 feature extractor."""

from __future__ import annotations

from flax import linen as nn

from cryovit_tpu.models import losses, metrics
from cryovit_tpu.models.base import BaseModel, prediction_mask
from cryovit_tpu.models.cryovit import CryoVITModule
from cryovit_tpu.models.sam2.family import SAM2
from cryovit_tpu.models.unet3d import PAD_MULTIPLE, UNet3DModule
from cryovit_tpu.types import ModelType

__all__ = [
    "BaseModel",
    "CryoVIT",
    "UNet3D",
    "SAM2",
    "CryoVITModule",
    "UNet3DModule",
    "PAD_MULTIPLE",
    "prediction_mask",
    "losses",
    "metrics",
    "ModelType",
]


class CryoVIT(BaseModel):
    """CryoVIT decoder over DINOv2 features (reference ``models/cryovit.py``)."""

    model_type = ModelType.CRYOVIT

    def build_module(self) -> nn.Module:
        return CryoVITModule(dtype=self.dtype)


class UNet3D(BaseModel):
    """End-to-end 3D U-Net on raw voxels (reference ``models/unet3d.py``)."""

    model_type = ModelType.UNET3D

    def build_module(self) -> nn.Module:
        return UNet3DModule(dtype=self.dtype)
