"""Importer for reference-trained torch artifacts.

The reference ships three torch formats (reference ``utils.py:335-468``):
``.model`` pickles (a ``cryovit.utils.SavedModel`` dataclass whose
``weights`` field is a torch ``state_dict``), raw ``weights.pt`` files
(``torch.save``-d state dicts), and Lightning ``last.ckpt`` checkpoints.
This module ingests the first two without the reference package (or
omegaconf) installed, so a user migrating from the reference can point
``cryovit train --ckpt`` / ``cryovit evaluate`` / ``cryovit infer`` at an
existing artifact and keep going on TPU.

Design notes:
- Unpickling uses a restricted ``pickle.Unpickler`` that maps
  ``cryovit.utils.SavedModel`` / ``cryovit.types.ModelType`` onto local
  stand-ins, stubs any omegaconf/hydra config objects (we re-compose the
  model config from ``model_type`` instead of trusting the pickled one),
  and otherwise only admits torch's tensor-rebuild machinery.
- Weight conversion reuses the layouts proven by the torch-parity tests
  (``tests/test_cryovit_torch_parity.py``): torch ``Conv3d`` kernels
  ``(out, in, kd, kh, kw)`` → flax ``(kd, kh, kw, in, out)``;
  ``ConvTranspose3d`` additionally spatially flipped; ``Linear``
  transposed; norms map weight→scale.
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Any

import numpy as np

from cryovit_tpu.types import ModelType

logger = logging.getLogger(__name__)

__all__ = [
    "is_torch_zip",
    "load_reference_model",
    "load_torch_state_dict",
    "convert_state_dict",
    "convert_cryovit_state_dict",
    "convert_unet3d_state_dict",
]


class _Stub:
    """Tolerant stand-in for unpicklable config classes (omegaconf nodes,
    hydra dataclasses). Swallows any construction/setstate protocol, so it
    works whether the pickle uses REDUCE (``cls(*args)``) or NEWOBJ
    (``cls.__new__(cls)`` + ``__setstate__``)."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        self._args, self._kwargs = args, kwargs

    def __setstate__(self, state: Any) -> None:
        self._state = state


class _RawSavedModel:
    """Field capture for the reference ``SavedModel`` dataclass."""

    name: str = ""
    model_type: Any = None
    label_key: str = ""
    model_cfg: Any = None
    weights: Any = None

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        fields = ["name", "model_type", "label_key", "model_cfg", "weights"]
        for field, value in zip(fields, args):
            setattr(self, field, value)
        for key, value in kwargs.items():
            setattr(self, key, value)

    def __setstate__(self, state: Any) -> None:
        if isinstance(state, dict):
            self.__dict__.update(state)


class _ReferenceUnpickler(pickle.Unpickler):
    """Unpickle reference ``.model`` files without the reference package.

    torch tensor rebuilds are delegated to torch; the reference's own
    classes map to local stand-ins; config-library classes become inert
    stubs (their contents are intentionally discarded).
    """

    def find_class(self, module: str, name: str) -> Any:
        root = module.split(".")[0]
        if root in ("torch", "collections", "builtins", "numpy"):
            return super().find_class(module, name)
        if name == "SavedModel":
            return _RawSavedModel
        if name == "ModelType":
            return ModelType
        if root in ("omegaconf", "hydra", "cryovit", "dataclasses", "enum", "typing"):
            return _Stub
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from a reference artifact"
        )


def _to_numpy_state_dict(weights: Any) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key, value in dict(weights).items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        out[str(key)] = np.asarray(value)
    return out


def load_reference_model(
    path: str | Path,
) -> tuple[str, ModelType, str, dict[str, np.ndarray]]:
    """Read a reference ``.model`` pickle → (name, model_type, label_key,
    numpy state_dict). Reference writer: ``utils.py:354-381``."""
    with open(path, "rb") as f:
        raw = _ReferenceUnpickler(f).load()
    if not isinstance(raw, _RawSavedModel):
        raise ValueError(f"{path} does not contain a reference SavedModel")
    model_type = raw.model_type
    if not isinstance(model_type, ModelType):
        model_type = ModelType(str(model_type))
    return (
        str(raw.name),
        model_type,
        str(raw.label_key),
        _to_numpy_state_dict(raw.weights),
    )


# ---- raw weights.pt -------------------------------------------------------

def is_torch_zip(path: str | Path) -> bool:
    """torch.save uses a zipfile container — detect by magic bytes."""
    with open(path, "rb") as f:
        return f.read(2) == b"PK"


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Read a ``torch.save``-d state dict: a raw reference ``weights.pt``
    or a Lightning ``last.ckpt`` (reference ``run/train_model.py:107-130``
    accepts both for fine-tuning).

    Lightning checkpoints wrap the module state under ``state_dict``; the
    module's own keys carry Lightning-side artifacts we normalize away:
    ``_orig_mod.`` segments from ``torch.compile`` wrapping, a ``model.``
    prefix when the LightningModule nests the network (reference SAM2,
    ``models/sam2.py:63``), and torchmetrics buffers
    (``metric_fns.TRAIN...``) that have no role in a weight import.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:  # Lightning checkpoint
        sd = sd["state_dict"]
    sd = _to_numpy_state_dict(sd)
    sd = {
        k.replace("._orig_mod.", ".").removeprefix("_orig_mod."): v
        for k, v in sd.items()
        if not k.startswith(("metric_fns.", "loss_fns."))
    }
    if sd and all(k.startswith("model.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
    return sd


# ---- state-dict → flax conversions ----------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (out, in, kd, kh, kw) → flax (kd, kh, kw, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (in, out, kd, kh, kw) → flax ConvTranspose
    (kd, kh, kw, in, out) with spatially flipped taps."""
    w = w[:, :, ::-1, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 4, 0, 1))


def _conv(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {
        "kernel": _conv_kernel(sd[f"{prefix}.weight"]),
        "bias": sd[f"{prefix}.bias"],
    }


def _convT(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {
        "kernel": _convT_kernel(sd[f"{prefix}.weight"]),
        "bias": sd[f"{prefix}.bias"],
    }


def _norm(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd: dict[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def convert_cryovit_state_dict(sd: dict[str, np.ndarray]) -> dict:
    """Reference CryoVIT state dict → ``CryoVITModule`` variables.

    Reference layout (``models/cryovit.py:18-34``): ``layers`` Sequential of
    [Conv3d 1536→1024, GELU, 4× SynthesisBlock], each block a nested
    ``layers`` Sequential [GroupNorm, Conv, GELU, Conv, GELU, ConvT, GELU],
    then ``output_layer`` [Conv, GELU, Conv].
    """
    params: dict[str, Any] = {"Conv_0": _conv(sd, "layers.0")}
    for i in range(4):
        # real reference checkpoints nest the block's own Sequential
        # ("layers.2.layers.0"); accept the flat layout too.
        base = f"layers.{2 + i}.layers"
        if f"{base}.0.weight" not in sd:
            base = f"layers.{2 + i}"
        params[f"SynthesisBlock_{i}"] = {
            "GroupNorm_0": _norm(sd, f"{base}.0"),
            "Conv_0": _conv(sd, f"{base}.1"),
            "Conv_1": _conv(sd, f"{base}.3"),
            "ConvTranspose_0": _convT(sd, f"{base}.5"),
        }
    params["Conv_1"] = _conv(sd, "output_layer.0")
    params["Conv_2"] = _conv(sd, "output_layer.2")
    return {"params": params}


def convert_unet3d_state_dict(sd: dict[str, np.ndarray]) -> dict:
    """Reference UNet3D state dict → ``UNet3DModule`` variables.

    Reference layout (``models/unet3d.py:20-46``): ``analysis_layers`` 3×
    AnalysisBlock{layers: [Conv, IN, GELU, Conv, IN, GELU], pool: [Conv,
    IN, GELU]}, ``bottom_layer`` [Conv, IN, GELU, Conv, IN, GELU],
    ``synthesis_layers`` 3× SynthesisBlock{upconv: [ConvT, IN, GELU],
    layers: [LinearProjection, IN, GELU, Conv, IN, GELU]}, ``output_layer``
    1×1 Conv. InstanceNorm3d(affine) == our per-channel GroupNorm.
    """
    params: dict[str, Any] = {}
    for i in range(3):
        base = f"analysis_layers.{i}"
        params[f"AnalysisBlock_{i}"] = {
            "Conv_0": _conv(sd, f"{base}.layers.0"),
            "GroupNorm_0": _norm(sd, f"{base}.layers.1"),
            "Conv_1": _conv(sd, f"{base}.layers.3"),
            "GroupNorm_1": _norm(sd, f"{base}.layers.4"),
            "Conv_2": _conv(sd, f"{base}.pool.0"),
            "GroupNorm_2": _norm(sd, f"{base}.pool.1"),
        }
    params["Conv_0"] = _conv(sd, "bottom_layer.0")
    params["GroupNorm_0"] = _norm(sd, "bottom_layer.1")
    params["Conv_1"] = _conv(sd, "bottom_layer.3")
    params["GroupNorm_1"] = _norm(sd, "bottom_layer.4")
    for i in range(3):
        base = f"synthesis_layers.{i}"
        params[f"SynthesisBlock_{i}"] = {
            "ConvTranspose_0": _convT(sd, f"{base}.upconv.0"),
            "GroupNorm_0": _norm(sd, f"{base}.upconv.1"),
            "Dense_0": _dense(sd, f"{base}.layers.0.proj"),
            "GroupNorm_1": _norm(sd, f"{base}.layers.1"),
            "Conv_0": _conv(sd, f"{base}.layers.3"),
            "GroupNorm_2": _norm(sd, f"{base}.layers.4"),
        }
    params["Conv_2"] = _conv(sd, "output_layer")
    return {"params": params}


def infer_model_type(sd: dict[str, np.ndarray]) -> ModelType:
    """Infer the model family from state-dict key structure."""
    if any(k.startswith("analysis_layers.") for k in sd):
        return ModelType.UNET3D
    if "layers.0.weight" in sd and sd["layers.0.weight"].shape[:2] == (1024, 1536):
        return ModelType.CRYOVIT
    raise ValueError(
        "cannot infer model family from state-dict keys "
        f"(saw: {sorted(sd)[:5]}...); SAM2/MedSAM artifacts are imported "
        "via tools/convert_sam2.py"
    )


def convert_state_dict(
    sd: dict[str, np.ndarray], model_type: ModelType | None = None
) -> tuple[dict, ModelType]:
    """Convert a reference torch state dict to flax variables, inferring
    the model family if not given. Returns (variables, model_type)."""
    model_type = model_type or infer_model_type(sd)
    if model_type == ModelType.CRYOVIT:
        return convert_cryovit_state_dict(sd), model_type
    if model_type == ModelType.UNET3D:
        return convert_unet3d_state_dict(sd), model_type
    raise ValueError(
        f"torch import supports cryovit/unet3d state dicts, not {model_type}"
    )
