"""Exporter: TPU-trained weights → reference-readable torch artifacts.

Closes the artifact loop (VERDICT r3 missing #3): ``torch_import.py`` reads
reference-trained ``.model``/``weights.pt``/``.ckpt`` files, and this module
writes the inverse — a ``.model`` pickle whose ``weights`` is a torch
``state_dict`` in the reference's exact naming (reference writer:
``utils.py:354-381``; reader: ``utils.py:431-468`` does
``instantiate(saved_model.model_cfg)`` + strict ``load_state_dict``), so a
model trained here flows back to the reference GPU stack, its eval/infer
tooling, and the napari plugin unchanged.

Two compatibility subtleties:

- The reference unpickler imports ``cryovit.utils.SavedModel``,
  ``cryovit.types.ModelType`` and (for the config field) omegaconf — none of
  which exist in this environment. The pickle format stores classes BY
  REFERENCE (module + qualname), so lightweight stand-ins registered under
  those module paths at dump time produce bytes that resolve to the real
  classes on the reference side. ``model_cfg`` pickles as a deferred
  ``OmegaConf.create(<plain dict>)`` call, yielding a real DictConfig (with
  ``_target_`` attribute access and hydra instantiate support) on load.
- State-dict keys/layouts are the exact inverse of ``torch_import.py``'s
  conversions: flax conv kernels ``(kd, kh, kw, in, out)`` → torch
  ``(out, in, kd, kh, kw)``; ConvTranspose additionally tap-flipped; Dense
  transposed; norm scale → weight. Blocks use the reference's NESTED
  Sequential naming (``layers.2.layers.0``, reference ``models/cryovit.py:
  18-34``/``models/unet3d.py:20-46``).
"""

from __future__ import annotations

import enum
import io
import pickle
import sys
import types as pytypes
from collections import OrderedDict
from pathlib import Path
from typing import Any

import numpy as np

from cryovit_tpu.types import ModelType

__all__ = [
    "export_state_dict",
    "export_cryovit_state_dict",
    "export_unet3d_state_dict",
    "reference_model_cfg",
    "save_torch_model",
    "save_torch_weights",
]


# ---- flax → torch tensor-layout inverses (see torch_import.py) ------------

def _conv_w(k: np.ndarray) -> np.ndarray:
    """flax (kd, kh, kw, in, out) → torch Conv3d (out, in, kd, kh, kw)."""
    return np.ascontiguousarray(np.asarray(k, np.float32).transpose(4, 3, 0, 1, 2))


def _convT_w(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose (kd, kh, kw, in, out) → torch ConvTranspose3d
    (in, out, kd, kh, kw) with spatially flipped taps (exact inverse of
    ``torch_import._convT_kernel``)."""
    w = np.asarray(k, np.float32).transpose(3, 4, 0, 1, 2)
    return np.ascontiguousarray(w[:, :, ::-1, ::-1, ::-1])


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _emit(out: dict, prefix: str, tree: dict, kind: str) -> None:
    if kind == "conv":
        out[f"{prefix}.weight"] = _conv_w(tree["kernel"])
    elif kind == "convT":
        out[f"{prefix}.weight"] = _convT_w(tree["kernel"])
    elif kind == "dense":
        out[f"{prefix}.weight"] = np.ascontiguousarray(_f32(tree["kernel"]).T)
    elif kind == "norm":
        out[f"{prefix}.weight"] = _f32(tree["scale"])
    else:  # pragma: no cover
        raise ValueError(kind)
    out[f"{prefix}.bias"] = _f32(tree["bias"])


def export_cryovit_state_dict(variables: dict) -> dict[str, np.ndarray]:
    """``CryoVITModule`` variables → reference CryoVIT state dict
    (reference ``models/cryovit.py:18-34``: ``layers`` Sequential with
    nested per-block ``layers``, then ``output_layer``)."""
    params = variables.get("params", variables)
    out: dict[str, np.ndarray] = {}
    _emit(out, "layers.0", params["Conv_0"], "conv")
    for i in range(4):
        block = params[f"SynthesisBlock_{i}"]
        base = f"layers.{2 + i}.layers"
        _emit(out, f"{base}.0", block["GroupNorm_0"], "norm")
        _emit(out, f"{base}.1", block["Conv_0"], "conv")
        _emit(out, f"{base}.3", block["Conv_1"], "conv")
        _emit(out, f"{base}.5", block["ConvTranspose_0"], "convT")
    _emit(out, "output_layer.0", params["Conv_1"], "conv")
    _emit(out, "output_layer.2", params["Conv_2"], "conv")
    return out


def export_unet3d_state_dict(variables: dict) -> dict[str, np.ndarray]:
    """``UNet3DModule`` variables → reference UNet3D state dict
    (reference ``models/unet3d.py:20-46`` naming)."""
    params = variables.get("params", variables)
    out: dict[str, np.ndarray] = {}
    for i in range(3):
        block = params[f"AnalysisBlock_{i}"]
        base = f"analysis_layers.{i}"
        _emit(out, f"{base}.layers.0", block["Conv_0"], "conv")
        _emit(out, f"{base}.layers.1", block["GroupNorm_0"], "norm")
        _emit(out, f"{base}.layers.3", block["Conv_1"], "conv")
        _emit(out, f"{base}.layers.4", block["GroupNorm_1"], "norm")
        _emit(out, f"{base}.pool.0", block["Conv_2"], "conv")
        _emit(out, f"{base}.pool.1", block["GroupNorm_2"], "norm")
    _emit(out, "bottom_layer.0", params["Conv_0"], "conv")
    _emit(out, "bottom_layer.1", params["GroupNorm_0"], "norm")
    _emit(out, "bottom_layer.3", params["Conv_1"], "conv")
    _emit(out, "bottom_layer.4", params["GroupNorm_1"], "norm")
    for i in range(3):
        block = params[f"SynthesisBlock_{i}"]
        base = f"synthesis_layers.{i}"
        _emit(out, f"{base}.upconv.0", block["ConvTranspose_0"], "convT")
        _emit(out, f"{base}.upconv.1", block["GroupNorm_0"], "norm")
        _emit(out, f"{base}.layers.0.proj", block["Dense_0"], "dense")
        _emit(out, f"{base}.layers.1", block["GroupNorm_1"], "norm")
        _emit(out, f"{base}.layers.3", block["Conv_0"], "conv")
        _emit(out, f"{base}.layers.4", block["GroupNorm_2"], "norm")
    _emit(out, "output_layer", params["Conv_2"], "conv")
    return out


def export_state_dict(
    variables: dict, model_type: ModelType, sam_cfg=None
) -> dict[str, np.ndarray]:
    if model_type == ModelType.CRYOVIT:
        return export_cryovit_state_dict(variables)
    if model_type == ModelType.UNET3D:
        return export_unet3d_state_dict(variables)
    if model_type in (ModelType.SAM2, ModelType.MEDSAM):
        from cryovit_tpu.train.torch_export_sam2 import export_sam2_state_dict

        if sam_cfg is None:
            raise ValueError(
                "SAM2/MedSAM export needs the SAM2Config the variables were "
                "built with (pass sam_cfg=model.sam_cfg)"
            )
        return export_sam2_state_dict(variables, sam_cfg)
    raise ValueError(f"unknown model type for torch export: {model_type}")


# ---- reference model_cfg ---------------------------------------------------

_LOSS_TARGETS = {
    "dice_loss": "cryovit.models.losses.DiceLoss",
    "focal_loss": "cryovit.models.losses.FocalLoss",
}
_METRIC_TARGETS = {
    "dice_metric": "cryovit.models.metrics.DiceMetric",
    "f1_metric": "cryovit.models.metrics.F1Metric",
}


def reference_model_cfg(model_type: ModelType, model=None) -> dict[str, Any]:
    """The reference's composed ``cfg.model`` as a plain dict (values from
    reference ``configs/model/{cryovit,unet3d}.yaml`` + ``default.yaml`` +
    ``config.py:BaseModel``), optionally overridden from a local model
    family instance. The reference loader calls hydra ``instantiate`` on
    this (as a DictConfig) and reads ``._target_``."""
    if model_type == ModelType.CRYOVIT:
        cfg: dict[str, Any] = {
            "_target_": "cryovit.models.CryoVIT",
            "name": "CryoVIT",
            "input_key": "dino_features",
            "lr": 1e-4,
        }
    elif model_type == ModelType.UNET3D:
        cfg = {
            "_target_": "cryovit.models.UNet3D",
            "name": "UNet3D",
            "input_key": "data",
            "lr": 3e-3,
        }
    elif model_type in (ModelType.SAM2, ModelType.MEDSAM):
        # reference configs/model/{sam2,medsam}.yaml + default_sam.yaml:
        # the name picks the published checkpoint in
        # create_sam_model_from_weights (models/sam2.py:802-842)
        cfg = {
            "_target_": "cryovit.models.sam2.SAM2",
            "name": "MedSAM" if model_type == ModelType.MEDSAM else "SAM2",
            "input_key": "data",
            "lr": 5e-5,
        }
    else:
        raise ValueError(f"no reference cfg template for {model_type}")
    cfg["model_dir"] = None
    cfg["weight_decay"] = 1e-3
    cfg["losses"] = {"dice_loss": {"_target_": _LOSS_TARGETS["dice_loss"]}}
    cfg["metrics"] = {
        "dice_metric": {
            "_target_": _METRIC_TARGETS["dice_metric"],
            "threshold": 0.5,
        },
        "f1_metric": {"_target_": _METRIC_TARGETS["f1_metric"]},
    }
    cfg["custom_kwargs"] = None
    if model_type in (ModelType.SAM2, ModelType.MEDSAM):
        cfg["custom_kwargs"] = {
            "prompt_lr": float(getattr(model, "prompt_lr", 1e-4)),
            "num_init_cond_slices": list(
                getattr(model, "num_init_cond_slices", (1, 1))
            ),
            "rand_init_cond_slices": list(
                getattr(model, "rand_init_cond_slices", (True, False))
            ),
            "use_cache_features": bool(
                getattr(model, "use_cache_features", True)
            ),
        }
    if model is not None:
        cfg["lr"] = float(model.lr)
        cfg["weight_decay"] = float(model.weight_decay)
        cfg["input_key"] = model.input_key
        losses = {}
        for key in model.losses:
            if key in _LOSS_TARGETS:
                losses[key] = {"_target_": _LOSS_TARGETS[key]}
        if losses:
            cfg["losses"] = losses
        metrics = {}
        for key, fn in model.metrics.items():
            if key in _METRIC_TARGETS:
                entry: dict[str, Any] = {"_target_": _METRIC_TARGETS[key]}
                thr = getattr(fn, "threshold", None)
                if thr is not None:
                    entry["threshold"] = float(thr)
                metrics[key] = entry
        if metrics:
            cfg["metrics"] = metrics
    return cfg


# ---- reference-pickle emission ---------------------------------------------

def _ref_module(name: str) -> pytypes.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = pytypes.ModuleType(name)
        sys.modules[name] = mod
    return mod


class _StubRegistry:
    """Registers stand-in classes under the reference's module paths so
    ``pickle`` stores them by reference; removes them afterwards. The
    emitted bytes then resolve to the REAL ``cryovit.utils.SavedModel`` /
    ``cryovit.types.ModelType`` / ``omegaconf.OmegaConf.create`` on the
    reference side."""

    def __enter__(self):
        self._created: list[tuple[pytypes.ModuleType, str]] = []
        self._new_modules: list[str] = []

        def module(name):
            if name not in sys.modules:
                self._new_modules.append(name)
            return _ref_module(name)

        cu = module("cryovit.utils")
        ct = module("cryovit.types")
        module("cryovit")
        oo = module("omegaconf.omegaconf")
        om = module("omegaconf")

        class SavedModel:  # pickled by reference as cryovit.utils.SavedModel
            pass

        SavedModel.__module__ = "cryovit.utils"
        SavedModel.__qualname__ = "SavedModel"

        RefModelType = enum.Enum(
            "ModelType",
            {m.name: m.value for m in ModelType},
            module="cryovit.types",
            qualname="ModelType",
        )

        class OmegaConf:
            @staticmethod
            def create(obj):  # pragma: no cover - never called at dump time
                return obj

        OmegaConf.__module__ = "omegaconf.omegaconf"
        OmegaConf.__qualname__ = "OmegaConf"
        OmegaConf.create.__module__ = "omegaconf.omegaconf"
        OmegaConf.create.__qualname__ = "OmegaConf.create"

        for mod, name, obj in (
            (cu, "SavedModel", SavedModel),
            (ct, "ModelType", RefModelType),
            (oo, "OmegaConf", OmegaConf),
            (om, "OmegaConf", OmegaConf),
        ):
            if not hasattr(mod, name):
                setattr(mod, name, obj)
                self._created.append((mod, name))
        self.SavedModel = SavedModel
        self.ModelType = RefModelType
        self.OmegaConf = OmegaConf
        return self

    def __exit__(self, *exc):
        for mod, name in self._created:
            delattr(mod, name)
        for name in self._new_modules:
            sys.modules.pop(name, None)
        return False


class _DeferredOmegaConf:
    """Pickles as ``OmegaConf.create(cfg_dict)`` — a real DictConfig on the
    loading side, a plain dict anywhere omegaconf is absent."""

    def __init__(self, cfg: dict, create_fn):
        self._cfg = cfg
        self._create = create_fn

    def __reduce__(self):
        return (self._create, (self._cfg,))


def _to_torch_state_dict(sd: dict[str, np.ndarray]):
    import torch

    return OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v))) for k, v in sd.items()
    )


def save_torch_model(
    model_name: str,
    label_key: str,
    model,
    variables: dict,
    save_path: str | Path,
) -> Path:
    """Write a reference-readable ``.model`` pickle (the inverse of
    ``torch_import.load_reference_model``): ``SavedModel(name, model_type,
    label_key, DictConfig model_cfg, torch state_dict)``. The reference's
    ``load_model`` (``utils.py:431-468``) instantiates the Lightning model
    from ``model_cfg`` and strict-loads the weights."""
    sd = _to_torch_state_dict(
        export_state_dict(
            variables, model.model_type,
            sam_cfg=getattr(model, "sam_cfg", None),
        )
    )
    cfg = reference_model_cfg(model.model_type, model=model)
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    with _StubRegistry() as stubs:
        artifact = stubs.SavedModel()
        artifact.__dict__.update(
            name=model_name,
            model_type=stubs.ModelType(model.model_type.value),
            label_key=label_key,
            model_cfg=_DeferredOmegaConf(cfg, stubs.OmegaConf.create),
            weights=sd,
        )
        buf = io.BytesIO()
        pickle.dump(artifact, buf, protocol=4)
    save_path.write_bytes(buf.getvalue())
    return save_path


def save_torch_weights(
    variables: dict, model_type: ModelType, save_path: str | Path, sam_cfg=None
) -> Path:
    """Write a reference-style raw ``weights.pt`` (``torch.save``-d state
    dict, reference ``run/train_model.py:312``) from flax variables."""
    import torch

    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(
        _to_torch_state_dict(
            export_state_dict(variables, model_type, sam_cfg=sam_cfg)
        ),
        save_path,
    )
    return save_path
