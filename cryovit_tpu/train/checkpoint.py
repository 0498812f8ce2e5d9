"""Checkpointing and the distributable ``.model`` artifact.

Parity target: reference three formats (SURVEY.md §5.4):

1. resumable training checkpoints (Lightning ``last.ckpt``) → orbax
   pytree checkpoints of the full TrainState,
2. raw ``weights.pt`` state-dicts → flax msgpack ``weights.msgpack``,
3. the distributable ``.model`` pickle (``SavedModel`` with name, type,
   label_key, model config, weights — reference ``utils.py:335-468``) →
   same dataclass, weights serialized with flax msgpack inside the pickle
   so the artifact is framework-portable and torch-free.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

from cryovit_tpu.composer import instantiate, to_plain
from cryovit_tpu.types import ModelType

__all__ = [
    "SavedModel",
    "save_model",
    "save_model_from_weights",
    "load_model",
    "save_checkpoint",
    "restore_checkpoint",
    "save_weights",
    "load_weights",
    "merge_variables",
]


@dataclasses.dataclass
class SavedModel:
    """Distributable model artifact (reference ``utils.py:335-351``)."""

    name: str
    model_type: ModelType
    label_key: str
    model_cfg: dict[str, Any]
    weights: bytes  # flax msgpack of the variables pytree


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_model(
    model_name: str,
    label_key: str,
    model,
    variables,
    model_cfg: dict[str, Any],
    save_path: str | Path,
) -> None:
    """Pickle a :class:`SavedModel` (reference ``utils.py:354-381``)."""
    artifact = SavedModel(
        name=model_name,
        model_type=model.model_type,
        label_key=label_key,
        model_cfg=to_plain(model_cfg),
        weights=serialization.to_bytes(_to_host(variables)),
    )
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    with open(save_path, "wb") as f:
        pickle.dump(artifact, f)


def save_model_from_weights(
    model_name: str,
    label_key: str,
    model_type: ModelType,
    weights_path: str | Path,
    save_path: str | Path,
    **overrides: Any,
) -> None:
    """Build a ``.model`` artifact from a raw weights file
    (reference ``utils.py:384-428``). ``overrides`` use ``a__b`` for nested
    config keys."""
    from cryovit_tpu.config import compose

    weights_path = Path(weights_path)
    if not weights_path.exists():
        raise FileNotFoundError(f"Weights file {weights_path} does not exist.")
    ov = [f"model.{k.replace('__', '.')}={v}" for k, v in overrides.items()]
    cfg = compose(
        "infer_model",
        [f"model={model_type.value}", f"label_key={label_key}"] + ov,
    )
    model = instantiate(cfg.model)
    variables = load_weights(weights_path, template=None)
    save_model(model_name, label_key, model, variables, cfg.model, save_path)


def load_model(
    model_path: str | Path, load_weights_flag: bool = True
) -> tuple[Any, Any, ModelType, str, str]:
    """Load a ``.model`` artifact (reference ``utils.py:431-468``).

    Returns ``(model, variables, model_type, name, label_key)``; model and
    variables are None when ``load_weights_flag`` is False.
    """
    model_path = Path(model_path)
    if not model_path.exists():
        raise FileNotFoundError(f"Model file {model_path} does not exist.")
    try:
        with open(model_path, "rb") as f:
            artifact: SavedModel = pickle.load(f)
    except (ModuleNotFoundError, AttributeError, pickle.UnpicklingError):
        # reference-trained torch `.model` pickle (reference
        # utils.py:354-381) — import and convert the weights in place.
        return _load_reference_model(model_path, load_weights_flag)
    if not isinstance(artifact, SavedModel):
        return _load_reference_model(model_path, load_weights_flag)
    model, variables = None, None
    if load_weights_flag:
        model = instantiate(artifact.model_cfg)
        variables = serialization.msgpack_restore(artifact.weights)
    return model, variables, artifact.model_type, artifact.name, artifact.label_key


def _load_reference_model(model_path: Path, load_weights_flag: bool):
    """Ingest a reference torch ``.model`` artifact: unpickle without the
    reference package, convert the state dict to flax, and rebuild the
    model family from our own composed config."""
    from cryovit_tpu.config import compose
    from cryovit_tpu.train.torch_import import convert_state_dict, load_reference_model

    name, model_type, label_key, sd = load_reference_model(model_path)
    model, variables = None, None
    if load_weights_flag:
        variables, _ = convert_state_dict(sd, model_type)
        cfg = compose(
            "infer_model", [f"model={model_type.value}", f"label_key={label_key}"]
        )
        model = instantiate(cfg.model)
    return model, variables, model_type, name, label_key


def merge_variables(base, partial):
    """Overlay a PARTIAL variables pytree onto a fully-initialized one.

    Used to load pretrained SAM2 weights (which cover every module except
    the from-scratch PromptPredictor and the post-load LoRA adapters,
    reference ``create_sam_model_from_weights``, ``models/sam2.py:802-842``)
    over ``model.init`` output. Leaves are cast to the base leaf's dtype
    (bf16 policies) and must match its shape.
    """
    def rec(b, p, path):
        if isinstance(p, dict):
            if not isinstance(b, dict):
                raise KeyError(f"pretrained subtree at {path} not in model")
            out = dict(b)
            for k, v in p.items():
                if k not in b:
                    raise KeyError(f"pretrained param {path}/{k} not in model")
                out[k] = rec(b[k], v, f"{path}/{k}")
            return out
        leaf = jax.numpy.asarray(p)
        if tuple(leaf.shape) != tuple(b.shape):
            raise ValueError(
                f"pretrained param {path} shape {leaf.shape} != model {b.shape}"
            )
        return leaf.astype(b.dtype)

    return rec(base, partial, "")


# ---- raw weights (state-dict equivalent) ---------------------------------

def save_weights(path: str | Path, variables) -> None:
    """msgpack the variables pytree (reference ``weights.pt`` role)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(_to_host(variables)))


def load_weights(path: str | Path, template=None):
    """Load a weights file: flax msgpack, or a reference torch
    ``weights.pt`` (detected by its zip container and converted)."""
    from cryovit_tpu.train.torch_import import (
        convert_state_dict,
        is_torch_zip,
        load_torch_state_dict,
    )

    path = Path(path)
    if is_torch_zip(path):
        variables, _ = convert_state_dict(load_torch_state_dict(path))
        return variables
    data = path.read_bytes()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


# ---- resumable training checkpoints --------------------------------------

def save_checkpoint(path: str | Path, state: dict[str, Any]) -> None:
    """Save a full training state pytree (params/opt/epoch) via orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, _to_host(state), force=True)


def restore_checkpoint(path: str | Path, template: dict[str, Any] | None = None):
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckpt = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckpt.restore(path, args=ocp.args.PyTreeRestore(_to_host(template)))
    return ckpt.restore(path)
