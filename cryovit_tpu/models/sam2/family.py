"""SAM2 / MedSAM model-family wrapper (config-instantiable).

Parity target: reference ``SAM2`` Lightning wrapper (``models/sam2.py:48-315``):
- separate ``prompt_lr`` parameter group for the PromptPredictor,
- frozen image encoder / prompt encoder / memory modules / decoder base,
  trainable LoRA adapters + prompt predictor + SAM2-level embeddings,
- prompt mask loss (dice on predicted dense prompts) added to the total,
- input resized to 512², depth truncated at ``MAX_SAM_DEPTH``,
  outputs upsampled back,
- optional cached-feature path (``use_cache_features``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from cryovit_tpu.models.base import BaseModel
from cryovit_tpu.models.losses import dice_loss
from cryovit_tpu.models.sam2.config import SAM2Config
from cryovit_tpu.models.sam2.model import SAM2Model
from cryovit_tpu.types import ModelType

__all__ = ["SAM2", "MAX_SAM_DEPTH"]

MAX_SAM_DEPTH = 255  # reference models/sam2.py:41

_FROZEN_ROOTS = (
    "image_encoder",
    "prompt_encoder",
    "memory_encoder",
    "memory_attention",
)


class _SAM2Forward(nn.Module):
    """Resize → track → upsample wrapper module around SAM2Model."""

    cfg: SAM2Config
    dtype: Any = jnp.float32
    encoder_chunk: int = 64  # see SAM2Model.encoder_chunk
    kv_cache: bool = False  # see SAM2Model.kv_cache (measured flat; off)

    @nn.compact
    def __call__(
        self,
        data: jnp.ndarray,
        backbone: dict | None = None,
        order: jnp.ndarray | None = None,
        num_cond=None,
    ) -> dict[str, jnp.ndarray]:
        # data: (B, D, H, W, 1) voxel volumes in [0, 1]
        b, d, h, w = data.shape[:4]
        s = self.cfg.image_size
        x = data[..., 0]
        if d > MAX_SAM_DEPTH:
            x = x[:, :MAX_SAM_DEPTH]
            d = MAX_SAM_DEPTH
        if (h, w) != (s, s):
            x = jax.image.resize(x, (b, d, s, s), method="linear")
        out = SAM2Model(
            cfg=self.cfg,
            dtype=self.dtype,
            encoder_chunk=self.encoder_chunk,
            kv_cache=self.kv_cache,
            name="sam",
        )(x, backbone, order=order, num_cond=num_cond)
        preds, prompts = out["preds"], out["prompts"]
        if (h, w) != (s, s):
            preds = jax.image.resize(preds, (b, d, h, w), method="linear")
            prompts = jax.image.resize(prompts, (b, d, h, w), method="linear")
        pad = data.shape[1] - d
        if pad:
            preds = jnp.pad(preds, ((0, 0), (0, pad), (0, 0), (0, 0)))
            prompts = jnp.pad(prompts, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return {"preds": preds, "prompts": nn.sigmoid(prompts)}


class SAM2(BaseModel):
    """SAM2/MedSAM family (reference ``models/sam2.py``)."""

    model_type = ModelType.SAM2

    def __init__(self, **kwargs: Any) -> None:
        custom = dict(kwargs.get("custom_kwargs") or {})
        # code default mirrors the reference config surface
        # (reference configs/model/default_sam.yaml:6)
        self.prompt_lr = float(custom.pop("prompt_lr", 1e-4))
        self.use_cache_features = bool(custom.pop("use_cache_features", False))
        self.encoder_chunk = int(custom.pop("encoder_chunk", 64))
        self.num_init_cond_slices = tuple(custom.pop("num_init_cond_slices", (1, 1)))
        self.rand_init_cond_slices = tuple(
            custom.pop("rand_init_cond_slices", (True, False))
        )
        self.train_mode = False  # toggled by the Trainer around fit epochs
        kwargs["custom_kwargs"] = custom
        super().__init__(**kwargs)
        if self.name.lower().startswith("medsam"):
            self.model_type = ModelType.MEDSAM

    def build_module(self) -> nn.Module:
        import dataclasses

        cfg = (
            SAM2Config.medsam_tiny()
            if str(self.name).lower().startswith("medsam")
            else SAM2Config.large()
        )
        if self.custom_kwargs.get("test_config"):
            cfg = SAM2Config.tiny_test()
        max_cond = max(1, *map(int, self.num_init_cond_slices))
        if max_cond > cfg.max_cond_slices:
            cfg = dataclasses.replace(cfg, max_cond_slices=max_cond)
        self.sam_cfg = cfg
        return _SAM2Forward(
            cfg=cfg, dtype=self.dtype, encoder_chunk=self.encoder_chunk
        )

    # ---- pretrained weights ---------------------------------------------

    def load_pretrained_variables(self, sam_dir) -> dict | None:
        """Locate and load pretrained SAM2/MedSAM weights from ``sam_dir``
        (reference ``create_sam_model_from_weights``,
        ``models/sam2.py:802-842``, fed from ``model_dir/SAM2``).

        Accepts either a converted flax msgpack (``tools/convert_sam2.py``)
        or the raw published torch checkpoint. Returns a PARTIAL variables
        tree to overlay on ``model.init`` output via ``merge_variables``
        (the PromptPredictor and LoRA adapters stay freshly initialized,
        as in the reference, which applies LoRA after the strict load).
        Returns None with a warning when no file exists — the reference
        downloads from HF hub; this environment has no network, so random
        initialization is the documented fallback.
        """
        import logging
        from pathlib import Path

        log = logging.getLogger(__name__)
        sam_dir = Path(sam_dir)
        medsam = self.model_type == ModelType.MEDSAM
        candidates = (
            ["medsam2_weights.msgpack", "MedSAM2_latest.pt"]
            if medsam
            else ["sam2_weights.msgpack", "sam2.1_hiera_large.pt"]
        )
        for name in candidates:
            path = sam_dir / name
            if not path.exists():
                continue
            if path.suffix == ".msgpack":
                from flax.serialization import msgpack_restore

                log.info("loading converted SAM2 weights from %s", path)
                return msgpack_restore(path.read_bytes())
            import torch

            from cryovit_tpu.models.sam2.convert import convert_sam2_state_dict

            log.info("converting torch SAM2 checkpoint %s", path)
            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "model" in sd:
                sd = sd["model"]
            return convert_sam2_state_dict(sd, self.sam_cfg)
        log.warning(
            "no pretrained SAM2 weights found in %s (looked for %s); "
            "training from random initialization",
            sam_dir,
            ", ".join(candidates),
        )
        return None

    # ---- forward ---------------------------------------------------------

    def _sample_cond_slices(self, d_eff: int, min_slices: int):
        """Random conditioning-slice draw (reference
        ``prepare_prompt_inputs``, models/sam2.py:404-443): train mode picks
        ``k ~ U[1, num_init_cond_slices[0]]`` (when rand flag set) and the
        cond set ``{0} ∪ sample(1..min_slices)``; eval uses the fixed eval
        count. Returns (order, num_cond) numpy arrays or (None, None) for
        the default single-cond path."""
        import numpy as np

        phase = 0 if self.train_mode else 1
        n = int(self.num_init_cond_slices[phase])
        if n <= 1:
            return None, None
        if self.rand_init_cond_slices[phase]:
            n = int(np.random.randint(1, n + 1))
        n = min(n, min_slices)
        cond = [0]
        if n > 1:
            cond += np.random.choice(
                np.arange(1, min_slices), size=n - 1, replace=False
            ).tolist()
        rest = [i for i in range(d_eff) if i not in cond]
        order = np.asarray(cond + rest, dtype=np.int32)
        return order, np.int32(len(cond))

    def prepare_inputs(self, data, items):
        """Use cached ``sam_features`` pyramids when available
        (reference ``use_cache_features``, ``models/sam2.py:349-358``), and
        attach the conditioning-slice draw for multi-cond training."""
        import numpy as np

        data = jnp.asarray(data)
        d_eff = min(int(data.shape[1]), MAX_SAM_DEPTH)
        min_slices = d_eff
        if items:
            min_slices = min(
                min(int(it.label.shape[0]) for it in items), d_eff
            )
        order, num_cond = self._sample_cond_slices(d_eff, max(min_slices, 1))
        extra = {}
        if order is not None:
            extra = {
                "order": jnp.asarray(order),
                "num_cond": jnp.asarray(num_cond),
            }
        if not self.use_cache_features or not items:
            return {"slices": data, **extra} if extra else data
        aux = items[0].aux_data or {}
        if "sam_features" not in aux or len(items) != 1:
            return {"slices": data, **extra} if extra else data
        cached = aux["sam_features"]
        # match the forward's depth truncation (cached pyramids must stay
        # consistent with the slices the tracking scan actually sees)
        d_pad = min(data.shape[1], MAX_SAM_DEPTH)

        def to_flat(levels):
            out = []
            for arr in levels:
                # file layout (D, C, h, w) → flat channels-last (B·D, h, w, C)
                cl = np.moveaxis(np.asarray(arr, dtype=np.float32), 1, -1)
                if cl.shape[0] < d_pad:
                    cl = np.pad(
                        cl, ((0, d_pad - cl.shape[0]), (0, 0), (0, 0), (0, 0))
                    )
                out.append(jnp.asarray(cl[:d_pad]))
            return tuple(out)

        backbone = {
            "backbone_fpn": to_flat(cached["backbone_fpn"]),
            "vision_pos_enc": to_flat(cached["vision_pos_enc"]),
        }
        return {"slices": data, "backbone": backbone, **extra}

    def _stop_frozen(self, variables):
        """`stop_gradient` on every frozen parameter group (reference:
        `requires_grad_(False)` on encoder/prompt-encoder/memory modules and
        the decoder base, models/sam2.py:69-79). Without this the generic
        train step differentiates THROUGH the frozen Hiera encoder — a
        backward pass (and activation liveness) that the reference never
        pays; with it XLA dead-code-eliminates the entire frozen backward."""
        flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
        return jax.tree_util.tree_unflatten(
            treedef,
            [
                jax.lax.stop_gradient(leaf)
                if self._param_group(path) == "frozen"
                else leaf
                for path, leaf in flat
            ],
        )

    def apply(self, variables: Any, data) -> jnp.ndarray:
        return self.apply_with_aux(variables, data)[0]

    def apply_with_aux(self, variables: Any, data):
        variables = self._stop_frozen(variables)
        if isinstance(data, dict):
            out = self.module.apply(
                variables,
                data["slices"],
                data.get("backbone"),
                order=data.get("order"),
                num_cond=data.get("num_cond"),
            )
        else:
            out = self.module.apply(variables, data)
        return out["preds"], {"prompts": out["prompts"]}

    def compute_losses(self, y_pred, y_true, mask, aux=None, axis_name=None):
        losses = super().compute_losses(y_pred, y_true, mask, axis_name=axis_name)
        if aux and "prompts" in aux:
            # dice loss on the predicted dense prompts (reference
            # ``models/sam2.py:145-148``), supervising the PromptPredictor
            losses["mask_loss"] = dice_loss(
                aux["prompts"], y_true, mask, axis_name=axis_name
            )
            losses["total"] = losses["total"] + losses["mask_loss"]
        return losses

    # ---- optimizer with parameter groups --------------------------------

    @staticmethod
    def _param_group(path: tuple) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys)
        if "prompt_predictor" in joined:
            return "prompt"
        if any(root in joined for root in _FROZEN_ROOTS):
            return "frozen"
        if "mask_decoder" in joined:
            # decoder base frozen; only LoRA adapters train
            return "train" if ("w_a" in joined or "w_b" in joined) else "frozen"
        return "train"

    def make_optimizer(
        self,
        gradient_clip_val: float | None = None,
        gradient_clip_algorithm: str = "norm",
        lr: float | None = None,
    ) -> optax.GradientTransformation:
        def label_fn(params):
            flat = jax.tree_util.tree_flatten_with_path(params)
            paths, treedef = flat
            return jax.tree_util.tree_unflatten(
                treedef, [self._param_group(p) for p, _ in paths]
            )

        base_lr = lr if lr is not None else self.lr
        groups = {
            "train": optax.adamw(base_lr, weight_decay=self.weight_decay),
            "prompt": optax.adamw(self.prompt_lr, weight_decay=self.weight_decay),
            "frozen": optax.set_to_zero(),
        }
        tx = optax.multi_transform(groups, label_fn)
        if gradient_clip_val is not None:
            clip = (
                optax.clip_by_global_norm(float(gradient_clip_val))
                if gradient_clip_algorithm == "norm"
                else optax.clip(float(gradient_clip_val))
            )
            return optax.chain(clip, tx)
        return tx
