"""Model family wrappers: hparams + flax module + losses/metrics.

Parity target: reference ``models/base_model.py`` (LightningModule holding
AdamW hparams, loss dict, per-phase metrics, masked prediction). Here the
wrapper is a thin, *stateless* recipe object — the actual training state
(params/opt state) lives in ``cryovit_tpu.train`` — so every step function
stays a pure jittable function.

Masked prediction semantics (reference ``base_model.py:91-112``): the loss
mask is ``y_true > -1`` (−1 = unlabeled voxels and depth padding), optionally
AND-ed with a ground-truth mito mask for granule/cristae evaluation
(``custom_kwargs.use_mito_mask``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from cryovit_tpu.types import ModelType

__all__ = ["BaseModel", "prediction_mask"]

LossFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _call_masked_fn(fn, y_pred, y_true, mask, axis_name):
    """Call a loss/metric fn, forwarding ``axis_name`` when it takes one.

    Built-in losses/metrics accept ``axis_name`` and psum their sums across
    the shard_map data axis; user-supplied callables without the parameter
    run shard-locally (the trainer then only uses them via the GSPMD path,
    where sums are global by construction)."""
    if axis_name is None:
        return fn(y_pred, y_true, mask)
    try:
        import inspect

        params = inspect.signature(fn).parameters
        takes_axis = "axis_name" in params or any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
    except (TypeError, ValueError):
        takes_axis = False
    if takes_axis:
        return fn(y_pred, y_true, mask, axis_name=axis_name)
    return fn(y_pred, y_true, mask)


def prediction_mask(
    y_true: jnp.ndarray, aux_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Valid-voxel mask: ``y_true > -1``, optionally AND ground-truth aux mask."""
    mask = y_true > -1
    if aux_mask is not None:
        mask = jnp.logical_and(mask, aux_mask > 0)
    return mask


class BaseModel:
    """Abstract model family (reference ``base_model.py:20-56``).

    Subclasses define :meth:`build_module` returning the flax module and set
    ``model_type``. The wrapper is consumed by the train/eval loops and by
    the ``.model`` artifact exporter.
    """

    model_type: ModelType
    # set by the Trainer around train epochs; consumed by families whose
    # input preparation is phase-dependent (SAM2 cond-slice sampling)
    train_mode: bool = False

    def __init__(
        self,
        name: str,
        input_key: str,
        lr: float,
        losses: dict[str, LossFn],
        metrics: dict[str, LossFn],
        weight_decay: float = 1e-3,
        model_dir: str | None = None,
        custom_kwargs: dict[str, Any] | None = None,
        dtype: jnp.dtype = jnp.float32,
    ) -> None:
        self.name = name
        self.input_key = input_key
        self.lr = float(lr)
        self.weight_decay = float(weight_decay)
        self.model_dir = model_dir
        self.custom_kwargs = dict(custom_kwargs or {})
        self.dtype = dtype
        self.losses = dict(losses)
        self.metrics = dict(metrics)
        self.module: nn.Module = self.build_module()

    # ---- to be provided by subclasses ---------------------------------

    def build_module(self) -> nn.Module:
        raise NotImplementedError

    # ---- parameter / forward plumbing ----------------------------------

    def init(self, rng: jax.Array, sample_input: jnp.ndarray) -> Any:
        """Initialize module variables from a sample input batch."""
        return self.module.init(rng, sample_input)

    def apply(self, variables: Any, data: jnp.ndarray) -> jnp.ndarray:
        """Forward pass: ``(B, D, H, W, C)`` → probabilities ``(B, D, H, W)``."""
        return self.module.apply(variables, data)

    def apply_with_aux(
        self, variables: Any, data: jnp.ndarray
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        """Forward pass returning (probs, aux outputs). Aux outputs feed
        model-specific loss terms (e.g. SAM2's prompt mask loss)."""
        return self.apply(variables, data), {}

    def param_count(self, variables: Any) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(variables))

    # ---- losses / metrics ----------------------------------------------

    def compute_losses(
        self,
        y_pred: jnp.ndarray,
        y_true: jnp.ndarray,
        mask: jnp.ndarray,
        aux: dict[str, jnp.ndarray] | None = None,
        axis_name: str | None = None,
    ) -> dict[str, jnp.ndarray]:
        """Evaluate all losses and sum into ``total`` (reference
        ``base_model.py:114-119``). Keys are the config names (``dice_loss``)
        — they flow into the metrics CSVs, so they must match the reference
        column names. ``aux`` carries model-specific extra outputs.

        ``axis_name`` names a ``shard_map`` data-parallel axis: losses that
        support it psum their masked sums across shards so the dp loss is
        exactly the global-batch loss (``train/loop.py`` dp step)."""
        out = {
            key: _call_masked_fn(fn, y_pred, y_true, mask, axis_name)
            for key, fn in self.losses.items()
        }
        out["total"] = sum(out.values())
        return out

    def compute_metrics(
        self,
        y_pred: jnp.ndarray,
        y_true: jnp.ndarray,
        mask: jnp.ndarray,
        axis_name: str | None = None,
    ) -> dict[str, jnp.ndarray]:
        """Metric keys are config names (``dice_metric``/``f1_metric``),
        matching the reference CSV columns (``callbacks.py:145-206``)."""
        return {
            key: _call_masked_fn(fn, y_pred, y_true, mask, axis_name)
            for key, fn in self.metrics.items()
        }

    # ---- optimizer -------------------------------------------------------

    def make_optimizer(
        self,
        gradient_clip_val: float | None = None,
        gradient_clip_algorithm: str = "norm",
        lr: float | None = None,
    ) -> optax.GradientTransformation:
        """AdamW(lr, weight_decay) with optional gradient clipping
        (reference ``base_model.py:58-63``, ``configs/trainer_model/sam2.yaml``)."""
        chain = []
        if gradient_clip_val is not None:
            if gradient_clip_algorithm == "norm":
                chain.append(optax.clip_by_global_norm(float(gradient_clip_val)))
            else:
                chain.append(optax.clip(float(gradient_clip_val)))
        chain.append(
            optax.adamw(
                learning_rate=lr if lr is not None else self.lr,
                weight_decay=self.weight_decay,
            )
        )
        return optax.chain(*chain)
