"""The Trainer: jit-compiled train/eval/predict loops.

Replaces PyTorch Lightning (reference ``BaseTrainer`` config
``config.py:49-77`` + ``BaseModel`` step methods ``base_model.py:152-273``)
with an explicit JAX engine:

- one **donated, jitted train step** (forward + masked losses + AdamW update
  + grad-norm + train metrics in a single XLA program),
- a jitted eval step shared by val/test/predict,
- optional SPMD over a device mesh: batch axis sharded along ``"data"``,
  params replicated; XLA turns the loss/metric sums into psums over ICI,
- bf16 compute policy instead of Lightning's "16-mixed",
- static-shape bucketing means one compile per bucket, then steady-state
  steps are pure device execution.
"""

from __future__ import annotations

import dataclasses
import logging
import random
import time
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cryovit_tpu.models.base import BaseModel, prediction_mask
from cryovit_tpu.parallel.mesh import make_mesh, replicate
from cryovit_tpu.parallel.spatial import place_batch
from cryovit_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from cryovit_tpu.train.swa import StochasticWeightAveraging
from cryovit_tpu.types import BatchedModelResult, TomogramBatch, TomogramData

logger = logging.getLogger(__name__)

__all__ = ["Trainer", "TrainState", "seed_everything"]


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy and return a jax PRNG key (reference
    ``seed_everything(42, workers=True)`` at ``run/train_model.py:213``)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Device-resident training state (params + optimizer + step count)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, optimizer) -> "TrainState":
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), dtype=jnp.int32),
        )


def _global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


class Trainer:
    """Explicit training loop with the reference trainer's config surface."""

    def __init__(
        self,
        precision: str = "bf16",
        max_epochs: int | None = None,
        log_every_n_steps: int = 1,
        enable_checkpointing: bool = False,
        enable_model_summary: bool = True,
        default_root_dir: str | None = None,
        gradient_clip_val: float | None = None,
        gradient_clip_algorithm: str = "norm",
        mesh_shape: dict[str, int] | None = None,
        donate_state: bool = True,
        callbacks: Sequence[Any] = (),
        loggers: Sequence[Any] = (),
        seed: int = 42,
        **_: object,
    ) -> None:
        self.precision = precision
        self.max_epochs = max_epochs or 1
        self.log_every_n_steps = max(1, log_every_n_steps)
        self.enable_checkpointing = enable_checkpointing
        self.enable_model_summary = enable_model_summary
        self.default_root_dir = Path(default_root_dir) if default_root_dir else None
        self.gradient_clip_val = gradient_clip_val
        self.gradient_clip_algorithm = gradient_clip_algorithm
        self.mesh = make_mesh(mesh_shape) if mesh_shape else None
        self.donate_state = donate_state
        self.callbacks = list(callbacks)
        self.loggers = list(loggers)
        self.seed = seed
        self.state: TrainState | None = None
        self.logged: dict[str, float] = {}

    # ---- step builders --------------------------------------------------

    def _gspmd_kernel_guard(self):
        """XLA-conv guard for steps traced as GSPMD mesh programs only.

        Data-parallel batches run through the ``shard_map`` steps below,
        inside which every device traces its own unsharded per-shard
        program — the Pallas conv/convT kernels survive multi-chip there
        untouched. This guard covers the remaining GSPMD fallbacks (the
        depth-sharded batch=1 path of ``parallel/spatial.py`` and the
        replicate fallback), where the decoder inputs themselves are
        sharded inside one traced program and GSPMD cannot partition a
        pallas_call. Scoped per call: the flag is read at trace time, and
        jit caches keep each step's traced choice for its lifetime."""
        import contextlib

        if self.mesh is None or self.mesh.size <= 1:
            return contextlib.nullcontext()

        from cryovit_tpu.ops.conv3d_dm import set_conv3d_kernel
        from cryovit_tpu.ops.window_attention import set_window_kernel

        @contextlib.contextmanager
        def guard():
            set_conv3d_kernel(False)
            set_window_kernel(False)
            try:
                yield
            finally:
                set_conv3d_kernel(None)
                set_window_kernel(None)

        return guard()

    def _dp_eligible(self, inputs, label) -> bool:
        """Whether a batch can take the shard_map data-parallel step: plain
        array inputs (SAM2's dict pyramids stay on the GSPMD path) whose
        batch axis divides the mesh."""
        if self.mesh is None or self.mesh.size <= 1:
            return False
        if isinstance(inputs, dict) or not hasattr(inputs, "shape"):
            return False
        n = self.mesh.shape.get("data", self.mesh.size)
        if n != self.mesh.size:
            return False  # model-parallel meshes keep the GSPMD path
        return inputs.shape[0] % n == 0 and label.shape[0] % n == 0

    def _train_step_fn(self, model: BaseModel, optimizer) -> Callable:
        def step(state: TrainState, data, label):
            def loss_fn(params):
                preds, aux = model.apply_with_aux(params, data)
                mask = prediction_mask(label)
                losses = model.compute_losses(preds, label, mask, aux=aux)
                return losses["total"], (losses, preds, mask)

            (_, (losses, preds, mask)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params, opt_state, state.step + 1)
            logs = {f"train_{k}": v for k, v in losses.items()}
            logs.update(
                {f"train_{k}": v for k, v in model.compute_metrics(preds, label, mask).items()}
            )
            # reference logs the post-clip norm (base_model.py:77-89);
            # we log both — pre-clip is what explosion monitoring needs.
            pre_norm = _global_norm(grads)
            logs["grad_norm_preclip"] = pre_norm
            logs["grad_norm"] = self._postclip_norm(grads, pre_norm)
            return new_state, logs

        donate = (0,) if self.donate_state else ()
        return jax.jit(step, donate_argnums=donate)

    def _train_step_dp_fn(self, model: BaseModel, optimizer) -> Callable:
        """shard_map data-parallel train step (the multi-chip default).

        Each device runs the full per-shard program — forward, masked loss,
        backward — with the Pallas conv/convT kernels intact (GSPMD cannot
        partition a pallas_call; shard_map sidesteps GSPMD entirely). The
        losses/metrics psum their masked sums over ``"data"`` (exactly the
        global-batch values, see ``models/losses._gsum``), and the local
        gradients psum into the true global gradient before the (replicated)
        optimizer update. XLA compiles the psums to ICI all-reduces."""
        from jax.sharding import PartitionSpec as P

        axis = "data"

        def step(state: TrainState, data, label):
            def loss_fn(params):
                preds, aux = model.apply_with_aux(params, data)
                mask = prediction_mask(label)
                losses = model.compute_losses(
                    preds, label, mask, aux=aux, axis_name=axis
                )
                return losses["total"], (losses, preds, mask)

            (_, (losses, preds, mask)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            # the global loss is already psum-of-sums; each device's grad
            # carries only its local data's path, so the total gradient of
            # the replicated params is the psum of the local grads
            grads = jax.lax.psum(grads, axis)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params, opt_state, state.step + 1)
            logs = {f"train_{k}": v for k, v in losses.items()}
            logs.update(
                {
                    f"train_{k}": v
                    for k, v in model.compute_metrics(
                        preds, label, mask, axis_name=axis
                    ).items()
                }
            )
            pre_norm = _global_norm(grads)
            logs["grad_norm_preclip"] = pre_norm
            logs["grad_norm"] = self._postclip_norm(grads, pre_norm)
            return new_state, logs

        sharded = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P()),
            # pallas_call carries no vma annotations; out replication holds
            # by construction (grads/losses/metrics are psum-ed over axis)
            check_vma=False,
        )
        donate = (0,) if self.donate_state else ()
        return jax.jit(sharded, donate_argnums=donate)

    def _eval_step_dp_fn(self, model: BaseModel) -> Callable:
        """shard_map data-parallel eval step (no aux mask; the mito-masked
        test path keeps the GSPMD fallback). Losses/metrics are global via
        psum-of-sums; predictions come back batch-sharded."""
        from jax.sharding import PartitionSpec as P

        axis = "data"

        def step(params, data, label):
            preds, aux = model.apply_with_aux(params, data)
            mask = prediction_mask(label)
            losses = model.compute_losses(
                preds, label, mask, aux=aux, axis_name=axis
            )
            metrics = model.compute_metrics(preds, label, mask, axis_name=axis)
            return preds, losses, metrics

        return jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=(P(axis), P(), P()),
                check_vma=False,
            )
        )

    def _predict_step_dp_fn(self, model: BaseModel) -> Callable:
        from jax.sharding import PartitionSpec as P

        return jax.jit(
            jax.shard_map(
                lambda params, data: model.apply(params, data),
                mesh=self.mesh,
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        )

    def _postclip_norm(self, grads, pre_norm: jnp.ndarray) -> jnp.ndarray:
        """Global grad norm *after* clipping (reference telemetry,
        base_model.py:77-89), without splitting the optimizer chain:
        global-norm clipping rescales so the norm is min(pre, clip_val);
        value clipping needs an explicit elementwise clip."""
        if self.gradient_clip_val is None:
            return pre_norm
        clip = float(self.gradient_clip_val)
        if self.gradient_clip_algorithm == "norm":
            return jnp.minimum(pre_norm, clip)
        return _global_norm(
            jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip, clip), grads)
        )

    def _eval_step_fn(self, model: BaseModel) -> Callable:
        def step(params, data, label, aux_mask):
            preds, aux = model.apply_with_aux(params, data)
            mask = prediction_mask(label, aux_mask)
            losses = model.compute_losses(preds, label, mask, aux=aux)
            metrics = model.compute_metrics(preds, label, mask)
            return preds, losses, metrics

        return jax.jit(step)

    def _predict_step_fn(self, model: BaseModel) -> Callable:
        return jax.jit(lambda params, data: model.apply(params, data))

    # ---- data placement -------------------------------------------------

    def _place(self, batch: TomogramBatch) -> TomogramBatch:
        if self.mesh is None:
            return batch
        # batch axis if divisible, else depth axis (reference default is
        # batch = 1 tomogram — spatial sharding is the only way a mesh
        # helps there), else replicate with a warning.
        return place_batch(batch, self.mesh)

    def _log(self, step: int, logs: dict[str, Any]) -> None:
        scalars = {k: float(v) for k, v in logs.items()}
        self.logged = scalars
        for lg in self.loggers:
            if hasattr(lg, "log_scalars"):
                lg.log_scalars(scalars, step)

    # ---- fit -------------------------------------------------------------

    def fit(
        self,
        model: BaseModel,
        datamodule,
        variables=None,
        ckpt_path: str | Path | None = None,
        pretrained_variables=None,
    ) -> TrainState:
        return self._fit(
            model, datamodule, variables, ckpt_path, pretrained_variables
        )

    def _fit(
        self,
        model: BaseModel,
        datamodule,
        variables=None,
        ckpt_path: str | Path | None = None,
        pretrained_variables=None,
    ) -> TrainState:
        key = seed_everything(self.seed)
        train_loader = datamodule.train_loader()
        try:
            val_loader = datamodule.val_loader()
        except ValueError:
            val_loader = None

        first_batch, _ = next(iter(train_loader))
        if variables is None:
            variables = model.init(key, jnp.asarray(first_batch.data[:1]))
            if pretrained_variables is not None:
                # partial overlay (e.g. converted SAM2 checkpoint: every
                # module except the from-scratch PromptPredictor + LoRA)
                from cryovit_tpu.train.checkpoint import merge_variables

                variables = merge_variables(variables, pretrained_variables)
                logger.info("merged pretrained weights over initialization")
        if self.enable_model_summary:
            logger.info(
                "model %s: %.2fM params", model.name, model.param_count(variables) / 1e6
            )

        optimizer = model.make_optimizer(
            gradient_clip_val=self.gradient_clip_val,
            gradient_clip_algorithm=self.gradient_clip_algorithm,
        )
        state = TrainState.create(variables, optimizer)
        start_epoch = 0
        if ckpt_path is not None and Path(ckpt_path).exists():
            restored = restore_checkpoint(
                ckpt_path,
                template={"state": state, "epoch": 0},
            )
            state = jax.tree_util.tree_map(jnp.asarray, restored["state"])
            if not isinstance(state, TrainState):
                state = TrainState(**state) if isinstance(state, dict) else state
            start_epoch = int(restored["epoch"])
            logger.info("resumed from %s at epoch %d", ckpt_path, start_epoch)

        if self.mesh is not None:
            state = replicate(state, self.mesh)

        train_step = self._train_step_fn(model, optimizer)
        eval_step = self._eval_step_fn(model)
        multi = self.mesh is not None and self.mesh.size > 1
        train_step_dp = self._train_step_dp_fn(model, optimizer) if multi else None
        eval_step_dp = self._eval_step_dp_fn(model) if multi else None
        swa = next(
            (c for c in self.callbacks if isinstance(c, StochasticWeightAveraging)),
            None,
        )

        prepare = getattr(model, "prepare_inputs", None)
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.perf_counter()
            train_loader.set_epoch(epoch)
            # train-phase flag for models whose input prep is phase-
            # dependent (SAM2's random conditioning-slice draw)
            model.train_mode = True
            logs: dict[str, Any] = {}
            for batch, items in train_loader:
                placed = self._place(batch)
                inputs = (
                    prepare(placed.data, items)
                    if prepare is not None
                    else jnp.asarray(placed.data)
                )
                label = jnp.asarray(placed.label)
                if train_step_dp is not None and self._dp_eligible(inputs, label):
                    state, logs = train_step_dp(state, inputs, label)
                else:
                    with self._gspmd_kernel_guard():
                        state, logs = train_step(state, inputs, label)
                step_num = int(state.step)
                if step_num % self.log_every_n_steps == 0:
                    self._log(step_num, logs)

            epoch_logs = {f"epoch_{k}": float(v) for k, v in logs.items()}
            model.train_mode = False
            if val_loader is not None:
                vals = self._run_eval_epoch(
                    eval_step, state.params, val_loader, prepare=prepare,
                    eval_step_dp=eval_step_dp,
                )
                epoch_logs.update({f"val_{k}": v for k, v in vals.items()})
            epoch_logs["epoch_time_s"] = time.perf_counter() - t0
            self._log(int(state.step), epoch_logs)

            if swa is not None:
                swa.on_train_epoch_end(epoch, self.max_epochs, state.params)
            for cb in self.callbacks:
                if hasattr(cb, "on_train_epoch_end") and not isinstance(
                    cb, StochasticWeightAveraging
                ):
                    cb.on_train_epoch_end(epoch, epoch_logs)

            if self.enable_checkpointing and self.default_root_dir is not None:
                save_checkpoint(
                    self.default_root_dir / "last.ckpt",
                    {"state": state, "epoch": epoch + 1},
                )

        if swa is not None:
            state = TrainState(swa.on_fit_end(state.params), state.opt_state, state.step)
        self.state = state
        return state

    def _run_eval_epoch(
        self, eval_step, params, loader, prepare=None, eval_step_dp=None
    ) -> dict[str, float]:
        sums: dict[str, float] = {}
        count = 0
        for batch, items in loader:
            placed = self._place(batch)
            inputs = (
                prepare(placed.data, items)
                if prepare is not None
                else jnp.asarray(placed.data)
            )
            label = jnp.asarray(placed.label)
            # fit-time validation uses only the y>-1 mask; the ground-truth
            # mito mask applies to test only (reference test_step vs
            # validation_step, base_model.py:166-241)
            if eval_step_dp is not None and self._dp_eligible(inputs, label):
                _, losses, metrics = eval_step_dp(params, inputs, label)
            else:
                with self._gspmd_kernel_guard():
                    _, losses, metrics = eval_step(params, inputs, label, None)
            for k, v in {**losses, **metrics}.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    # ---- test / predict --------------------------------------------------

    def _aux_mask(self, model: BaseModel | None, batch: TomogramBatch, items):
        """Ground-truth mito mask for granule/cristae eval (reference
        ``base_model.py:91-112`` + ``test_step``): applied when the batch
        aux data carries ``labels/mito`` and the model doesn't disable it."""
        use_mask = True
        if model is not None:
            use_mask = bool(model.custom_kwargs.get("use_mito_mask", True))
        if not use_mask:
            return None
        masks = []
        for i, item in enumerate(items):
            aux = item.aux_data or {}
            if "labels/mito" not in aux:
                return None
            m = np.zeros(batch.label.shape[1:], dtype=np.int8)
            src = aux["labels/mito"]
            m[: src.shape[0], : src.shape[1], : src.shape[2]] = src
            masks.append(m)
        return jnp.asarray(np.stack(masks))

    def test(self, model: BaseModel, variables, datamodule) -> list[BatchedModelResult]:
        return self._test(model, variables, datamodule)

    def _test(self, model, variables, datamodule) -> list[BatchedModelResult]:
        eval_step = self._eval_step_fn(model)
        multi = self.mesh is not None and self.mesh.size > 1
        eval_step_dp = self._eval_step_dp_fn(model) if multi else None
        prepare = getattr(model, "prepare_inputs", None)
        results = []
        for batch, items in datamodule.test_loader():
            placed = self._place(batch)
            aux_mask = self._aux_mask(model, batch, items)
            inputs = (
                prepare(placed.data, items)
                if prepare is not None
                else jnp.asarray(placed.data)
            )
            label = jnp.asarray(placed.label)
            if (
                eval_step_dp is not None
                and aux_mask is None
                and self._dp_eligible(inputs, label)
            ):
                preds, losses, metrics = eval_step_dp(variables, inputs, label)
            else:
                with self._gspmd_kernel_guard():
                    preds, losses, metrics = eval_step(
                        variables, inputs, label, aux_mask
                    )
            result = self._build_result(np.asarray(preds), losses, metrics, items)
            for cb in self.callbacks:
                if hasattr(cb, "on_test_batch_end"):
                    cb.on_test_batch_end(result)
            results.append(result)
        return results

    def predict(self, model: BaseModel, variables, datamodule) -> list[BatchedModelResult]:
        return self._predict(model, variables, datamodule)

    def _predict(self, model, variables, datamodule) -> list[BatchedModelResult]:
        predict_step = self._predict_step_fn(model)
        multi = self.mesh is not None and self.mesh.size > 1
        predict_step_dp = self._predict_step_dp_fn(model) if multi else None
        prepare = getattr(model, "prepare_inputs", None)
        results = []
        for batch, items in datamodule.predict_loader():
            placed = self._place(batch)
            inputs = (
                prepare(placed.data, items)
                if prepare is not None
                else jnp.asarray(placed.data)
            )
            if predict_step_dp is not None and self._dp_eligible(
                inputs, placed.label
            ):
                preds = np.asarray(predict_step_dp(variables, inputs))
            else:
                with self._gspmd_kernel_guard():
                    preds = np.asarray(predict_step(variables, inputs))
            result = self._build_result(preds, {}, {}, items)
            for cb in self.callbacks:
                if hasattr(cb, "on_predict_batch_end"):
                    cb.on_predict_batch_end(result)
            results.append(result)
        return results

    @staticmethod
    def _build_result(
        preds: np.ndarray,
        losses: dict[str, Any],
        metrics: dict[str, Any],
        items: list[TomogramData],
    ) -> BatchedModelResult:
        """Unpad per-tomogram predictions back to true volume shapes."""
        pred_list, data_list, label_list = [], [], []
        for i, item in enumerate(items):
            d, h, w = item.label.shape
            pred_list.append(preds[i, :d, :h, :w])
            label_list.append(item.label)
            aux = item.aux_data or {}
            data_list.append(np.asarray(aux.get("data", item.data[..., 0])))
        return BatchedModelResult(
            batch_size=len(items),
            samples=[it.sample for it in items],
            tomo_names=[it.tomo_name for it in items],
            split_id=[it.split_id for it in items],
            data=data_list,
            label=label_list,
            preds=pred_list,
            losses={k: float(v) for k, v in losses.items()},
            metrics={k: float(v) for k, v in metrics.items()},
        )
