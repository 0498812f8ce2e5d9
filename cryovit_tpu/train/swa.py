"""Stochastic Weight Averaging.

Parity target: reference ``configs/callbacks/stochastic_weight_average.yaml``
— Lightning's SWA with ``swa_lrs = model.lr``, ``swa_epoch_start = 0.8``,
``annealing_epochs = 0``: i.e. keep the same constant LR and average the
weights of the last 20% of epochs, swapping the average in at the end of
training. (The models use Group/Instance norm, so no BN re-estimation pass
is needed.)

The average lives on device as a pytree and updates with a fused
``tree_map`` — no host round-trips.
"""

from __future__ import annotations

import jax

__all__ = ["StochasticWeightAveraging"]


class StochasticWeightAveraging:
    """Callback: running parameter average over the SWA window."""

    def __init__(
        self,
        swa_lrs: float | None = None,
        swa_epoch_start: float = 0.8,
        annealing_epochs: int = 0,
        **_: object,
    ) -> None:
        self.swa_lrs = swa_lrs  # kept for config parity; LR stays constant
        self.swa_epoch_start = float(swa_epoch_start)
        self.annealing_epochs = annealing_epochs
        self.swa_params = None
        self.count = 0

    def start_epoch(self, max_epochs: int) -> int:
        return int(self.swa_epoch_start * max_epochs)

    def on_train_epoch_end(self, epoch: int, max_epochs: int, params) -> None:
        if epoch + 1 <= self.start_epoch(max_epochs):
            return
        if self.swa_params is None:
            # deep-copy: the live TrainState buffers get donated by the next
            # jitted train step; aliasing them here would read deleted arrays
            import jax.numpy as jnp

            self.swa_params = jax.tree_util.tree_map(jnp.copy, params)
            self.count = 1
            return
        n = self.count
        self.swa_params = jax.tree_util.tree_map(
            lambda avg, p: (avg * n + p) / (n + 1), self.swa_params, params
        )
        self.count = n + 1

    def on_fit_end(self, params):
        """Return the averaged params (or the input if SWA never started)."""
        return self.swa_params if self.swa_params is not None else params
