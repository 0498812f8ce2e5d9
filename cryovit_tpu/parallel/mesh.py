"""Mesh + sharding helpers (the whole comm story).

The reference is single-process/single-GPU (SURVEY.md §2.10) — there is no
comm protocol to mimic. The TPU-native scale-out is pure SPMD: build a
``jax.sharding.Mesh`` over the chips, shard the batch/slice axis along
``"data"`` (and optionally model-parallel axes along ``"model"``), replicate
params, and let XLA insert psum/all-gather collectives over ICI.

``mesh_shape`` config (TrainerConfig.mesh_shape): name → size mapping, −1
fills with the remaining devices, e.g. ``{"data": -1}`` or
``{"data": 4, "model": 2}``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding"]


def make_mesh(
    mesh_shape: dict[str, int] | None = None, devices=None
) -> Mesh:
    """Build a mesh from a ``{axis: size}`` spec (−1 = fill)."""
    devices = list(devices if devices is not None else jax.devices())
    spec = dict(mesh_shape or {"data": -1})
    sizes = list(spec.values())
    n = len(devices)
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {spec}")
        sizes[sizes.index(-1)] = n // fixed
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {spec} needs {total} devices, have {n}")
    mesh_devices = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(mesh_devices, tuple(spec.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits axis 0 (batch / slice stack) across ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of arrays with axis 0 sharded across the data axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
