"""Device mesh construction and sharding rules."""

from cryovit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding"]
