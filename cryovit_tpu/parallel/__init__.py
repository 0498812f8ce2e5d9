"""Device mesh construction and sharding rules."""

from cryovit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from cryovit_tpu.parallel.spatial import (
    place_batch,
    shard_batch_spatial,
    spatial_batch_sharding,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "place_batch",
    "shard_batch_spatial",
    "spatial_batch_sharding",
]
