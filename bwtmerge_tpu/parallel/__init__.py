"""Multi-chip parallelism: device meshes, sequence-block sharding, sharded
search and verification (TPU analog of the reference's thread layer)."""

from .mesh import (
    SEQ_AXIS,
    make_mesh,
    sequence_shards,
    sharded_backward_search,
    sharded_rank_array,
)

__all__ = [
    "SEQ_AXIS",
    "make_mesh",
    "sequence_shards",
    "sharded_backward_search",
    "sharded_rank_array",
]
