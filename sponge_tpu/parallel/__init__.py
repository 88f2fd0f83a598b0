"""Multi-device distribution: mesh setup, sharded permutation, sharded Merkle."""

from .mesh import DATA_AXIS, batch_sharding, leaf_sharding, make_mesh, replicated
from .merkle import (
    sharded_merkle_root,
    sharded_merkle_root_jive,
    sharded_merkle_root_wide,
    sharded_merkle_verify_batch,
)
from .sharded import sharded_permute_fn, sharded_state, sharded_transcript_fn

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "leaf_sharding",
    "make_mesh",
    "replicated",
    "sharded_merkle_root",
    "sharded_merkle_root_jive",
    "sharded_merkle_root_wide",
    "sharded_merkle_verify_batch",
    "sharded_permute_fn",
    "sharded_state",
    "sharded_transcript_fn",
]
