"""Distributed runtime: mesh, shardings, multi-host init (layer T5)."""

from blockpuzzle_tpu.dist.mesh import (
    ENV_AXIS,
    MODEL_AXIS,
    env_sharding,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch_axis,
)
from blockpuzzle_tpu.dist.sharding import (
    batched_spec,
    param_spec,
    to_named,
    train_state_spec,
)

__all__ = [
    "ENV_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "init_distributed",
    "env_sharding",
    "replicated",
    "shard_batch_axis",
    "param_spec",
    "batched_spec",
    "train_state_spec",
    "to_named",
]
