"""Mesh / sharding utilities for episode-parallel TPU training."""
from .mesh import (
    DATA_AXIS,
    distribute_local_episodes,
    episode_sharding,
    MODEL_AXIS,
    make_mesh,
    make_mesh_2d,
    make_sharded_eval,
    make_sharded_train_step,
    replicate_tree,
    tensor_sharding_rules,
    replicated,
    shard_episode_batch,
    wrap_pad_episodes,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh_2d", "tensor_sharding_rules", "distribute_local_episodes", "episode_sharding", "make_mesh", "make_sharded_eval", "make_sharded_train_step",
    "replicate_tree", "replicated", "shard_episode_batch",
    "wrap_pad_episodes",
]
