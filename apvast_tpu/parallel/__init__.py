"""Mesh/sharding layer (survey component N3): scale-out over ICI."""

from apvast_tpu.parallel.mesh import (
    make_mesh,
    shard_fd_state,
    shard_plan,
    shard_scene_batch,
    sharded_multi_scene_fd_hop,
    sharded_multi_scene_hop,
)

__all__ = [
    "make_mesh",
    "shard_fd_state",
    "shard_plan",
    "shard_scene_batch",
    "sharded_multi_scene_fd_hop",
    "sharded_multi_scene_hop",
]
