from .batching import (BatchedEngine, init_batch_state, make_batched_step,
                       sample_stiffness)
from .groups import Group, GroupedSceneEngine
from .hetero import HeteroBatch, HeteroEngine, make_hetero_step
from .sharding import (make_data_parallel_step, make_mesh,
                       make_mesh_sharded_step, make_sharded_step,
                       make_vertex_sharded_step,
                       make_xpbd_sharded_step,
                       make_xpbd_vertex_sharded_step, shard_batch)

__all__ = [
    "BatchedEngine", "init_batch_state", "make_batched_step",
    "sample_stiffness", "make_mesh", "make_mesh_sharded_step",
    "make_xpbd_sharded_step", "make_sharded_step",
    "make_vertex_sharded_step",
    "make_xpbd_vertex_sharded_step",
    "make_data_parallel_step", "shard_batch",
    "Group", "GroupedSceneEngine", "HeteroBatch", "HeteroEngine",
    "make_hetero_step",
]
