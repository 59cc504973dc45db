from incagg_gnn_tpu.parallel.layout import ShardLayout, build_shard_layout
from incagg_gnn_tpu.parallel.mesh import make_mesh
from incagg_gnn_tpu.parallel.spatial import ShardedVRTrainer

__all__ = ["ShardLayout", "build_shard_layout", "make_mesh", "ShardedVRTrainer"]
