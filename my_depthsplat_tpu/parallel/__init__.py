from .mesh import MeshCfg, batch_sharding, make_mesh, replicated, shard_batch
from .ring import ring_cross_view_attention

__all__ = [
    "MeshCfg",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "ring_cross_view_attention",
    "shard_batch",
]
