from .distributed import initialize_distributed
from .mesh import MeshCfg, batch_sharding, make_mesh, replicated, shard_batch
from .ring import ring_cross_view_attention

__all__ = [
    "MeshCfg",
    "initialize_distributed",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "ring_cross_view_attention",
    "shard_batch",
]
