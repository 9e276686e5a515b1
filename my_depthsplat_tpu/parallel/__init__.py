from .mesh import MeshCfg, batch_sharding, make_mesh, replicated, shard_batch

__all__ = ["MeshCfg", "batch_sharding", "make_mesh", "replicated", "shard_batch"]
