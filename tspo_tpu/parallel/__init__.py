from .mesh import create_mesh, clip_param_shardings, replicated, shard_batch

__all__ = ["create_mesh", "clip_param_shardings", "replicated", "shard_batch"]
