from sniper_tpu.parallel.mesh import make_mesh, shard_batch

__all__ = ["make_mesh", "shard_batch"]
