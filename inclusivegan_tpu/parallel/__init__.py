from .mesh import make_data_mesh, shard_batch, replicate  # noqa: F401
