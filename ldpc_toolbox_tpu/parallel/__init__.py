from .mesh import default_mesh, shard_batch  # noqa: F401
