from .mesh import make_mesh, shard_batch, replicate, data_sharding  # noqa: F401
from . import multihost  # noqa: F401
