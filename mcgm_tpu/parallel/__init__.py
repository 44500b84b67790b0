from .mesh import (make_mesh, shard_batch, replicate, data_sharding,  # noqa: F401
                   shard_params, state_shardings, with_state_shardings)
from . import multihost  # noqa: F401
