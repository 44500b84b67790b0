from .mesh import (make_mesh, shard_batch, replicate, data_sharding,  # noqa: F401
                   make_seed_mesh, make_spatial_mesh, shard_batch_spatial,
                   spatial_data_sharding,
                   shard_params, state_shardings, with_state_shardings)
from .pipeline import (make_pipe_mesh, pipeline_scan,  # noqa: F401
                       set_pipeline_mesh, shard_stacked_over_pipe)
from . import multihost  # noqa: F401
