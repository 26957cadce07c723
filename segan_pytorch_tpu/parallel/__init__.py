from .mesh import (make_mesh, initialize_distributed, shutdown_distributed,  # noqa: F401
                   distributed_barrier)
from .sharding import (  # noqa: F401
    replicate,
    shard_batch,
    shard_params,
    batch_sharding,
    replicated_sharding,
    local_host_rows,
)
from .inference import enhance_sharded, chunk_grid, overlap_add  # noqa: F401
