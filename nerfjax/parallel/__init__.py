from nerfjax.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
from nerfjax.parallel.distributed import (
    init_distributed,
    process_batch_slice,
    put_process_local,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "replicated_sharding",
    "init_distributed",
    "process_batch_slice",
    "put_process_local",
]
