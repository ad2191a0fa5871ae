from .mesh import (
    data_sharding,
    is_main_process,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
