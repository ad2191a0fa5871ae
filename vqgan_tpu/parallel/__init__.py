from .mesh import (
    data_sharding,
    is_main_process,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)
