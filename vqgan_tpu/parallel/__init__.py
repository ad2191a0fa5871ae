from .init import (
    barrier,
    initialize_distributed,
    make_global_array,
    process_local_batch_size,
)
from .mesh import (
    data_sharding,
    is_main_process,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)
from .fsdp import (
    apply_fsdp_sharding,
    compose_fsdp_with_tp,
    fsdp_spec_for,
    place_state,
    sharding_spec_for,
)
from .pp import (
    make_pipeline_mesh,
    pipeline_apply,
    shard_stacked_params,
    stack_params,
)
from .tp import apply_tp_sharding, tp_spec_for_path
