from maskdit_tpu.parallel.mesh import (
    AXES,
    batch_sharding,
    batch_spec,
    create_mesh,
    param_specs,
    replicated,
    shardings_for,
)
from maskdit_tpu.parallel.dist import (
    all_reduce_mean_scalar,
    all_reduce_sum_array,
    barrier,
    init_distributed,
    is_main_process,
    mprint,
    process_count,
    process_index,
)

__all__ = [
    "AXES", "batch_sharding", "batch_spec", "create_mesh", "param_specs",
    "replicated", "shardings_for", "all_reduce_mean_scalar",
    "all_reduce_sum_array", "barrier",
    "init_distributed", "is_main_process", "mprint", "process_count",
    "process_index",
]
