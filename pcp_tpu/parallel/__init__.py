from .mesh import make_mesh, batch_sharding, replicated, shard_batch, replicate_state
from .collective import (
    all_gather_objects,
    average_reduce_value,
    get_dist_info,
    merge_results_dist,
    reduce_dict,
)
