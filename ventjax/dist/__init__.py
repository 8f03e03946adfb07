from ventjax.dist.halo import (
    calculate_ci_sharded,
    halo_width,
    make_sliced_ci_fn,
    padded_depth_for,
)
from ventjax.dist.mesh import (
    initialize_multihost,
    make_batch_mesh,
    make_batch_space_mesh,
    shard_cohort_fn,
    spatial_shard_fn,
)

__all__ = [
    "calculate_ci_sharded",
    "halo_width",
    "initialize_multihost",
    "make_batch_mesh",
    "make_batch_space_mesh",
    "make_sliced_ci_fn",
    "padded_depth_for",
    "shard_cohort_fn",
    "spatial_shard_fn",
]
