from ventjax.dist.mesh import (
    initialize_multihost,
    make_batch_mesh,
    make_batch_space_mesh,
    shard_cohort_fn,
    spatial_shard_fn,
)

__all__ = [
    "initialize_multihost",
    "make_batch_mesh",
    "make_batch_space_mesh",
    "shard_cohort_fn",
    "spatial_shard_fn",
]
