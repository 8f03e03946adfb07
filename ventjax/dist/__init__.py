from ventjax.dist.mesh import make_batch_mesh, shard_cohort_fn, initialize_multihost

__all__ = ["make_batch_mesh", "shard_cohort_fn", "initialize_multihost"]
