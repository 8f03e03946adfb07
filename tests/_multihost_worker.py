"""Worker process for the 2-process jax.distributed test.

Usage: python tests/_multihost_worker.py <coordinator_port> <process_id>

Each of the 2 processes contributes 2 fake CPU devices (global mesh of 4),
initializes the multi-host runtime through ventjax.dist.initialize_multihost,
assembles a globally-sharded cohort from process-local data, runs the fused
pipeline under shard_map over the global ("batch",) mesh, and checks its
local lanes bit-match the locally-computed unsharded pipeline.
"""
import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ventjax.dist import initialize_multihost  # noqa: E402

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from ventjax.config import DEFAULT_CONFIG  # noqa: E402
from ventjax.dist import make_batch_mesh, shard_cohort_fn  # noqa: E402
from ventjax.io.phantom import make_cohort  # noqa: E402
from ventjax.pipeline import analyze_cohort  # noqa: E402
from ventjax.pipeline.analyze import build_geometry  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 4

shape = (32, 32, 8)
vox = (1.5, 1.5, 10.0)
cfg = DEFAULT_CONFIG.replace(
    ci_max_defect_voxels=256, ci_rmax=12, n4_fitting_levels=2, n4_max_iters=10
)
geom = build_geometry(vox, shape, cfg)

# All 4 subjects generated deterministically in both processes; each process
# owns lanes [2*pid, 2*pid+2).
hp, mask, _ = make_cohort(4, shape=shape, vox=vox, seed=0)
local_hp = jnp.asarray(hp[2 * pid:2 * pid + 2])
local_mask = jnp.asarray(mask[2 * pid:2 * pid + 2])

mesh = make_batch_mesh()  # global: 4 devices across the 2 processes
g_hp = multihost_utils.host_local_array_to_global_array(
    np.asarray(local_hp), mesh, P("batch")
)
g_mask = multihost_utils.host_local_array_to_global_array(
    np.asarray(local_mask), mesh, P("batch")
)

fn = jax.jit(shard_cohort_fn(
    lambda h, m: analyze_cohort(h, m, geom, cfg), mesh
))
res = fn(g_hp, g_mask)

local_vdp = multihost_utils.global_array_to_host_local_array(
    res.metrics.vdp, mesh, P("batch")
)
local_ci = multihost_utils.global_array_to_host_local_array(
    res.metrics.ci, mesh, P("batch")
)

# Local ground truth: the unsharded pipeline on this process's own lanes.
ref = analyze_cohort(local_hp, local_mask, geom, cfg)
np.testing.assert_array_equal(np.asarray(local_vdp), np.asarray(ref.metrics.vdp))
np.testing.assert_array_equal(np.asarray(local_ci), np.asarray(ref.metrics.ci))
assert np.all(np.isfinite(np.asarray(local_vdp)))

print(f"MULTIHOST_OK pid={pid} vdp={np.round(np.asarray(local_vdp), 3)}",
      flush=True)
