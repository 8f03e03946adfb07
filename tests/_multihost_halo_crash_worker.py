"""Worker for the halo-CI FAILURE-INJECTION test (round-5 VERDICT item 6c).

Usage: python tests/_multihost_halo_crash_worker.py <port> <pid> <crash_pid>

Same 2-process / 4-device ("space",) setup as _multihost_halo_worker.py,
but the process whose id equals <crash_pid> os._exit(42)s right before
dispatching the sharded CI program — one shard of the halo exchange dies
mid-job.  The fail-stop property under test: the SURVIVOR never completes
with a silently wrong CI map — its collectives error out (distributed
runtime heartbeat) or wedge until the parent kills it.  Recovery is a
fresh run (the halo op is a pure computation: restart = recompute), which
the parent test then performs with crash_pid=-1 and asserts bit-equality.
"""
import os
import sys

port, pid, crash_pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ventjax.dist import initialize_multihost  # noqa: E402

# Short heartbeat/timeout knobs so the survivor detects the death in
# seconds rather than the (minutes-scale) defaults.
os.environ.setdefault("JAX_COORDINATION_SERVICE_HEARTBEAT_TIMEOUT", "5")

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from ventjax.dist.halo import make_sliced_ci_fn  # noqa: E402
from ventjax.ops.ci_pairwise import (  # noqa: E402
    build_ci_pairwise_geometry,
    calculate_ci_pairwise,
)

H, W, D = 32, 32, 32
geom = build_ci_pairwise_geometry((1.5, 1.5, 10.0), (H, W, D), 16, "wrap")

rng = np.random.default_rng(7)
defect = (rng.random((H, W, D)) > 0.99).astype(np.float32)
defect[8:16, 8:16, 13:19] = 1  # cluster straddling the process boundary

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("space",))
dl = D // 4
local = defect[:, :, 2 * pid * dl:(2 * pid + 2) * dl]
g_defect = multihost_utils.host_local_array_to_global_array(
    local, mesh, P(None, None, "space")
)

# Both processes reach this barrier (runtime fully up, program about to
# run), THEN the designated process dies — the worst time for a shard to
# vanish: its halo neighbors are already committed to the exchange.
multihost_utils.sync_global_devices("halo_crash_armed")
if pid == crash_pid:
    os._exit(42)

fn = make_sliced_ci_fn(geom, mesh, max_defect_per_shard=512, halo_pad=256,
                       tail_k=512)
ci_g, nsat, ovf = fn(g_defect)
local_ci = np.asarray(multihost_utils.global_array_to_host_local_array(
    ci_g, mesh, P(None, None, "space")))

# Bit-check vs the locally computed unsharded engine: if a survivor ever
# gets here after a peer crash WITH WRONG VALUES, the assertion (not the
# runtime) catches it — silent corruption is the failure mode under test.
ci_u, _, _ = calculate_ci_pairwise(jnp.asarray(defect), geom, 1024,
                                   tail_k=1024)
ref = np.asarray(ci_u)[:, :, 2 * pid * dl:(2 * pid + 2) * dl]
np.testing.assert_array_equal(local_ci, ref)
print(f"HALO_CRASH_RUN_OK pid={pid} sum={float(local_ci.sum()):.3f}",
      flush=True)
