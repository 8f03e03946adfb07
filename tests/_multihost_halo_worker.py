"""Worker process for the 2-process slice-sharded (halo) CI test.

Usage: python tests/_multihost_halo_worker.py <coordinator_port> <process_id>

Each of the 2 processes contributes 2 fake CPU devices (global 4-device
("space",) mesh); the slice axis of one 32x32x32 volume is sharded across
the processes, so the halo ppermute of boundary defect-coordinate buffers
crosses a REAL process boundary (the distributed CPU collective backend),
not just threads of one runtime.  Every process checks its local CI slab
bit-matches the locally-computed unsharded engine.
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
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from ventjax.dist.halo import make_sliced_ci_fn  # noqa: E402
from ventjax.ops.ci_pairwise import (  # noqa: E402
    build_ci_pairwise_geometry,
    calculate_ci_pairwise,
)

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4

H, W, D = 32, 32, 32
geom = build_ci_pairwise_geometry((1.5, 1.5, 10.0), (H, W, D), 16, "wrap")

# The same volume generated deterministically in both processes: sparse
# singles plus a dense cluster straddling the process boundary (z=16) so
# the cross-process halo carries real witnesses.
rng = np.random.default_rng(7)
defect = (rng.random((H, W, D)) > 0.99).astype(np.float32)
defect[8:16, 8:16, 13:19] = 1
defect[0, 0, 0] = defect[-1, -1, -1] = 1

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("space",))
dl = D // 4
local = defect[:, :, 2 * pid * dl:(2 * pid + 2) * dl]
g_defect = multihost_utils.host_local_array_to_global_array(
    local, mesh, P(None, None, "space")
)

fn = make_sliced_ci_fn(geom, mesh, max_defect_per_shard=512, halo_pad=256,
                       tail_k=512)
ci_g, nsat, ovf = fn(g_defect)
assert not bool(np.asarray(ovf)), "halo CI overflowed its pads"

local_ci = multihost_utils.global_array_to_host_local_array(
    ci_g, mesh, P(None, None, "space")
)

ci_u, nsat_u, _ = calculate_ci_pairwise(jnp.asarray(defect), geom, 1024,
                                        tail_k=1024)
ref = np.asarray(ci_u)[:, :, 2 * pid * dl:(2 * pid + 2) * dl]
np.testing.assert_array_equal(np.asarray(local_ci), ref)
assert int(np.asarray(nsat)) == int(np.asarray(nsat_u))

print(f"MULTIHOST_HALO_OK pid={pid} nsat={int(np.asarray(nsat))} "
      f"ci_sum={float(np.asarray(local_ci).sum()):.3f}", flush=True)
