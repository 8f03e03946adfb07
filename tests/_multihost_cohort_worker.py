"""Worker for the 4-process multi-host COHORT-DRIVER test.

Usage: python tests/_multihost_cohort_worker.py <port> <pid> <nproc> <workdir> [shard]

With the optional "shard" argument the driver runs with shard_export=True:
every process writes its OWN batch lanes' files (per-host file-sharding
fan-out) instead of process 0 exporting everything.

Each of the 4 processes contributes 2 fake CPU devices (8-device global
("batch",) mesh).  All processes run the streaming cohort driver on the
same manifest: every process decodes all subjects, feeds its batch-axis
slice into global arrays, and process 0 alone writes exports/done-markers
(ventjax/pipeline/cohort.py multihost paths).  A second run must resume
to a no-op — exactly-once export is asserted by the parent test via
.done-marker mtimes.
"""
import json
import os
import sys

port, pid, nproc, workdir = (sys.argv[1], int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
shard_export = len(sys.argv) > 5 and sys.argv[5] == "shard"

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ventjax.dist import initialize_multihost  # noqa: E402

initialize_multihost(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)

assert jax.process_count() == nproc
assert jax.device_count() == 2 * nproc

from ventjax.config import DEFAULT_CONFIG  # noqa: E402
from ventjax.pipeline.cohort import load_manifest, run_cohort  # noqa: E402

manifest = load_manifest(os.path.join(workdir, "manifest.json"))
out = os.path.join(workdir, "out")
cfg = DEFAULT_CONFIG.replace(
    ci_max_defect_voxels=1024, ci_rmax=12, n4_fitting_levels=2,
    n4_max_iters=10,
)

results = run_cohort(manifest, out, config=cfg, batch_size=2 * nproc,
                     use_mesh=True, shard_export=shard_export)
assert len(results) == len(manifest), (len(results), len(manifest))
valid = sum(1 for r in results if r.get("valid"))
assert valid == len(manifest), results

mtimes = {}
if pid == 0:
    for e in manifest:
        assert os.path.exists(os.path.join(out, e["id"], ".done")), e["id"]
        mtimes[e["id"]] = os.stat(
            os.path.join(out, e["id"], "metrics.json")).st_mtime_ns

# Resume: must short-circuit to a no-op on every process (process 0's
# done-markers broadcast; no divergent collectives).
results2 = run_cohort(manifest, out, config=cfg, batch_size=2 * nproc,
                      use_mesh=True, shard_export=shard_export)
assert len(results2) == len(manifest)
if pid == 0:
    # exactly-once export: nothing was rewritten on resume
    for e in manifest:
        now = os.stat(
            os.path.join(out, e["id"], "metrics.json")).st_mtime_ns
        assert now == mtimes[e["id"]], e["id"]

vdps = sorted(round(r["VDP"], 3) for r in results if "VDP" in r)
print(f"MULTIHOST_COHORT_OK pid={pid} n={len(results)} vdps={vdps}",
      flush=True)
