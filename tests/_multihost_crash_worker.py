"""Worker for the multi-host FAILURE-INJECTION test.

Usage: python tests/_multihost_crash_worker.py <port> <pid> <nproc> <workdir>
       <crash_pid>

Same setup as _multihost_cohort_worker.py (each process contributes 2 fake
CPU devices to a global ("batch",) mesh, process 0 owns exports), but the
process whose id equals <crash_pid> calls os._exit(42) the moment the first
device batch completes — simulating a host dying mid-cohort.  Survivors
wedge (or error) in the next batch's collectives; the parent test kills
them and asserts the recovery property: everything batch 1 exported before
the crash survives (a .done marker is written only after a complete
export), and a fresh run resumes to completion without rewriting it.
"""
import os
import sys

port, pid, nproc, workdir, crash_pid = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    int(sys.argv[5]))

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

from ventjax.config import DEFAULT_CONFIG  # noqa: E402
from ventjax.pipeline.cohort import load_manifest, run_cohort  # noqa: E402

manifest = load_manifest(os.path.join(workdir, "manifest.json"))
out = os.path.join(workdir, "out")
cfg = DEFAULT_CONFIG.replace(
    ci_max_defect_voxels=1024, ci_rmax=12, n4_fitting_levels=2,
    n4_max_iters=10,
)
bs = 2 * nproc


def progress(stage, done, total):
    # First device batch complete on THIS process -> the designated process
    # "dies".  A completed local gather does not imply the other ranks'
    # gathers completed (an os._exit here RSTs TCP data still queued in the
    # kernel, killing batch 1 on the peers), so wait until process 0's
    # export worker has made batch 1 durable: the host is then lost between
    # batches, the deterministic variant of mid-cohort death.
    if pid == crash_pid and stage == "analyze" and done >= bs:
        import time

        deadline = time.time() + 120
        batch1 = [e["id"] for e in manifest[:bs]]
        while time.time() < deadline:
            if all(os.path.exists(os.path.join(out, s, ".done"))
                   for s in batch1):
                break
            time.sleep(0.2)
        print("CRASH_NOW", flush=True)
        os._exit(42)


results = run_cohort(manifest, out, config=cfg, batch_size=bs,
                     use_mesh=True, progress=progress)
# Survivors normally never get here (they wedge in batch-2 collectives and
# the parent kills them); reaching it means the run completed, which is
# also fine on a recovery pass.
print(f"CRASH_WORKER_DONE pid={pid} n={len(results)}", flush=True)
