"""Worker for the SHARD-EXPORT failure-injection test.

Usage: python tests/_multihost_shard_crash_worker.py <port> <pid> <nproc>
       <workdir> <crash_pid>

Same mesh setup as _multihost_cohort_worker.py, but the driver runs with
shard_export=True (every process writes its OWN batch lanes) and the
process whose id equals <crash_pid> dies MID-FILE while exporting its
second owned lane: the wrapper lets the first _write_subject call complete
normally (prints ``WROTE <sid>``), then on the second call creates the
subject dir, writes a TORN partial NIfTI (a few hundred junk bytes under
the real export filename), prints ``TORN <sid>`` and os._exit(43)s —
before metrics.json or the .done marker exist.  The parent test asserts
the per-shard crash-consistency property VERDICT r3 item 7 asked for:
a torn lane has no .done marker, and a fresh run re-exports it with a
parseable NIfTI while leaving every pre-crash .done lane untouched.

crash_pid=-1 runs clean (the recovery pass).
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
from ventjax.pipeline import cohort as C  # noqa: E402

manifest = C.load_manifest(os.path.join(workdir, "manifest.json"))
out = os.path.join(workdir, "out")
cfg = DEFAULT_CONFIG.replace(
    ci_max_defect_voxels=1024, ci_rmax=12, n4_fitting_levels=2,
    n4_max_iters=10,
)

if pid == crash_pid:
    real_write = C._write_subject
    calls = []

    def torn_write(out_dir, entry, decoded, pack, results, lock, **kw):
        calls.append(entry["id"])
        if len(calls) < 2:
            real_write(out_dir, entry, decoded, pack, results, lock, **kw)
            print(f"WROTE {entry['id']}", flush=True)
            return
        # Second owned lane: die mid-file.  The torn bytes land under the
        # REAL NIfTI filename; metrics.json and .done never happen.
        sid = entry["id"]
        sdir = os.path.join(out_dir, sid)
        os.makedirs(sdir, exist_ok=True)
        with open(os.path.join(sdir, f"{sid}_dataArray.nii"), "wb") as f:
            f.write(b"\x00torn-by-crash" * 20)
        print(f"TORN {sid}", flush=True)
        os._exit(43)

    C._write_subject = torn_write

results = C.run_cohort(manifest, out, config=cfg, batch_size=2 * nproc,
                       use_mesh=True, shard_export=True)
print(f"SHARD_CRASH_WORKER_DONE pid={pid} n={len(results)}", flush=True)
