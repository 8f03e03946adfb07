"""2-process jax.distributed run through initialize_multihost + shard_map.

SURVEY.md §2.3 comm-backend row / VERDICT r1 item 9: the multi-host runtime
is exercised for real — two OS processes, each contributing 2 fake CPU
devices, form one 4-device ("batch",) mesh; the fused pipeline runs under
shard_map over the global mesh and every process's local lanes must
bit-match its own unsharded computation.
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_four_process_cohort_driver_with_resume(tmp_path):
    """4 processes x 2 devices: the streaming cohort driver over a global
    8-device mesh, process 0 owning exports/markers; a rerun resumes to a
    no-op and every subject is exported exactly once (round-2 VERDICT
    item 8)."""
    import json
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ventjax.io.synthetic import write_study

    workdir = str(tmp_path)
    manifest = []
    for i in range(6):
        root = os.path.join(workdir, f"study{i}")
        write_study(root, shape=(32, 32, 8), vox=(1.5, 1.5, 10.0),
                    seed=50 + i, with_proton=False)
        manifest.append({"id": f"s{i}", "xenon": f"{root}/xenon.dcm",
                         "mask": f"{root}/mask"})
    with open(os.path.join(workdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_cohort_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "4", workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(4)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_COHORT_OK" in out, out
    # all processes observed identical metrics for the shared cohort
    lines = [next(l for l in o.splitlines() if "MULTIHOST_COHORT_OK" in l)
             for o in outs]
    vdp_strs = {l.split("vdps=")[1] for l in lines}
    assert len(vdp_strs) == 1, vdp_strs
    # exactly-once: every subject has its .done marker and metrics
    for i in range(6):
        sdir = os.path.join(workdir, "out", f"s{i}")
        assert os.path.exists(os.path.join(sdir, ".done"))
        m = json.load(open(os.path.join(sdir, "metrics.json")))
        assert m["valid"]


def test_two_process_distributed_cohort():
    # (timeout guard is the subprocess communicate() below — pytest-timeout
    # is not installed in this image)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out


def test_four_process_failure_injection_and_recovery(tmp_path):
    """One host dies mid-cohort; the batch it completed stays exported
    (done-markers are crash-consistent: written only after a full export)
    and a fresh 4-process run resumes past it to completion, rewriting
    nothing (VERDICT r2 weak #6 failure-injection gap)."""
    import json
    import time
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ventjax.io.synthetic import write_study

    workdir = str(tmp_path)
    nproc, bs, nsub = 4, 8, 16
    manifest = []
    for i in range(nsub):
        root = os.path.join(workdir, f"study{i}")
        write_study(root, shape=(32, 32, 8), vox=(1.5, 1.5, 10.0),
                    seed=80 + i, with_proton=False)
        manifest.append({"id": f"s{i:02d}", "xenon": f"{root}/xenon.dcm",
                         "mask": f"{root}/mask"})
    with open(os.path.join(workdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_crash_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    # ---- run 1: process 3 dies after the first batch ----------------------
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(nproc),
             workdir, "3"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    try:
        out3, _ = procs[3].communicate(timeout=420)
        assert procs[3].returncode == 42, out3
        assert "CRASH_NOW" in out3
        # batch 1 (s00..s07) must reach disk from process 0's export worker
        # while the survivors wedge in batch-2 collectives
        deadline = time.time() + 120
        batch1 = [f"s{i:02d}" for i in range(bs)]
        while time.time() < deadline:
            if all(os.path.exists(os.path.join(workdir, "out", s, ".done"))
                   for s in batch1):
                break
            if any(p.poll() not in (None, 0) for p in procs[:3]):
                break  # survivor errored out — check markers below
            time.sleep(0.5)
        assert all(os.path.exists(os.path.join(workdir, "out", s, ".done"))
                   for s in batch1), "batch-1 exports lost in the crash"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait(timeout=60)

    mtimes = {s: os.stat(os.path.join(workdir, "out", s,
                                      "metrics.json")).st_mtime_ns
              for s in batch1}
    # batch 2 must NOT be complete (the crash interrupted it)
    assert not all(
        os.path.exists(os.path.join(workdir, "out", f"s{i:02d}", ".done"))
        for i in range(bs, nsub))

    # ---- run 2: fresh processes recover from the markers ------------------
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(nproc),
             workdir, "-1"],  # no crash
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"recovery process {pid} failed:\n{out}"
        assert "CRASH_WORKER_DONE" in out, out
    for i in range(nsub):
        s = f"s{i:02d}"
        sdir = os.path.join(workdir, "out", s)
        assert os.path.exists(os.path.join(sdir, ".done")), s
        m = json.load(open(os.path.join(sdir, "metrics.json")))
        assert m["valid"], m
        if s in mtimes:  # exactly-once: pre-crash exports untouched
            assert os.stat(os.path.join(
                sdir, "metrics.json")).st_mtime_ns == mtimes[s], s


def test_four_process_sharded_export(tmp_path):
    """shard_export=True: each process exports its OWN batch lanes (only
    the small metrics pytree is allgathered; result volumes never leave
    their owning host).  6 subjects over an 8-lane batch on 4 processes =
    2 lanes each, so processes 0-2 must each have written files and the
    metrics must match the process-0-exports path lane for lane."""
    import json
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ventjax.io.synthetic import write_study

    workdir = str(tmp_path)
    manifest = []
    for i in range(6):
        root = os.path.join(workdir, f"study{i}")
        write_study(root, shape=(32, 32, 8), vox=(1.5, 1.5, 10.0),
                    seed=50 + i, with_proton=False)
        manifest.append({"id": f"s{i}", "xenon": f"{root}/xenon.dcm",
                         "mask": f"{root}/mask"})
    with open(os.path.join(workdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_cohort_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "4", workdir,
             "shard"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(4)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_COHORT_OK" in out, out
    # identical metrics on every process
    lines = [next(l for l in o.splitlines() if "MULTIHOST_COHORT_OK" in l)
             for o in outs]
    assert len({l.split("vdps=")[1] for l in lines}) == 1
    # every subject exported exactly once, and the export work was actually
    # sharded: lanes 0..5 of the 8-lane batch live on processes 0,1,2
    # (2 lanes each); process 3's lanes are padding
    exporters = set()
    for i in range(6):
        sdir = os.path.join(workdir, "out", f"s{i}")
        assert os.path.exists(os.path.join(sdir, ".done"))
        m = json.load(open(os.path.join(sdir, "metrics.json")))
        assert m["valid"]
        exporters.add(m["export_process"])
    assert exporters == {0, 1, 2}, exporters


def test_four_process_shard_export_writer_crash(tmp_path):
    """shard_export=True failure injection (VERDICT r3 item 7): a WRITER
    process dies mid-file while exporting its second owned lane.  The
    .done-last invariant must hold per shard: the torn lane has no marker
    and a fresh run re-exports it (valid NIfTI + metrics), while every
    lane made durable before the crash — by ANY writer — is untouched."""
    import json
    import re
    import time
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ventjax.io import nifti
    from ventjax.io.synthetic import write_study

    workdir = str(tmp_path)
    nproc, bs, nsub = 4, 8, 16
    manifest = []
    for i in range(nsub):
        root = os.path.join(workdir, f"study{i}")
        write_study(root, shape=(32, 32, 8), vox=(1.5, 1.5, 10.0),
                    seed=200 + i, with_proton=False)
        manifest.append({"id": f"s{i:02d}", "xenon": f"{root}/xenon.dcm",
                         "mask": f"{root}/mask"})
    with open(os.path.join(workdir, "manifest.json"), "w") as f:
        json.dump(manifest, f)

    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_shard_crash_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outdir = os.path.join(workdir, "out")

    # ---- run 1: writer process 2 tears its second owned lane --------------
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(nproc),
             workdir, "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    try:
        out2, _ = procs[2].communicate(timeout=420)
        assert procs[2].returncode == 43, out2
        torn = re.findall(r"TORN (\S+)", out2)
        wrote = re.findall(r"WROTE (\S+)", out2)
        assert len(torn) == 1 and len(wrote) == 1, out2
        torn_sid = torn[0]
        # give the surviving writers a moment to settle their batch-1 lanes
        time.sleep(5)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait(timeout=60)

    # torn lane: partial NIfTI on disk, NO .done, NO metrics.json
    tdir = os.path.join(outdir, torn_sid)
    assert os.path.exists(os.path.join(tdir, f"{torn_sid}_dataArray.nii"))
    assert not os.path.exists(os.path.join(tdir, ".done")), \
        "torn export must not be marked done"
    assert not os.path.exists(os.path.join(tdir, "metrics.json"))
    with pytest.raises(ValueError):
        nifti.load(os.path.join(tdir, f"{torn_sid}_dataArray.nii"))

    # lanes durable before the crash (from any writer): record mtimes
    durable = [e["id"] for e in manifest
               if os.path.exists(os.path.join(outdir, e["id"], ".done"))]
    assert wrote[0] in durable
    mtimes = {s: os.stat(os.path.join(outdir, s, "metrics.json")).st_mtime_ns
              for s in durable}

    # ---- run 2: fresh processes recover --------------------------------
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(nproc),
             workdir, "-1"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"recovery process {pid} failed:\n{out}"
        assert "SHARD_CRASH_WORKER_DONE" in out, out

    for i in range(nsub):
        s = f"s{i:02d}"
        sdir = os.path.join(outdir, s)
        assert os.path.exists(os.path.join(sdir, ".done")), s
        m = json.load(open(os.path.join(sdir, "metrics.json")))
        assert m["valid"], m
        data, _ = nifti.load(os.path.join(sdir, f"{s}_dataArray.nii"))
        assert data.shape == (32, 32, 8, 6), s
        if s in mtimes:  # exactly-once: pre-crash durable lanes untouched
            assert os.stat(os.path.join(
                sdir, "metrics.json")).st_mtime_ns == mtimes[s], s


def test_two_process_halo_ci():
    """Slice-sharded CI across a REAL process boundary: the sparse halo
    ppermute of defect-coordinate buffers rides the distributed CPU
    collective backend between 2 OS processes (2 devices each), and every
    process's local CI slab bit-matches the unsharded engine."""
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_halo_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_HALO_OK" in out, out
    # both processes agree on the replicated psum'd saturation count
    nsats = {next(l for l in o.splitlines() if "MULTIHOST_HALO_OK" in l)
             .split("nsat=")[1].split()[0] for o in outs}
    assert len(nsats) == 1, nsats


def test_two_process_halo_crash_and_restart():
    """Halo-CI failure injection (round-5 VERDICT item 6c): one of the two
    halo shards os._exit(42)s immediately after the pre-dispatch barrier.
    Fail-stop property: the survivor must NOT complete with a silently
    wrong CI map — it errors or wedges (and is killed).  Recovery = fresh
    run (the halo op is pure compute); the restart must complete with the
    bit-exact result on both processes."""
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_halo_crash_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def launch(port, crash_pid):
        return [
            subprocess.Popen(
                [sys.executable, worker, str(port), str(pid),
                 str(crash_pid)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
            for pid in range(2)
        ]

    # Run 1: process 1 dies at the barrier.  The crasher must exit 42;
    # the survivor must never print the OK line (kill it if it wedges
    # rather than erroring — both are acceptable fail-stop outcomes).
    procs = launch(_free_port(), crash_pid=1)
    outs = [None, None]
    try:
        outs[1] = procs[1].communicate(timeout=300)[0]
        try:
            outs[0] = procs[0].communicate(timeout=60)[0]
        except subprocess.TimeoutExpired:
            procs[0].kill()
            outs[0] = procs[0].communicate()[0] + "\n<KILLED WEDGED>"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    assert procs[1].returncode == 42, (procs[1].returncode, outs[1])
    assert "HALO_CRASH_RUN_OK" not in (outs[0] or ""), (
        f"survivor completed after peer death:\n{outs[0]}")

    # Run 2 (the recovery): fresh processes, nobody crashes, bit-equal.
    procs = launch(_free_port(), crash_pid=-1)
    outs2 = []
    try:
        for p in procs:
            outs2.append(p.communicate(timeout=540)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs2)):
        assert p.returncode == 0, f"restart process {pid} failed:\n{out}"
        assert "HALO_CRASH_RUN_OK" in out, out
