"""Watch-folder serving daemon (ventjax serve / pipeline/serve.py).

The production counterpart of the reference's attended GUI loop
(Vent_Analysis.py:856-864): studies dropped into an inbox are discovered,
gated on arrival completeness, analyzed with warm persistent programs, and
exported exactly once.
"""
import json
import os
import threading
import time

import numpy as np
import pytest

from ventjax.io.synthetic import write_study
from ventjax.pipeline.serve import WatchService, discover_subjects

SHAPE = (64, 64, 8)
VOX = (1.5, 1.5, 10.0)


def _drop_subject(inbox, sid, seed, with_proton=False, old=True):
    root = os.path.join(inbox, sid)
    ph = write_study(str(root), shape=SHAPE, vox=VOX, seed=seed,
                     with_proton=with_proton)
    if old:
        _age(root)
    return ph


def _age(root, seconds=3600):
    """Back-date every file so min_age gating sees a settled subject."""
    past = time.time() - seconds
    for r, _d, files in os.walk(root):
        for f in files:
            os.utime(os.path.join(r, f), (past, past))


# ---------------------------------------------------------------- discovery

def test_discover_layout_and_gating(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # Complete + settled subject.
    _drop_subject(str(inbox), "s1", seed=1)
    # Incomplete: mask folder missing -> pending, never an error.
    os.makedirs(inbox / "half" / "mask_not_yet", exist_ok=True)
    (inbox / "half" / "xenon.dcm").write_bytes(b"partial")
    # Stray file at inbox top level is ignored entirely.
    (inbox / "README.txt").write_text("not a subject")

    subjects, pending = discover_subjects(str(inbox), min_age=0.0)
    assert [e["id"] for e in subjects] == ["s1"]
    assert pending == 1
    assert subjects[0]["xenon"].endswith(os.path.join("s1", "xenon.dcm"))
    assert "proton" not in subjects[0]

    # Optional proton is picked up when present.
    _drop_subject(str(inbox), "s2", seed=2, with_proton=True)
    subjects, _ = discover_subjects(str(inbox), min_age=0.0)
    by_id = {e["id"]: e for e in subjects}
    assert by_id["s2"]["proton"].endswith("proton.dcm")


def test_discover_min_age_gates_fresh_files(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    _drop_subject(str(inbox), "fresh", seed=3, old=False)  # mtime = now
    subjects, pending = discover_subjects(str(inbox), min_age=30.0)
    assert subjects == [] and pending == 1
    # Once the files are old enough the same subject becomes eligible.
    _age(str(inbox / "fresh"))
    subjects, pending = discover_subjects(str(inbox), min_age=30.0)
    assert [e["id"] for e in subjects] == ["fresh"] and pending == 0


def test_discover_ready_marker_wins_over_age(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    _drop_subject(str(inbox), "s1", seed=4, old=False)
    # ready_marker mode ignores mtimes entirely: not ready until the
    # sentinel lands, ready immediately after even with fresh files.
    subjects, pending = discover_subjects(str(inbox), ready_marker="READY")
    assert subjects == [] and pending == 1
    (inbox / "s1" / "READY").write_text("")
    subjects, pending = discover_subjects(str(inbox), ready_marker="READY")
    assert [e["id"] for e in subjects] == ["s1"] and pending == 0


def test_discover_missing_inbox_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="inbox"):
        discover_subjects(str(tmp_path / "nope"))


# ------------------------------------------------------------- serving loop

def test_serve_incremental_scans_with_warm_runners(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    _drop_subject(str(inbox), "a", seed=10)
    _drop_subject(str(inbox), "b", seed=11)

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)
    r1 = svc.scan_once()
    assert (r1.new, r1.analyzed, r1.failed, r1.pending) == (2, 2, 0, 0)
    for sid in ("a", "b"):
        assert (out / sid / ".done").exists()
        m = json.loads((out / sid / "metrics.json").read_text())
        assert m["valid"] and np.isfinite(m["VDP"])

    # Quiet scan: nothing new, nothing re-analyzed, outputs untouched.
    mtime_a = (out / "a" / "metrics.json").stat().st_mtime
    r2 = svc.scan_once()
    assert (r2.new, r2.analyzed) == (0, 0) and r2.scanned == 2
    assert (out / "a" / "metrics.json").stat().st_mtime == mtime_a

    # A third subject of the SAME geometry arrives: only it is processed,
    # and the persistent geometry runner (jitted program + sticky pads) is
    # reused — no new runner, no new jit cache entry.
    runner = next(iter(svc.runners.values()))
    fns_before = dict(runner._fns)
    _drop_subject(str(inbox), "c", seed=12)
    r3 = svc.scan_once()
    assert (r3.new, r3.analyzed) == (1, 1)
    assert (out / "c" / ".done").exists()
    assert len(svc.runners) == 1
    assert next(iter(svc.runners.values())) is runner
    for key, fn in fns_before.items():
        assert runner._fns[key] is fn  # same compiled callables, warm serve

    # Ledger: one record per scan that did work, newest last.
    lines = [json.loads(l) for l in
             (out / "serve_log.jsonl").read_text().splitlines()]
    assert [rec["new"] for rec in lines] == [2, 1]
    assert {s["id"] for s in lines[0]["subjects"]} == {"a", "b"}
    assert all(np.isfinite(s["VDP"]) for s in lines[0]["subjects"])


def test_serve_restart_resumes_exactly_once(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    _drop_subject(str(inbox), "a", seed=20)
    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)
    assert svc.scan_once().analyzed == 1
    nifti_mtime = next((out / "a").glob("*.nii")).stat().st_mtime

    # Fresh service over the same directories (process restart): the first
    # scan sees the subject, resumes it from the .done marker, and rewrites
    # nothing.
    svc2 = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)
    r = svc2.scan_once()
    assert (r.new, r.resumed, r.analyzed, r.failed) == (1, 1, 0, 0)
    assert next((out / "a").glob("*.nii")).stat().st_mtime == nifti_mtime
    # And the scan after that is O(new): nothing to do.
    assert svc2.scan_once().new == 0


def test_serve_corrupt_subject_isolated(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    _drop_subject(str(inbox), "good", seed=30)
    bad = inbox / "bad"
    (bad / "mask").mkdir(parents=True)
    (bad / "xenon.dcm").write_bytes(b"\x00" * 256)  # not a DICOM
    _age(str(bad))

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)
    r = svc.scan_once()
    assert (r.new, r.analyzed, r.failed) == (2, 1, 1)
    good = json.loads((out / "good" / "metrics.json").read_text())
    assert good["valid"]
    badm = json.loads((out / "bad" / "metrics.json").read_text())
    assert badm["valid"] is False and badm["error"] == "decode_failed"
    # Within one service life the failure is recorded once, not re-polled.
    assert svc.scan_once().new == 0
    # Across a restart: the good subject resumes from its .done marker, the
    # failed one (metrics.json but no marker) is retried — so fixing the
    # study in place and restarting the service is enough.
    svc2 = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)
    r2 = svc2.scan_once()
    assert (r2.resumed, r2.failed, r2.analyzed) == (1, 1, 0)


def test_serve_retry_budget_and_rearm(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    bad = inbox / "flaky"
    (bad / "mask").mkdir(parents=True)
    (bad / "xenon.dcm").write_bytes(b"\x00" * 256)  # not a DICOM
    _age(str(bad))

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0,
                       max_retries=1, retry_backoff=0.0)
    # Initial attempt fails; it is 'new', not 'retried'.
    r1 = svc.scan_once()
    assert (r1.new, r1.failed, r1.retried) == (1, 1, 0)
    # Backoff 0 -> the single budgeted retry happens on the next scan.
    r2 = svc.scan_once()
    assert (r2.new, r2.failed, r2.retried) == (0, 1, 1)
    # Budget exhausted: no further attempts while the study is unchanged.
    r3 = svc.scan_once()
    assert (r3.failed, r3.retried) == (0, 0)
    status = json.loads((out / "serve_status.json").read_text())
    assert status["awaiting_retry"] == ["flaky"]
    assert status["scans"] == 3 and status["failed"] == 2

    # Fixing the study *in place* (newer mtimes) re-arms it with a fresh
    # budget — no restart needed.  The first scan after the fix holds it
    # back once (signature changed = possibly still being written); the
    # next scan sees it settled and analyzes it.
    (bad / "xenon.dcm").unlink()
    write_study(str(bad), shape=SHAPE, vox=VOX, seed=77, with_proton=False)
    _age(str(bad), seconds=100)  # settled past min_age, newer than before
    r4 = svc.scan_once()
    assert (r4.retried, r4.analyzed, r4.pending) == (0, 0, 1)
    r5 = svc.scan_once()
    assert (r5.retried, r5.analyzed, r5.failed) == (1, 1, 0)
    assert (out / "flaky" / ".done").exists()
    status = json.loads((out / "serve_status.json").read_text())
    assert status["awaiting_retry"] == [] and status["analyzed"] == 1


def test_serve_retry_backoff_delays_attempt(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    bad = inbox / "bad"
    (bad / "mask").mkdir(parents=True)
    (bad / "xenon.dcm").write_bytes(b"junk")
    _age(str(bad))

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0,
                       max_retries=3, retry_backoff=3600.0)
    assert svc.scan_once().failed == 1
    # Within the backoff window: budget remains but no attempt is made.
    r = svc.scan_once()
    assert (r.retried, r.failed) == (0, 0)


def test_serve_settle_scans_gates_preserved_mtime_copy(tmp_path):
    """A producer that preserves source mtimes (rsync -a) defeats pure
    min_age gating; settle_scans=1 requires one confirming scan with an
    unchanged file signature before first pickup, so a copy that grows
    across scans is never half-decoded."""
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    # The subject 'arrives' looking complete, with OLD mtimes (preserved
    # by the copier), but the copy is still in flight.
    _drop_subject(str(inbox), "s1", seed=50)

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0,
                       settle_scans=1)
    # First look: mtime age passes, but no stability confirmation yet.
    r1 = svc.scan_once()
    assert (r1.analyzed, r1.pending) == (0, 1)
    # The copy continues (another file lands, again with an old mtime):
    # signature changed, still held back.
    (inbox / "s1" / "proton.dcm").write_bytes(b"placeholder")
    _age(str(inbox / "s1"))
    r2 = svc.scan_once()
    assert (r2.analyzed, r2.pending) == (0, 1)
    # Copy finished; signature changed once more (file replaced)...
    from ventjax.io.synthetic import write_multiframe

    ph = _drop_subject(str(inbox), "tmp_src", seed=50)  # regenerate arrays
    import shutil

    shutil.rmtree(str(inbox / "tmp_src"))
    write_multiframe(str(inbox / "s1" / "proton.dcm"), ph.proton, VOX)
    _age(str(inbox / "s1"))
    r3 = svc.scan_once()
    assert (r3.analyzed, r3.pending) == (0, 1)
    # ...and now it is stable for one full scan: picked up and analyzed.
    r4 = svc.scan_once()
    assert (r4.analyzed, r4.failed) == (1, 0)
    assert (out / "s1" / ".done").exists()


def test_serve_invalid_with_done_is_terminal(tmp_path):
    """Analysis-stage invalidity (empty mask) exports with a .done marker:
    the subject is terminal — counted failed once, never queued for retry."""
    import numpy as np

    from ventjax.io.synthetic import write_mask_folder

    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    ph = _drop_subject(str(inbox), "emptymask", seed=60)
    write_mask_folder(str(inbox / "emptymask" / "mask"),
                      np.zeros_like(ph.mask), VOX)
    _age(str(inbox / "emptymask"))

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0,
                       max_retries=5, retry_backoff=0.0)
    r1 = svc.scan_once()
    assert (r1.new, r1.failed) == (1, 1)
    m = json.loads((out / "emptymask" / "metrics.json").read_text())
    assert m["valid"] is False
    assert (out / "emptymask" / ".done").exists()
    status = json.loads((out / "serve_status.json").read_text())
    assert status["awaiting_retry"] == []  # terminal, not a retry ghost
    r2 = svc.scan_once()
    assert (r2.retried, r2.failed) == (0, 0)


def test_serve_deleted_failed_subject_pruned(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    bad = inbox / "gone"
    (bad / "mask").mkdir(parents=True)
    (bad / "xenon.dcm").write_bytes(b"junk")
    _age(str(bad))

    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0,
                       max_retries=0, retry_backoff=3600.0)
    assert svc.scan_once().failed == 1
    import shutil

    shutil.rmtree(bad)
    svc.scan_once()
    status = json.loads((out / "serve_status.json").read_text())
    assert status["awaiting_retry"] == []  # no ghost for a deleted subject


def test_serve_forever_survives_scan_errors(tmp_path):
    """One scan's exception must not kill the daemon: it is recorded in
    the heartbeat and the loop continues."""
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)

    calls = {"n": 0}
    real_scan = svc.scan_once

    def flaky_scan():
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("transient NFS blip")
        return real_scan()

    svc.scan_once = flaky_scan
    reports = []
    n = svc.serve_forever(interval=0.01, max_scans=3, on_scan=reports.append)
    assert n == 3
    assert len(reports) == 2  # the errored scan produced no report
    status = json.loads((out / "serve_status.json").read_text())
    assert status["scan_errors"] == 1
    assert "NFS blip" in status["last_error"]["error"]
    # scan_once called directly still raises (library / --once semantics).
    svc.scan_once = real_scan
    import shutil

    shutil.rmtree(inbox)
    with pytest.raises(FileNotFoundError):
        svc.scan_once()


def test_serve_forever_stops_and_counts(tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=30.0)
    reports = []
    n = svc.serve_forever(interval=0.01, max_scans=3,
                          on_scan=reports.append)
    assert n == 3 and len(reports) == 3
    assert all(r.new == 0 for r in reports)

    # stop event ends the loop even with no max_scans.
    stop = threading.Event()
    done = {}

    def run():
        done["n"] = svc.serve_forever(interval=0.01, stop=stop)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.15)
    stop.set()
    t.join(timeout=10)
    assert not t.is_alive() and done["n"] >= 1


# --------------------------------------------------------------------- CLI

def test_cli_serve_once(tmp_path):
    from ventjax.cli import main

    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    inbox.mkdir()
    _drop_subject(str(inbox), "s1", seed=40)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["serve", "--inbox", str(inbox), "--out", str(out),
                   "--once", "--no-mesh", "--min-age", "30"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["new"] == 1 and rep["analyzed"] == 1 and rep["failed"] == 0
    assert (out / "s1" / ".done").exists()

    # --once exits 1 when a new subject fails (monitorable from cron).
    bad = inbox / "bad"
    (bad / "mask").mkdir(parents=True)
    (bad / "xenon.dcm").write_bytes(b"junk")
    _age(str(bad))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["serve", "--inbox", str(inbox), "--out", str(out),
                   "--once", "--no-mesh", "--min-age", "30"])
    assert rc == 1


def test_preflight_recorded_in_status(tmp_path, monkeypatch):
    """preflight() runs the doctor battery and lands a compact result in
    the heartbeat; a failed preflight is visible there too."""
    from ventjax.utils import doctor as doctor_mod

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    svc = WatchService(str(inbox), str(tmp_path / "out"), use_mesh=False)
    monkeypatch.setattr(doctor_mod, "run_doctor", lambda full=False: {
        "ok": True, "full": False,
        "checks": [{"name": "device_probe", "ok": True, "required": True}],
    })
    report = svc.preflight()
    assert report["ok"]
    status = json.load(open(tmp_path / "out" / "serve_status.json"))
    assert status["preflight"]["ok"] is True
    assert status["preflight"]["failed"] == []

    monkeypatch.setattr(doctor_mod, "run_doctor", lambda full=False: {
        "ok": False, "full": False,
        "checks": [{"name": "device_probe", "ok": False, "required": True}],
    })
    assert not svc.preflight()["ok"]
    status = json.load(open(tmp_path / "out" / "serve_status.json"))
    assert status["preflight"]["failed"] == ["device_probe"]


def test_cli_serve_preflight_blocks_broken_install(tmp_path, monkeypatch,
                                                   capsys):
    from ventjax.cli import main
    from ventjax.utils import doctor as doctor_mod

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    _drop_subject(str(inbox), "s1", seed=41)
    monkeypatch.setattr(doctor_mod, "run_doctor", lambda full=False: {
        "ok": False, "full": False,
        "checks": [{"name": "device_probe", "ok": False, "required": True}],
    })
    rc = main(["serve", "--inbox", str(inbox), "--out", str(tmp_path / "o"),
               "--once", "--no-mesh", "--preflight"])
    assert rc == 2
    assert "preflight failed" in capsys.readouterr().err
    # nothing was scanned/exported
    assert not (tmp_path / "o" / "s1").exists()


def test_watchdog_fires_on_wedged_scan(tmp_path, monkeypatch):
    """A scan exceeding scan_timeout trips the watchdog: wedged status in
    the heartbeat, then the (stubbed) hard exit with code 86."""
    from ventjax.pipeline import serve as serve_mod

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    svc = WatchService(str(inbox), str(tmp_path / "out"), use_mesh=False)
    fired = []
    monkeypatch.setattr(serve_mod, "_watchdog_exit", fired.append)
    monkeypatch.setattr(svc, "scan_once", lambda: time.sleep(1.0))
    svc.serve_forever(interval=0.01, max_scans=1, scan_timeout=0.15)
    assert fired == [serve_mod.WATCHDOG_EXIT_CODE]
    status = json.load(open(tmp_path / "out" / "serve_status.json"))
    assert status["last_error"]["wedged"] is True
    assert "watchdog" in status["last_error"]["error"]


def test_watchdog_quiet_on_healthy_scans(tmp_path, monkeypatch):
    """Fast scans never trip the armed watchdog (the timer is cancelled
    when the scan returns — even a scan that raises)."""
    from ventjax.pipeline import serve as serve_mod

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    svc = WatchService(str(inbox), str(tmp_path / "out"), use_mesh=False)
    fired = []
    monkeypatch.setattr(serve_mod, "_watchdog_exit", fired.append)
    calls = []

    def fast_scan():
        calls.append(1)
        if len(calls) == 2:  # a failing scan must also disarm its timer
            raise OSError("transient inbox blip")
        return svc.scan_once_real()

    svc.scan_once_real = WatchService.scan_once.__get__(svc)
    monkeypatch.setattr(svc, "scan_once", fast_scan)
    n = svc.serve_forever(interval=0.01, max_scans=3, scan_timeout=0.2)
    assert n == 3 and len(calls) == 3
    time.sleep(0.4)  # a leaked 0.2s timer would fire well within this
    assert fired == []
    status = json.load(open(tmp_path / "out" / "serve_status.json"))
    assert status["scan_errors"] == 1


def test_prewarm_warms_runner_for_real_arrival(tmp_path):
    """prewarm() compiles the production program for a geometry before the
    inbox opens; the first real study of that geometry reuses the same
    runner (and its jitted fns) instead of paying first-compile."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = tmp_path / "out"
    svc = WatchService(str(inbox), str(out), use_mesh=False, min_age=0.0)
    svc.prewarm([(SHAPE, VOX)])
    key = (SHAPE, tuple(float(v) for v in VOX))
    assert key in svc.runners
    runner = svc.runners[key]
    assert runner._fns, "prewarm must have compiled at least one program"
    fns_before = dict(runner._fns)
    # No phantom output may leak into the service out_dir.
    assert not (out / "warm0").exists()

    _drop_subject(str(inbox), "s1", seed=11)
    report = svc.scan_once()
    assert report.analyzed == 1
    assert svc.runners[key] is runner, "runner identity must survive"
    for k, f in fns_before.items():
        assert runner._fns[k] is f, "prewarmed program was recompiled"


def test_cli_prewarm_spec_parsing(tmp_path, capsys):
    from ventjax.cli import main, parse_geometry_spec

    assert parse_geometry_spec("128x128x16@2.0,2.0,11.5") == \
        ((128, 128, 16), (2.0, 2.0, 11.5))
    assert parse_geometry_spec("64x64x8") == ((64, 64, 8), (1.5, 1.5, 10.0))
    for bad in ("64x64", "0x64x8", "64x64x8@1.5,1.5", "64x64x8@0,1,1",
                "64x64x8@nan,1.5,10.0", "64x64x8@inf,1.5,10.0",
                "sixtyfour"):
        with pytest.raises(ValueError):
            parse_geometry_spec(bad)

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    rc = main(["serve", "--inbox", str(inbox), "--out", str(tmp_path / "o"),
               "--once", "--no-mesh", "--prewarm", "garbage"])
    assert rc == 2
    assert "geometry spec" in capsys.readouterr().err


def test_cli_startup_watchdog_covers_preflight_wedge(tmp_path, monkeypatch):
    """--scan-timeout also budgets the startup phases: a doctor battery
    that wedges (device probe blocked in native code) trips the startup
    watchdog instead of hanging the service forever."""
    from ventjax.cli import main
    from ventjax.utils import doctor as doctor_mod
    from ventjax.utils import watchdog as wd_mod

    fired = []
    monkeypatch.setattr(wd_mod, "_exit", fired.append)

    def wedged_doctor(full=False):
        time.sleep(1.0)  # "blocked" long past the 0.2s budget
        return {"ok": True, "full": False, "checks": []}

    monkeypatch.setattr(doctor_mod, "run_doctor", wedged_doctor)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    rc = main(["serve", "--inbox", str(inbox), "--out", str(tmp_path / "o"),
               "--once", "--no-mesh", "--preflight", "--scan-timeout",
               "0.2"])
    assert fired == [wd_mod.EXIT_CODE]
    assert rc == 0  # stubbed exit lets the (stub) battery finish
