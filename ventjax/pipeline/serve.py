"""Watch-folder serving daemon — the production deployment surface.

The reference is an attended desktop app: an analyst loads one subject at a
time and clicks through the GUI (Vent_Analysis.py:856-864, one mutable Vent1
instance).  In a production TPU deployment the equivalent surface is an
unattended service: studies land in an inbox directory (scanner push, PACS
export, rsync drop) and results appear in an outbox.  `ventjax serve`
provides that on top of the cohort engine (pipeline/cohort.py):

- **discovery by convention**: every immediate subdirectory of the inbox
  holding ``xenon.dcm`` + ``mask/`` (optional ``proton.dcm`` — the layout
  io/synthetic.py:write_study produces) is a subject; the directory name is
  the subject id and names its output directory;
- **arrival gating**: a subject is only picked up once its files stop
  changing (``min_age`` seconds since the newest mtime) or, with
  ``ready_marker``, once that sentinel file appears in the subject dir — so
  a study still being copied in is never half-decoded;
- **warm-program serving**: the per-geometry runners (jitted fused pipeline
  + sticky adaptive pads) persist across scans, so after the first study of
  a geometry every later one skips tracing/compilation entirely and goes
  straight to the ms-scale device dispatch.  Combined with the persistent
  XLA compile cache this removes the minutes-scale TPU compile from the
  serving path;
- **exactly-once**: the cohort driver's ``.done`` markers carry over —
  restarting the service never re-analyzes or rewrites a completed subject,
  and a scan is O(new subjects), not O(inbox);
- **failure isolation**: a corrupt study poisons only its own lane
  (valid=False in its metrics.json), exactly as in batch cohort runs.

Multi-host serving is out of scope here: the watcher is a single-process
frontend to one chip/slice (run_cohort's multi-host path remains available
for offline cohorts).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import threading
import time
from typing import Dict, List, Optional, Tuple

from ventjax.config import DEFAULT_CONFIG, VentConfig
from ventjax.pipeline.cohort import run_cohort

log = logging.getLogger("ventjax.serve")


def discover_subjects(
    inbox: str,
    ready_marker: Optional[str] = None,
    min_age: float = 0.0,
    _now: Optional[float] = None,
) -> Tuple[List[Dict], int]:
    """Scan the inbox for complete, settled subject directories.

    Returns (manifest_entries, n_pending) where pending counts directories
    that are visible but not yet eligible (incomplete layout, missing ready
    marker, or files newer than min_age) — they are expected to become
    eligible on a later scan and are never an error.
    """
    subjects: List[Dict] = []
    pending = 0
    try:
        names = sorted(os.listdir(inbox))
    except FileNotFoundError:
        raise FileNotFoundError(f"serve inbox does not exist: {inbox!r}")
    for name in names:
        d = os.path.join(inbox, name)
        if not os.path.isdir(d):
            continue
        xenon = os.path.join(d, "xenon.dcm")
        mask = os.path.join(d, "mask")
        if not (os.path.isfile(xenon) and os.path.isdir(mask)):
            pending += 1
            continue
        if ready_marker:
            if not os.path.exists(os.path.join(d, ready_marker)):
                pending += 1
                continue
        elif min_age > 0:
            now = time.time() if _now is None else _now
            newest = 0.0
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        newest = max(newest,
                                     os.path.getmtime(os.path.join(root, f)))
                    except OSError:
                        pass  # racing with the producer; retry next scan
            if now - newest < min_age:
                pending += 1
                continue
        entry = {"id": name, "xenon": xenon, "mask": mask}
        proton = os.path.join(d, "proton.dcm")
        if os.path.isfile(proton):
            entry["proton"] = proton
        subjects.append(entry)
    return subjects, pending


@dataclasses.dataclass
class ScanReport:
    """One scan's outcome (serialized as the service's per-scan JSON line)."""

    scanned: int     # eligible subjects visible in the inbox
    new: int         # picked up by this scan
    analyzed: int    # of new: exported with valid metrics
    failed: int      # of new: decode/analysis failures (lane-isolated)
    resumed: int     # of new: already had .done markers (service restart)
    pending: int     # visible but not yet eligible (mid-copy / not ready)

    def as_dict(self) -> Dict:
        return dataclasses.asdict(self)


class WatchService:
    """Long-lived serving loop over an inbox directory.

    Holds the persistent per-geometry runner dict so jitted programs and
    sticky pads survive across scans (the whole point of a daemon vs
    repeated `ventjax cohort` invocations).
    """

    def __init__(
        self,
        inbox: str,
        out_dir: str,
        config: VentConfig = DEFAULT_CONFIG,
        batch_size: Optional[int] = None,
        use_mesh: bool = True,
        ready_marker: Optional[str] = None,
        min_age: float = 1.0,
    ):
        self.inbox = inbox
        self.out_dir = out_dir
        self.config = config
        self.batch_size = batch_size
        self.use_mesh = use_mesh
        self.ready_marker = ready_marker
        self.min_age = min_age
        # Persistent jit caches + sticky pad buckets (cohort._GeometryRunner);
        # shared across every run_cohort call this service makes.
        self.runners: Dict[Tuple, object] = {}
        # Ids this process has already handled (analyzed, failed, or resumed)
        # so scans stay O(new).  On restart it is rebuilt lazily: the first
        # scan passes everything through run_cohort, whose .done markers make
        # resumed subjects a metrics.json read, not a re-analysis.
        self._served: set = set()
        self._ledger_lock = threading.Lock()
        os.makedirs(out_dir, exist_ok=True)

    def scan_once(self) -> ScanReport:
        """One discovery + analysis pass.  Blocks until exports complete."""
        subjects, pending = discover_subjects(
            self.inbox, ready_marker=self.ready_marker, min_age=self.min_age
        )
        new = [e for e in subjects if e["id"] not in self._served]
        # Exactly-once across service restarts: a .done marker means the
        # subject's export completed in a previous life — count it resumed
        # and never re-dispatch (a FAILED subject writes metrics.json but no
        # marker, so a restart retries it, which is what an operator wants).
        done = [e for e in new
                if os.path.exists(os.path.join(self.out_dir, e["id"],
                                               ".done"))]
        todo = [e for e in new if e["id"] not in {d["id"] for d in done}]
        results: List[Dict] = []
        if todo:
            results = run_cohort(
                todo, self.out_dir, config=self.config,
                batch_size=self.batch_size, use_mesh=self.use_mesh,
                resume=True, runners=self.runners,
            )
        self._served.update(e["id"] for e in new)
        analyzed = sum(1 for r in results if r.get("valid"))
        failed = len(results) - analyzed
        report = ScanReport(
            scanned=len(subjects), new=len(new), analyzed=analyzed,
            failed=failed, resumed=len(done), pending=pending,
        )
        if new:
            self._append_ledger(
                report,
                results + [{"id": e["id"], "resumed": True} for e in done],
            )
        return report

    def _append_ledger(self, report: ScanReport, results: List[Dict]) -> None:
        """Service ledger: one JSONL record per scan that did work, so an
        operator can audit what arrived and what it measured without
        trawling per-subject directories."""
        rec = {
            "ts": time.time(),
            **report.as_dict(),
            "subjects": [
                {k: r.get(k) for k in
                 ("id", "valid", "resumed", "error", "VDP", "VDP_lb",
                  "VDP_km", "CI", "SNR")
                 if k in r}
                for r in results
            ],
        }
        with self._ledger_lock:
            with open(os.path.join(self.out_dir, "serve_log.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")

    def serve_forever(
        self,
        interval: float = 5.0,
        stop: Optional[threading.Event] = None,
        max_scans: Optional[int] = None,
        on_scan=None,
    ) -> int:
        """Scan loop: returns the number of scans performed.

        `stop` (a threading.Event) ends the loop at the next interval
        boundary; `max_scans` bounds it for tests/one-shots; `on_scan(report)`
        is invoked after every scan (the CLI prints a JSON line there).
        """
        stop = stop or threading.Event()
        n = 0
        while not stop.is_set():
            report = self.scan_once()
            n += 1
            if report.new:
                log.info("scan %d: %d new subject(s), %d analyzed, "
                         "%d failed", n, report.new, report.analyzed,
                         report.failed)
            if on_scan is not None:
                on_scan(report)
            if max_scans is not None and n >= max_scans:
                break
            stop.wait(interval)
        return n
