"""Deployment self-check (ventjax.utils.doctor / `ventjax doctor`).

The reference's health feedback is colored prints in its GUI loop
(Vent_Analysis.py:108-161); the framework's unattended deployments get a
machine-checkable preflight instead.  Pinned here: every required check
passes in this environment, checks are isolated (one induced failure
fails the report without masking the others), and the CLI exit code
follows the report.
"""
import json

import pytest

from ventjax.cli import main
from ventjax.utils import doctor


def test_run_doctor_all_required_ok():
    report = doctor.run_doctor()
    assert report["ok"] is True
    names = [c["name"] for c in report["checks"]]
    assert names == ["versions", "backend", "device_probe", "compile_cache",
                     "native_scanner", "seg_checkpoint", "codec_roundtrip",
                     "pipeline_selftest"]
    for c in report["checks"]:
        if c["required"]:
            assert c["ok"], c
    # the report is plain JSON
    json.dumps(report)
    st = next(c for c in report["checks"] if c["name"] == "pipeline_selftest")
    assert st["dvdp_pp"] < doctor.VDP_TOLERANCE_PP


def test_check_isolation(monkeypatch):
    """An induced crash in one required check fails the report but every
    other check still runs and reports."""
    def boom():
        raise RuntimeError("induced")

    monkeypatch.setattr(doctor, "_device_probe", boom)
    report = doctor.run_doctor()
    assert report["ok"] is False
    by_name = {c["name"]: c for c in report["checks"]}
    assert not by_name["device_probe"]["ok"]
    assert "induced" in by_name["device_probe"]["error"]
    assert by_name["codec_roundtrip"]["ok"]
    assert by_name["pipeline_selftest"]["ok"]


def test_cli_doctor(capsys):
    rc = main(["doctor"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0 and report["ok"]
