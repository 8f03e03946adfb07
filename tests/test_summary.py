"""Unit tests for pipeline.summary.cohort_summary (statistics vs numpy)."""
import math

import numpy as np
import pytest

from ventjax.pipeline.summary import cohort_summary


def _row(sid, vdp, ci=5.0, valid=True, **extra):
    r = {"id": sid, "valid": valid, "SNR": 12.0, "VDP": vdp, "VDP_lb": vdp / 2,
         "VDP_km": vdp / 3, "LungVolume": 4.0, "DefectVolume": 0.1, "CI": ci,
         "CI_saturated_voxels": 0, "CI_overflow": False, "N4_overflow": False}
    r.update(extra)
    return r


def test_stats_match_numpy():
    rng = np.random.default_rng(0)
    vdps = rng.uniform(2.0, 30.0, size=17)
    results = [_row(f"s{i}", float(v)) for i, v in enumerate(vdps)]
    s = cohort_summary(results)
    m = s["metrics"]["VDP"]
    assert m["n"] == 17
    assert m["mean"] == pytest.approx(np.mean(vdps))
    assert m["std"] == pytest.approx(np.std(vdps))
    assert m["min"] == pytest.approx(np.min(vdps))
    assert m["max"] == pytest.approx(np.max(vdps))
    assert m["median"] == pytest.approx(np.percentile(vdps, 50))
    assert m["p5"] == pytest.approx(np.percentile(vdps, 5))
    assert m["p95"] == pytest.approx(np.percentile(vdps, 95))


def test_failed_and_flagged_lanes_accounted():
    results = [
        _row("ok1", 10.0),
        _row("ok2", 20.0, CI_overflow=True),
        _row("sat", 30.0, CI_saturated_voxels=4),
        {"id": "dead", "valid": False, "error": "decode_failed"},
        {"id": "ghost", "resumed": True},
    ]
    s = cohort_summary(results)
    assert s["subjects"] == 5 and s["valid"] == 3
    assert s["failed"] == [{"id": "dead", "error": "decode_failed"}]
    assert s["resumed_without_metrics"] == ["ghost"]
    assert s["flags"]["ci_overflow"] == ["ok2"]
    assert s["flags"]["ci_saturated"] == ["sat"]
    assert s["metrics"]["VDP"]["n"] == 3
    # failed lanes never pollute the statistics
    assert s["metrics"]["VDP"]["mean"] == pytest.approx(20.0)


def test_nan_ci_counted_not_averaged():
    """CI is NaN for subjects with zero defect voxels (pipeline semantics);
    they appear in metrics.CI.nan, not in the mean."""
    results = [_row("a", 10.0, ci=4.0), _row("b", 0.0, ci=float("nan"))]
    s = cohort_summary(results)
    ci = s["metrics"]["CI"]
    assert ci["n"] == 1 and ci["nan"] == 1
    assert ci["mean"] == pytest.approx(4.0)
    assert math.isfinite(ci["std"])


def test_single_subject_percentiles():
    s = cohort_summary([_row("only", 7.5)])
    m = s["metrics"]["VDP"]
    assert m["p5"] == m["median"] == m["p95"] == 7.5


def test_empty_results():
    s = cohort_summary([])
    assert s["subjects"] == 0 and s["metrics"] == {}
