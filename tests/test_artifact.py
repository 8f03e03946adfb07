"""Versioned NPZ study artifact (report.export.save_npz / load_npz).

SURVEY.md §5's checkpoint plan names "a versioned study artifact (NPZ per
subject: all six channels of C14's 4-D array + metadata JSON)" alongside the
reference's pickle round-trip (Vent_Analysis.py:542-559).  These tests pin:
round-trip equality of every array attribute and metadata key, pickle-free
loading (np.load with allow_pickle=False), VentConfig reconstruction, the
future-version guard, and the compat ctor resume path.
"""
import json
import os

import numpy as np
import pytest

from ventjax.compat import Vent_Analysis
from ventjax.config import DEFAULT_CONFIG, VentConfig
from ventjax.report import export as rexport


@pytest.fixture(scope="module")
def analyzed(tmp_path_factory):
    from ventjax.io.synthetic import write_study

    root = tmp_path_factory.mktemp("artifact_study")
    write_study(str(root), shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=11)
    v = Vent_Analysis(
        xenon_path=os.path.join(str(root), "xenon.dcm"),
        mask_path=os.path.join(str(root), "mask"),
    )
    v.calculate_VDP()
    return v


def test_round_trip_arrays_and_metadata(analyzed, tmp_path):
    path = analyzed.saveNpz(str(tmp_path / "study.npz"))
    state = rexport.load_npz(path)
    for attr in ("HPvent", "mask", "mask_border", "N4HPvent",
                 "defectArray", "defectArrayLB", "defectArrayKM",
                 "defectBorder"):
        got = state[attr]
        want = np.asarray(getattr(analyzed, attr))
        assert got.dtype == want.dtype, attr
        np.testing.assert_array_equal(got, want, err_msg=attr)
    # metadata survives with every key; numeric metrics exactly
    assert set(state["metadata"]) == set(analyzed.metadata)
    for key in ("SNR", "VDP", "VDP_lb", "VDP_km", "LungVolume",
                "DefectVolume"):
        assert state["metadata"][key] == analyzed.metadata[key]
    assert state["vox"] == [1.5, 1.5, 10.0]
    # the DICOM ds is intentionally not in the NPZ; it is recorded as skipped
    assert "ds" not in state


def test_loads_without_pickle_or_ventjax_types(analyzed, tmp_path):
    """The artifact must open under allow_pickle=False — i.e. no object
    arrays, no class references, nothing executable."""
    path = analyzed.saveNpz(str(tmp_path / "study.npz"))
    with np.load(path, allow_pickle=False) as z:
        names = set(z.files)
        assert "HPvent" in names and "mask" in names
        manifest = json.loads(str(z["__ventjax_artifact__"]))
    assert manifest["artifact_version"] == rexport.ARTIFACT_VERSION
    assert manifest["skipped"].get("ds", "").startswith("Dataset")
    assert manifest["config"]["n4_histogram_bins"] == \
        DEFAULT_CONFIG.n4_histogram_bins


def test_ctor_resume_from_npz(analyzed, tmp_path):
    path = analyzed.saveNpz(str(tmp_path / "study.npz"))
    v2 = Vent_Analysis(npz_path=path)
    np.testing.assert_array_equal(v2.N4HPvent, analyzed.N4HPvent)
    np.testing.assert_array_equal(v2.defectArray, analyzed.defectArray)
    assert v2.metadata["VDP"] == analyzed.metadata["VDP"]
    assert isinstance(v2.config, VentConfig)
    assert v2.config == analyzed.config
    # resumed state supports downstream work: CI on the restored defect map
    v2.vox = [float(x) for x in v2.vox]
    v2.calculate_CI()
    assert np.asarray(v2.CIarray).shape == np.asarray(v2.defectArray).shape


def test_future_version_guard(tmp_path):
    path = str(tmp_path / "future.npz")
    manifest = {"artifact_version": rexport.ARTIFACT_VERSION + 1,
                "scalars": {}, "dicts": {}, "config": None, "skipped": {}}
    np.savez_compressed(
        path, __ventjax_artifact__=np.asarray(json.dumps(manifest)))
    with pytest.raises(ValueError, match="artifact_version"):
        rexport.load_npz(path)


def test_non_artifact_npz_rejected(tmp_path):
    path = str(tmp_path / "plain.npz")
    np.savez(path, a=np.zeros(3))
    with pytest.raises(ValueError, match="not a ventjax study artifact"):
        rexport.load_npz(path)


def test_config_field_drift_loads_known_fields(tmp_path):
    """An artifact whose config has unknown fields (written by a different
    version) loads as a real VentConfig: known keys applied, unknown keys
    dropped with a warning — never a raw dict that would AttributeError in
    exportHistogram/screenShot far from the load site."""
    manifest = {
        "artifact_version": 1, "scalars": {}, "dicts": {},
        "config": {"no_such_field": 1, "vdp_thresh": 0.7}, "skipped": {},
    }
    path = str(tmp_path / "drift.npz")
    np.savez_compressed(
        path, __ventjax_artifact__=np.asarray(json.dumps(manifest)))
    with pytest.warns(UserWarning, match="no_such_field"):
        state = rexport.load_npz(path)
    assert isinstance(state["config"], VentConfig)
    assert state["config"].vdp_thresh == 0.7
    assert state["config"].snr_fov_buffer == DEFAULT_CONFIG.snr_fov_buffer


def test_cohort_npz_export_is_ctor_resumable(tmp_path):
    """cohort --npz writes a per-subject artifact the compat ctor can
    resume, with config provenance in the manifest."""
    import json as _json

    from ventjax.cli import main
    from ventjax.io.synthetic import write_study

    root = tmp_path / "study"
    write_study(str(root), shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=13)
    manifest = [{"id": "s0", "xenon": str(root / "xenon.dcm"),
                 "mask": str(root / "mask")}]
    mpath = str(tmp_path / "m.json")
    _json.dump(manifest, open(mpath, "w"))
    out = tmp_path / "cohort"
    rc = main(["cohort", "--manifest", mpath, "--out", str(out), "--npz"])
    assert rc == 0
    npz = str(out / "s0" / "s0.npz")
    v = Vent_Analysis(npz_path=npz)
    metrics = _json.load(open(out / "s0" / "metrics.json"))
    assert v.metadata["VDP"] == metrics["VDP"]
    assert np.asarray(v.CIarray).shape == (64, 64, 8)
    assert isinstance(v.config, VentConfig)
    # the pipeline wrote the artifact before the .done marker
    assert os.path.exists(str(out / "s0" / ".done"))


def test_cli_npz_flag(tmp_path):
    from ventjax.cli import main
    from ventjax.io.synthetic import write_study

    root = tmp_path / "study"
    write_study(str(root), shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=12)
    out = tmp_path / "out"
    rc = main([
        "analyze", "--xenon", str(root / "xenon.dcm"),
        "--mask", str(root / "mask"), "--out", str(out),
        "--no-ci", "--npz", "--filename", "npztest",
    ])
    assert rc == 0
    state = rexport.load_npz(str(out / "npztest.npz"))
    assert float(state["metadata"]["VDP"]) > 0


def test_npz_mutation_fuzz(tmp_path):
    """Truncations and byte-flips of the artifact must surface as clean
    ValueError/OSError (np.load's internals otherwise leak BadZipFile,
    zlib.error, and tokenize.TokenError), never crash or hang."""
    state = {"HPvent": np.random.default_rng(3).random((16, 16, 4),
                                                       np.float32),
             "mask": np.ones((16, 16, 4)),
             "metadata": {"VDP": 5.0}, "vox": [1.5, 1.5, 10.0]}
    p = str(tmp_path / "a.npz")
    rexport.save_npz(state, p)
    raw = open(p, "rb").read()
    rng = np.random.default_rng(0)
    mut = str(tmp_path / "mut.npz")
    ok = clean = 0
    for i in range(200):
        if i % 2 == 0:
            data = raw[:int(rng.integers(1, len(raw)))]
        else:
            b = bytearray(raw)
            j = int(rng.integers(len(b)))
            b[j] ^= 1 << int(rng.integers(8))
            data = bytes(b)
        with open(mut, "wb") as f:
            f.write(data)
        try:
            rexport.load_npz(mut)
            ok += 1  # benign flip in array payload bytes
        except (ValueError, OSError, EOFError, KeyError):
            clean += 1
    assert ok + clean == 200
    assert clean > 100  # most mutations must be detected, not absorbed


def test_non_config_dataclass_skipped_config_preserved(tmp_path):
    """A dataclass under any key but 'config' (e.g. a parsed TwixScan in
    raw_twix, which embeds ndarrays json can't serialize) is recorded as
    skipped; the real VentConfig is neither crashed on nor replaced."""
    import dataclasses

    @dataclasses.dataclass
    class FakeTwix:
        data: np.ndarray

    state = {"HPvent": np.ones((4, 4, 2), np.float32),
             "config": DEFAULT_CONFIG,
             "raw_twix": FakeTwix(np.zeros(3)),
             "metadata": {"VDP": 1.0}}
    p = rexport.save_npz(state, str(tmp_path / "t.npz"))
    got = rexport.load_npz(p)
    assert isinstance(got["config"], VentConfig)
    assert got["config"] == DEFAULT_CONFIG
    assert "raw_twix" not in got
    with np.load(p, allow_pickle=False) as z:
        manifest = json.loads(str(z["__ventjax_artifact__"]))
    assert manifest["skipped"]["raw_twix"] == "FakeTwix"


def test_save_npz_appends_suffix(tmp_path):
    """np.savez appends .npz to suffix-less paths; the returned path must
    name the file actually written."""
    p = rexport.save_npz({"HPvent": np.ones(3)}, str(tmp_path / "study"))
    assert p.endswith("study.npz") and os.path.exists(p)
    rexport.load_npz(p)


def test_ctor_rejects_ambiguous_resume(tmp_path):
    with pytest.raises(ValueError, match="at most one"):
        Vent_Analysis(pickle_path="a.pkl", npz_path="b.npz")
