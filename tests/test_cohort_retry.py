"""Async overflow-retry path of the cohort driver (round-2 VERDICT item 4).

The driver dispatches batch N+1 without waiting for batch N's overflow
flags — the flags are read in the export workers, and overflowed batches
come back through a retry queue at grown pads.  These tests force the
retry path (defect counts above the initial 512-voxel sticky bucket) and
assert the exported metrics are complete, overflow-free, and identical to
a direct non-streaming run.
"""
import json
import os

import numpy as np

from ventjax.config import DEFAULT_CONFIG
from ventjax.io.phantom import make_phantom
from ventjax.io.synthetic import write_study
from ventjax.pipeline.cohort import run_cohort


def _big_defect_phantom(seed):
    """A phantom whose defect count exceeds the driver's initial 512-voxel
    CI bucket, so the first dispatch is guaranteed to overflow."""
    ph = make_phantom(shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=seed,
                      n_defects=6, defect_radius_vox=(6.0, 8.0, 10.0))
    return ph


def test_cohort_retry_on_overflow_produces_clean_metrics(tmp_path):
    manifest = []
    for i in range(4):
        root = str(tmp_path / f"study{i}")
        ph = _big_defect_phantom(seed=20 + i)
        write_study(root, phantom=ph)
        assert ph.true_defect.sum() > 512  # forces the retry path
        manifest.append({"id": f"s{i}", "xenon": f"{root}/xenon.dcm",
                         "mask": f"{root}/mask"})

    out = str(tmp_path / "out")
    cfg = DEFAULT_CONFIG.replace(ci_max_defect_voxels=8192)
    results = run_cohort(manifest, out, config=cfg, batch_size=2,
                         use_mesh=False)
    assert len(results) == 4
    for r in results:
        assert r["valid"]
        assert not r["CI_overflow"], r
        assert not r["N4_overflow"], r
        assert r["VDP"] > 0
    for i in range(4):
        assert os.path.exists(os.path.join(out, f"s{i}", ".done"))


def test_cohort_retry_metrics_match_direct_run(tmp_path):
    """Streaming driver (with its async retry) == direct pipeline run."""
    import jax
    import jax.numpy as jnp

    from ventjax.pipeline.analyze import analyze_cohort, build_geometry

    root = str(tmp_path / "study")
    ph = _big_defect_phantom(seed=31)
    write_study(root, phantom=ph)
    out = str(tmp_path / "out")
    cfg = DEFAULT_CONFIG.replace(ci_max_defect_voxels=8192)
    results = run_cohort(
        [{"id": "s", "xenon": f"{root}/xenon.dcm", "mask": f"{root}/mask"}],
        out, config=cfg, batch_size=1, use_mesh=False)

    n_def = int(ph.true_defect.sum())
    K = max(256, 1 << int(np.ceil(np.log2(n_def * 2))))
    direct_cfg = cfg.replace(ci_max_defect_voxels=K)
    geom = build_geometry((1.5, 1.5, 10.0), (64, 64, 8), direct_cfg)
    with open(os.path.join(root, "hp_f32.npy"), "wb") as f:
        np.save(f, ph.hp)
    res = jax.jit(lambda h, m: analyze_cohort(h, m, geom, direct_cfg))(
        jnp.asarray(ph.hp[None].astype(np.float32)),
        jnp.asarray(ph.mask[None].astype(np.float32)),
    )
    # The driver decodes from uint16 DICOM, the direct run from float32 —
    # the phantom generator quantizes to integers so both see the same data.
    assert abs(results[0]["VDP"] - float(res.metrics.vdp[0])) < 1e-4
    assert abs(results[0]["CI"] - float(res.metrics.ci[0])) < 1e-4


def test_cohort_overflow_flags_stand_at_ceiling(tmp_path):
    """With the config ceiling below the defect count, the driver must NOT
    retry forever — the overflow flag stands in the exported metrics."""
    root = str(tmp_path / "study")
    ph = _big_defect_phantom(seed=40)
    write_study(root, phantom=ph)
    out = str(tmp_path / "out")
    cfg = DEFAULT_CONFIG.replace(ci_max_defect_voxels=512)  # hard ceiling
    results = run_cohort(
        [{"id": "s", "xenon": f"{root}/xenon.dcm", "mask": f"{root}/mask"}],
        out, config=cfg, batch_size=1, use_mesh=False)
    assert len(results) == 1
    assert results[0]["CI_overflow"]  # flagged, not silent, not hung
    m = json.load(open(os.path.join(out, "s", "metrics.json")))
    assert m["CI_overflow"]


def test_bump_policy_escalates_tail_at_pad_ceiling():
    """bump_for_retry: pad doubling up to the ceiling, then ONE tail
    escalation (full-width sort tail), then the flag stands (round-5)."""
    from ventjax.config import DEFAULT_CONFIG
    from ventjax.pipeline.cohort import _GeometryRunner

    cfg = DEFAULT_CONFIG.replace(ci_max_defect_voxels=1024)
    # shape big enough that the n4 pad can still double (cap = volume)
    r = _GeometryRunner((64, 64, 8), (1.5, 1.5, 10.0), cfg, None, 1)
    assert r.ci_bucket == 512 and not r.ci_tail_full
    assert r.bump_for_retry(True, False, (512, 8192, False))
    assert r.ci_bucket == 1024 and not r.ci_tail_full
    assert r.bump_for_retry(True, False, (1024, 8192, False))
    assert r.ci_bucket == 1024 and r.ci_tail_full  # ceiling -> escalate
    # escalated run still flagged -> nothing left, flag stands
    assert not r.bump_for_retry(True, False, (1024, 8192, True))
    # n4 growth is independent and still works at the ci ceiling
    assert r.bump_for_retry(False, True, (1024, 8192, True))
    assert r.n4_bucket == 16384


def test_tail_escalation_clears_dense_cluster_overflow():
    """A dense tall cluster (the severe-disease shape) overflows the CI
    TAIL budget even at the pad ceiling — the sort tail gets every
    head-uncrossed interior row; the driver's full-width-tail escalation
    must clear the flag and produce unsaturated CI values (<= Rmax)."""
    import jax
    import jax.numpy as jnp

    from ventjax.config import DEFAULT_CONFIG
    from ventjax.pipeline.cohort import (
        _GeometryRunner, _decode_host_pack,
    )

    shape, vox = (48, 48, 12), (1.5, 1.5, 10.0)
    cfg = DEFAULT_CONFIG.replace(
        ci_max_defect_voxels=8192, n4_fitting_levels=2, n4_max_iters=5,
    )
    hp = np.zeros(shape, np.float32)
    mask = np.zeros(shape, np.float32)
    mask[4:44, 4:44, :] = 1.0
    hp[mask > 0] = 400.0
    hp[12:36, 12:36, 1:11] = 4.0   # deep 24x24x10 defect cluster
    runner = _GeometryRunner(shape, vox, cfg, None, 1, compact_export=True)
    runner.ci_bucket = 8192  # skip the pad ladder straight to the ceiling

    batch = [({"id": "t"}, (hp, mask, vox, None, None))]
    ovf = None
    for attempt in range(3):
        pack, pads = runner.dispatch(batch)
        host = _decode_host_pack(
            jax.tree_util.tree_map(np.asarray, pack),
            runner.blob_schema(*pads[:2]))
        ovf = bool(host["metrics"].ci_overflow[0])
        if not ovf:
            break
        assert runner.bump_for_retry(ovf, False, pads), \
            "driver gave up while the tail escalation was still available"
    assert attempt == 1, "expected exactly one escalation retry"
    assert not ovf
    assert runner.ci_tail_full
    n = int(host["n_def"][0])
    assert n > 8192 // 8, "load was supposed to exceed the default tail"
    ci_vals = host["ci_cv"][0][:n]
    assert ci_vals.max() <= cfg.ci_rmax, \
        "saturated sentinel survived the escalation"


def test_decode_subject_narrows_upload_dtypes(tmp_path):
    """_decode_subject ships integral volumes narrow (uint16 hp / uint8
    mask — the device casts back to f32 in-graph, bit-identical) and falls
    back to f32 when values are not exactly representable."""
    from ventjax.io.synthetic import write_study
    from ventjax.pipeline.cohort import _decode_subject

    root = str(tmp_path / "s")
    write_study(root, shape=(32, 32, 4), vox=(1.5, 1.5, 10.0), seed=1,
                with_proton=False)
    hp, mask, vox, ds, proton = _decode_subject(
        {"id": "s", "xenon": f"{root}/xenon.dcm", "mask": f"{root}/mask"})
    assert hp is not None
    assert hp.dtype == np.uint16, hp.dtype
    assert mask.dtype == np.uint8, mask.dtype
    # exactness: the narrow copies round-trip to the f32 the device sees
    assert np.array_equal(hp.astype(np.float32).astype(np.uint16), hp)


def test_ceiling_overflow_falls_back_to_dense_defect_export(tmp_path):
    """A subject whose defect count exceeds the CI pad CEILING exhausts
    every budget (pad ladder + tail escalation) — the flag stands, but the
    exported defect channel must still be COMPLETE: the driver re-runs the
    batch with the dense pack (whose uint8 defect always carries every
    voxel) instead of exporting the compact pack's first-K truncation
    (round-5 review finding)."""
    import json

    from ventjax.config import DEFAULT_CONFIG
    from ventjax.io.nifti import load as nifti_load
    from ventjax.io.phantom import make_phantom
    from ventjax.io.synthetic import write_study
    from ventjax.pipeline.cohort import run_cohort

    shape, vox = (48, 48, 8), (1.5, 1.5, 10.0)
    cfg = DEFAULT_CONFIG.replace(
        ci_max_defect_voxels=256,   # deliberately tiny ceiling
        n4_fitting_levels=2, n4_max_iters=5,
    )
    ph = make_phantom(shape=shape, vox=vox, seed=31, n_defects=0)
    hp = np.asarray(ph.hp).copy()
    hp[16:28, 16:28, 2:6] = np.minimum(hp[16:28, 16:28, 2:6], 2.0)
    ph.hp[...] = hp                 # ~500+ defect voxels > ceiling 256
    root = str(tmp_path / "s0")
    write_study(root, phantom=ph)
    res = run_cohort(
        [{"id": "s0", "xenon": f"{root}/xenon.dcm", "mask": f"{root}/mask"}],
        str(tmp_path / "out"), config=cfg, use_mesh=False, batch_size=1,
    )
    m = res[0]
    assert m["valid"] and m["CI_overflow"], m
    data, _ = nifti_load(str(tmp_path / "out" / "s0" / "s0_dataArray.nii"))
    n_defect_exported = int((data[..., 4] > 0).sum())
    vox_cc = float(np.prod(vox)) / 1000.0
    n_defect_metrics = int(round(m["DefectVolume"] * 1000.0 / vox_cc))
    assert n_defect_exported == n_defect_metrics, (
        n_defect_exported, n_defect_metrics)
    assert n_defect_exported > cfg.ci_max_defect_voxels
    # CI channel still carries only the flagged first-K values
    assert int((data[..., 5] > 0).sum()) <= cfg.ci_max_defect_voxels


def test_invalid_lane_does_not_drive_escalation(tmp_path):
    """An empty-mask subject's safe-ones-mask garbage always flags CI
    overflow; the driver must NOT burn the pad ladder / tail escalation /
    dense fallback for it (round-5 review finding) — only VALID lanes'
    overflows drive retries.  The healthy subject in the same batch still
    exports normally."""
    from ventjax.config import DEFAULT_CONFIG
    from ventjax.io.phantom import make_phantom
    from ventjax.io.synthetic import write_study
    from ventjax.pipeline.cohort import run_cohort

    shape, vox = (32, 32, 8), (1.5, 1.5, 10.0)
    cfg = DEFAULT_CONFIG.replace(
        ci_max_defect_voxels=512, ci_rmax=12, n4_fitting_levels=2,
        n4_max_iters=5,
    )
    ok = make_phantom(shape=shape, vox=vox, seed=61)
    bad = make_phantom(shape=shape, vox=vox, seed=62)
    bad.mask[...] = 0.0
    man = []
    for sid, ph in (("ok", ok), ("bad", bad)):
        root = str(tmp_path / sid)
        write_study(root, phantom=ph)
        man.append({"id": sid, "xenon": f"{root}/xenon.dcm",
                    "mask": f"{root}/mask"})
    runners = {}
    res = run_cohort(man, str(tmp_path / "out"), config=cfg,
                     use_mesh=False, batch_size=2, runners=runners)
    by_id = {r["id"]: r for r in res}
    assert by_id["ok"]["valid"] and not by_id["bad"]["valid"]
    assert by_id["bad"]["CI_overflow"]  # the flag still exports
    runner = next(iter(runners.values()))
    # no ladder, no escalation, no dense fallback for the invalid lane
    assert runner.ci_bucket == 512
    assert not runner.ci_tail_full
    assert not runner.ci_force_dense
