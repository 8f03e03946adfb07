"""Device CI vs the CPU oracle (first-crossing sphere growing)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ventjax.ops.ci import build_ci_geometry, calculate_ci, calculate_ci_staged
from ventjax.ops.ci_pairwise import (
    build_ci_pairwise_geometry,
    calculate_ci_pairwise,
)
from ventjax.oracle.ci_oracle import calculate_ci_oracle, subject_ci


def _fixed_defect():
    defect = np.zeros((40, 36, 8), np.float32)
    defect[5:12, 6:13, 2:4] = 1
    defect[20:29, 18:30, 3:6] = 1
    defect[0:4, 0:5, 0:2] = 1
    defect[35, 30, 7] = 1
    return defect


VOX = (1.5, 1.5, 10.0)


def _run(defect, mode="wrap", k=512):
    geom = build_ci_geometry(VOX, defect.shape, 50, mode)
    fn = jax.jit(lambda d: calculate_ci(d, geom, max_defect_voxels=k, chunk=128))
    ci, nsat, ovf = fn(jnp.asarray(defect))
    return np.asarray(ci), int(nsat), bool(ovf)


def test_ci_wrap_matches_oracle_bitwise_modulo_f32():
    defect = _fixed_defect()
    ci, nsat, ovf = _run(defect)
    want = calculate_ci_oracle(defect, vox=VOX, rmax=50)
    assert not ovf and nsat == 0
    # device stores radii in float32: only f32 rounding differences allowed
    assert np.array_equal(ci != 0, want != 0)
    assert np.abs(ci - want).max() < 2e-5


def test_ci_subject_percentile():
    defect = _fixed_defect()
    ci, _, _ = _run(defect)
    want = calculate_ci_oracle(defect, vox=VOX, rmax=50)
    assert subject_ci(ci.astype(np.float64), defect) == pytest.approx(
        subject_ci(want, defect), abs=2e-5
    )


def test_ci_empty_defect():
    ci, nsat, ovf = _run(np.zeros((40, 36, 8), np.float32))
    assert ci.sum() == 0 and nsat == 0 and not ovf


def test_ci_isolated_voxel():
    defect = np.zeros((32, 32, 8), np.float32)
    defect[16, 16, 4] = 1
    geom = build_ci_geometry(VOX, defect.shape, 50, "wrap")
    ci, _, _ = calculate_ci(jnp.asarray(defect), geom, max_defect_voxels=128, chunk=64)
    assert float(ci[16, 16, 4]) == pytest.approx(1.5)


def test_ci_overflow_flag():
    defect = np.zeros((32, 32, 8), np.float32)
    defect[4:20, 4:20, 2:6] = 1  # 1024 defect voxels > K=512
    geom = build_ci_geometry(VOX, defect.shape, 50, "wrap")
    _, _, ovf = calculate_ci(jnp.asarray(defect), geom, max_defect_voxels=512, chunk=128)
    assert bool(ovf)


def test_ci_staged_matches_oracle():
    defect = _fixed_defect()
    geom = build_ci_geometry(VOX, defect.shape, 50, "wrap")
    ci, nsat, ovf, sovf = calculate_ci_staged(
        jnp.asarray(defect), geom, max_defect_voxels=512
    )
    want = calculate_ci_oracle(defect, vox=VOX, rmax=50)
    assert int(sovf) == 0 and not bool(ovf) and int(nsat) == 0
    assert np.abs(np.asarray(ci) - want).max() < 2e-5


def test_ci_pairwise_matches_oracle():
    defect = _fixed_defect()
    geom = build_ci_pairwise_geometry(VOX, defect.shape, 50, "wrap")
    ci, nsat, ovf = calculate_ci_pairwise(
        jnp.asarray(defect), geom, max_defect_voxels=512, row_chunk=128
    )
    want = calculate_ci_oracle(defect, vox=VOX, rmax=50)
    assert not bool(ovf) and int(nsat) == 0
    assert np.abs(np.asarray(ci) - want).max() < 2e-5


def test_ci_pairwise_saturation():
    defect = np.ones((16, 16, 16), np.float32)
    geom = build_ci_pairwise_geometry((1.0, 1.0, 1.0), defect.shape, 6, "wrap")
    ci, nsat, _ = calculate_ci_pairwise(
        jnp.asarray(defect), geom, max_defect_voxels=4096, row_chunk=512
    )
    want = calculate_ci_oracle(defect, vox=(1.0, 1.0, 1.0), rmax=6, saturate=True)
    assert int(nsat) > 0
    assert np.abs(np.asarray(ci) - want).max() < 2e-5


def test_ci_pairwise_pad_matches_ladder_pad():
    defect = _fixed_defect()
    gp = build_ci_pairwise_geometry(VOX, defect.shape, 50, "pad")
    gl = build_ci_geometry(VOX, defect.shape, 50, "pad")
    ci_p, _, _ = calculate_ci_pairwise(jnp.asarray(defect), gp, 512, 128)
    ci_l, _, _ = calculate_ci(jnp.asarray(defect), gl, 512, 128)
    assert np.array_equal(np.asarray(ci_p), np.asarray(ci_l))


def test_ci_pairwise_random_defects_match_oracle(rng):
    """Randomized sparse defects, including border voxels (aliasing)."""
    defect = (rng.random((32, 28, 6)) > 0.97).astype(np.float32)
    geom = build_ci_pairwise_geometry(VOX, defect.shape, 50, "wrap")
    ci, _, _ = calculate_ci_pairwise(jnp.asarray(defect), geom, 256, 64)
    want = calculate_ci_oracle(defect, vox=VOX, rmax=50, saturate=True)
    assert np.abs(np.asarray(ci) - want).max() < 2e-5


def test_ci_pad_mode_interior_equals_wrap():
    """Away from borders the two modes must agree exactly."""
    defect = np.zeros((48, 48, 10), np.float32)
    defect[20:28, 20:28, 4:7] = 1  # deep interior cluster
    ci_w, _, _ = _run(defect, "wrap")
    ci_p, _, _ = _run(defect, "pad")
    assert np.array_equal(ci_w, ci_p)


def test_ci_engine_fallback_for_unprovable_geometry(rng):
    """Voxel sizes whose shell boundaries collide within float32 make the
    pairwise engine refuse at build time; build_geometry must fall back to
    the (always exact) gather ladder and produce oracle-identical maps."""
    from ventjax.config import DEFAULT_CONFIG
    from ventjax.ops.ci_pairwise import (
        CIPairwiseGeometry, build_ci_pairwise_geometry,
    )
    from ventjax.pipeline.analyze import build_geometry

    vox = (3.125, 3.125, 15.0)
    with pytest.raises(ValueError):
        build_ci_pairwise_geometry(vox, (32, 32, 6), 20, "wrap")
    cfg = DEFAULT_CONFIG.replace(ci_rmax=20)
    geom = build_geometry(vox, (32, 32, 6), cfg)
    assert not isinstance(geom, CIPairwiseGeometry)
    defect = (rng.random((32, 32, 6)) > 0.95).astype(np.float32)
    ci, nsat, ovf, sovf = calculate_ci_staged(jnp.asarray(defect), geom, 512)
    want = calculate_ci_oracle(defect, vox=vox, rmax=20, saturate=True)
    assert not bool(ovf) and int(sovf) == 0
    assert np.abs(np.asarray(ci) - want).max() == 0.0


def test_ci_saturation_counted():
    """An all-defect volume under wrap aliasing never crosses below the 0.5
    fraction (every aliased index is defect), so every voxel saturates —
    where the reference raises ValueError (CI.py:101-104) we clamp at the
    last tested radius and count."""
    defect = np.ones((16, 16, 16), np.float32)
    geom = build_ci_geometry((1.0, 1.0, 1.0), defect.shape, 6, "wrap")
    ci, nsat, ovf = calculate_ci(
        jnp.asarray(defect), geom, max_defect_voxels=4096, chunk=256
    )
    oracle_map = calculate_ci_oracle(
        defect, vox=(1.0, 1.0, 1.0), rmax=6, saturate=True
    )
    assert not ovf
    # central voxels never see a non-defect index -> saturated
    assert int(nsat) > 0
    assert np.abs(np.asarray(ci) - oracle_map).max() < 2e-5
