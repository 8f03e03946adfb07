"""Randomized voxel-geometry sweep for the CI engines.

build_geometry picks the pairwise engine where its float32-exactness proof
holds and falls back to the gather ladder otherwise
(ventjax/pipeline/analyze.py:200-224).  Existing tests pin a handful of
geometries (the two reference LUTs, one known fallback, isotropic); this
sweep draws random clinical-range voxel triples and asserts whichever
engine gets selected matches the CPU oracle (reference CI.py:87-145
semantics incl. wrap aliasing) to the 2e-5 mm budget.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ventjax.config import DEFAULT_CONFIG
from ventjax.oracle.ci_oracle import calculate_ci_oracle
from ventjax.ops.ci import calculate_ci_staged
from ventjax.ops.ci_pairwise import CIPairwiseGeometry, calculate_ci_pairwise
from ventjax.pipeline.analyze import build_geometry

RMAX = 12


def _run_selected_engine(defect, vox, shape, engine=None):
    cfg = DEFAULT_CONFIG.replace(ci_rmax=RMAX)
    if engine is not None:
        cfg = cfg.replace(ci_engine=engine)
    geom = build_geometry(vox, shape, cfg)
    d = jnp.asarray(defect)
    if isinstance(geom, CIPairwiseGeometry):
        ci, _, ovf = calculate_ci_pairwise(d, geom, 512)
        kind = "pairwise"
    else:
        ci, _, ovf, _ = calculate_ci_staged(d, geom, 512)
        kind = "ladder"
    assert not bool(np.asarray(ovf)), (vox, kind)
    return np.asarray(ci), kind


@pytest.mark.parametrize("seed", range(10))
def test_ci_random_geometry_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    vox = (round(float(rng.uniform(0.8, 4.0)), 3),
           round(float(rng.uniform(0.8, 4.0)), 3),
           round(float(rng.uniform(5.0, 15.0)), 3))
    shape = (16, 16, 4)
    defect = (rng.random(shape) < 0.04).astype(np.float64)
    if defect.sum() == 0:
        defect[8, 8, 2] = 1.0
    got, kind = _run_selected_engine(defect, vox, shape)
    want = calculate_ci_oracle(defect, vox=vox, rmax=RMAX, saturate=True)
    assert np.abs(got - want).max() < 2e-5, (vox, kind)


@pytest.mark.parametrize("seed", range(3))
def test_ci_random_geometry_ladder_engine(seed):
    """The gather-ladder engine on the same random-geometry draw (all ten
    draws above happen to pass the pairwise proof, so force the ladder)."""
    rng = np.random.default_rng(1000 + seed)
    vox = (round(float(rng.uniform(0.8, 4.0)), 3),
           round(float(rng.uniform(0.8, 4.0)), 3),
           round(float(rng.uniform(5.0, 15.0)), 3))
    shape = (16, 16, 4)
    defect = (rng.random(shape) < 0.04).astype(np.float64)
    if defect.sum() == 0:
        defect[8, 8, 2] = 1.0
    got, kind = _run_selected_engine(defect, vox, shape, engine="ladder")
    assert kind == "ladder"
    want = calculate_ci_oracle(defect, vox=vox, rmax=RMAX, saturate=True)
    assert np.abs(got - want).max() < 2e-5, (vox, kind)
