"""Randomized facade-level end-to-end battery vs the full oracle chain.

The 30-study parity sweep (round 3) ran at pipeline level on the two
reference LUT geometries; this battery goes through the PUBLIC facade —
on-disk synthetic DICOM study -> Vent_Analysis ctor (codec, header, voxel
discovery) -> calculate_VDP -> calculate_CI — on random study geometries,
and checks every scientific metric against the CPU oracle chain
(N4 -> VDPs -> CI) run on the same decoded arrays.

Budgets: |dVDP| and |dVDP_lb| < 0.1pp (the driver fidelity contract),
|dVDP_km| < 0.1pp, CI map within 2e-5 mm of the oracle on the ORACLE's
defect array when the defect arrays agree (they must, to the medfilt
bit level, since N4 differences are sub-percent).
"""
import os

import numpy as np
import pytest

from ventjax import oracle
from ventjax.compat import Vent_Analysis
from ventjax.config import DEFAULT_CONFIG
from ventjax.io.synthetic import write_study
from ventjax.oracle.ci_oracle import calculate_ci_oracle

RMAX = 15


@pytest.mark.parametrize("seed", range(3))
def test_facade_random_geometry_vs_oracle(tmp_path, seed):
    rng = np.random.default_rng(4000 + seed)
    shape = (int(rng.choice([32, 48])), int(rng.choice([32, 48])),
             int(rng.integers(4, 8)))
    vox = (round(float(rng.uniform(1.0, 3.0)), 2),
           round(float(rng.uniform(1.0, 3.0)), 2),
           round(float(rng.uniform(6.0, 14.0)), 1))
    root = str(tmp_path / f"study{seed}")
    ph = write_study(root, shape=shape, vox=vox, seed=seed)

    cfg = DEFAULT_CONFIG.replace(ci_rmax=RMAX)
    v = Vent_Analysis(xenon_path=os.path.join(root, "xenon.dcm"),
                      mask_path=os.path.join(root, "mask"), config=cfg)
    assert v.vox == [pytest.approx(x) for x in vox]
    v.calculate_VDP()
    v.calculate_CI()

    n4_or = oracle.n4_bias_correction_oracle(ph.hp, ph.mask)
    d_or, vdp_or = oracle.vdp_mean_anchored(n4_or, ph.mask)
    _, lb_or = oracle.vdp_linear_binning(n4_or, ph.mask)
    _, km_or = oracle.vdp_kmeans(n4_or, ph.mask)

    assert abs(v.metadata["VDP"] - vdp_or) < 0.1, (shape, vox)
    assert abs(v.metadata["VDP_lb"] - lb_or) < 0.1, (shape, vox)
    assert abs(v.metadata["VDP_km"] - km_or) < 0.1, (shape, vox)
    # sub-percent N4 agreement must leave the thresholded defect arrays
    # identical on phantom data (no voxel sits on the 0.6 boundary)
    assert np.array_equal(v.defectArray, d_or), (shape, vox)
    ci_or = calculate_ci_oracle(d_or, vox=vox, rmax=RMAX, saturate=True)
    assert np.abs(v.CIarray - ci_or).max() < 2e-5, (shape, vox)
