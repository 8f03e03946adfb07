"""Behavioral tests for the vendored CPU oracle itself.

The oracle is the ground truth for the device ops, so it gets its own pins:
- the CI oracle output for a fixed defect array is pinned by hash; that exact
  array was verified bit-identical to the output of the reference CI module
  (/root/reference/CI.py calculate_CI, 'fast' path) when this pin was created;
- N4 must substantially remove a planted multiplicative bias field;
- the quirky SNR noise-mask and percentile semantics behave as documented.
"""
import hashlib

import numpy as np
import pytest

from ventjax.io.phantom import make_phantom
from ventjax.oracle import (
    calculate_border,
    calculate_ci_oracle,
    calculate_snr,
    crop_to_data,
    n4_bias_correction_oracle,
    normalize,
    vdp_kmeans,
    vdp_linear_binning,
    vdp_mean_anchored,
)
from ventjax.oracle.ci_oracle import subject_ci


def _fixed_defect():
    defect = np.zeros((40, 36, 8))
    defect[5:12, 6:13, 2:4] = 1
    defect[20:29, 18:30, 3:6] = 1
    defect[0:4, 0:5, 0:2] = 1  # border cluster: exercises index aliasing
    defect[35, 30, 7] = 1      # isolated voxel: CV = first shell radius
    return defect


def test_ci_oracle_regression_pin():
    ci = calculate_ci_oracle(_fixed_defect(), vox=[1.5, 1.5, 10.0], rmax=50)
    h = hashlib.sha256(np.ascontiguousarray(ci).tobytes()).hexdigest()
    # Verified bit-identical to /root/reference CI.calculate_CI on creation.
    assert h == "42e4711abd63ead741b43c4a7ccb01199fb4e7049d03c7d8486fc75bd5ce03dd"


def test_ci_isolated_voxel_gets_first_shell_radius():
    defect = np.zeros((32, 32, 8))
    defect[16, 16, 4] = 1
    ci = calculate_ci_oracle(defect, vox=[1.5, 1.5, 10.0], rmax=50)
    # ball_1 = center + first shell (r=1.0 scaled): fraction 1/5 < 0.5, so the
    # first failing ball has radius 1.0 and CV*min(vox) = 1.5 mm.
    assert ci[16, 16, 4] == pytest.approx(1.0 * 1.5)
    assert (ci > 0).sum() == 1


def test_ci_subject_percentile():
    defect = _fixed_defect()
    ci = calculate_ci_oracle(defect, vox=[1.5, 1.5, 10.0], rmax=50)
    cvlist = np.sort(ci[defect > 0])
    want = cvlist[int(0.95 * len(cvlist))]
    assert subject_ci(ci, defect) == want


def test_n4_removes_planted_bias():
    ph = make_phantom(shape=(64, 64, 8), seed=1, bias_strength=0.5)
    corrected, field = n4_bias_correction_oracle(ph.hp, ph.mask, return_field=True)
    m = ph.mask > 0
    true_log = np.log(ph.true_bias)[m]
    est = field[m]
    tb = true_log - true_log.mean()
    eb = est - est.mean()
    corr = np.corrcoef(tb, eb)[0, 1]
    assert corr > 0.85
    assert (tb - eb).std() < 0.6 * tb.std()


def test_normalize_zero_range():
    x = np.full((4, 4), 3.0)
    assert np.array_equal(normalize(x), x)


def test_border_is_outline():
    a = np.zeros((16, 16, 2))
    a[4:10, 5:11, :] = 1
    b = calculate_border(a)
    assert b[4, 7, 0] == 1 and b[9, 7, 0] == 1   # edges marked
    assert b[7, 7, 0] == 0                        # deep interior not marked
    assert b[0, 0, 0] == 0


def test_crop_to_data():
    a = np.zeros((20, 22, 6))
    a[5:9, 7:12, 2:4] = 1
    c, rr, cc, ss = crop_to_data(a, border=2)
    assert rr == list(range(3, 11)) and cc == list(range(5, 14))
    assert ss == list(range(2, 4))  # borderSlices=False: no slice padding
    assert c.shape == (8, 9, 2)


def test_snr_increases_with_signal():
    ph = make_phantom(shape=(64, 64, 8), seed=2)
    snr1 = calculate_snr(ph.hp, ph.mask)
    boosted = ph.hp * np.where(ph.mask > 0, 3.0, 1.0)
    snr2 = calculate_snr(boosted, ph.mask)
    assert snr2 > snr1 > 1.0


def test_vdp_detects_planted_defects():
    ph = make_phantom(shape=(64, 64, 8), seed=4)
    n4 = n4_bias_correction_oracle(ph.hp, ph.mask)
    defect, vdp = vdp_mean_anchored(n4, ph.mask)
    planted_pct = 100 * ph.true_defect.sum() / ph.mask.sum()
    assert vdp == pytest.approx(planted_pct, abs=3.0)
    # defects should overlap the planted ones
    overlap = (defect * ph.true_defect).sum() / max(ph.true_defect.sum(), 1)
    assert overlap > 0.6

    lb, vdp_lb = vdp_linear_binning(n4, ph.mask)
    assert set(np.unique(lb)).issubset({0, 1, 2, 3, 4, 5, 6})
    assert vdp_lb > 0

    km, vdp_km = vdp_kmeans(n4, ph.mask)
    assert 0 < vdp_km < 60


def test_lb_uses_floor_99th_index():
    # Tiny case where int(len*.99) is distinguishable from other conventions.
    n4 = np.arange(1.0, 101.0).reshape(10, 10, 1)
    mask = np.ones_like(n4)
    lb, _ = vdp_linear_binning(n4, mask)
    # normalizer = sorted[int(100*.99)] = sorted[99] = 100.0
    # so norm max == 1.0 -> top bin 6 present
    assert lb.max() == 6
