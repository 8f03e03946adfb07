"""Golden-file tests (SURVEY.md §4 item 2).

The reference ships three data artifacts that pin our geometry and report
path: two sphere-shell LUTs (1.5x1.5x10.0_50.npy, 2.0x2.0x11.5_50.npy) and
the parula.npy colormap table.  Rather than vendoring megabytes of goldens,
we pin the SHA256 of each artifact's raw float64 buffer (computed once from
the reference artifacts) and require our builders to reproduce the bytes
bit-exactly.
"""
import hashlib

import numpy as np

from ventjax.oracle.ci_oracle import sphere_pixels
from ventjax.report.parula import PARULA_64

GOLDEN_SHA256 = {
    # sphere LUT for vox=[1.5,1.5,10.0], Rmax=50 — 78,659 x 4 float64
    (1.5, 1.5, 10.0): "530f10b00f91b88fbb521b764589ffa4504bc006bc14713fb7a2ba1050be8956",
    # sphere LUT for vox=[2.0,2.0,11.5], Rmax=50 — 91,045 x 4 float64
    (2.0, 2.0, 11.5): "de5b5fad4e5ef27101a5e8b8c8a39114fb31695a3c087c150c6f8bd772b31b2c",
}
PARULA_SHA256 = "edd3efc9d5bd56c4092023c40fc5d14ce00bc01635ddac9f85729ac97675c669"
GOLDEN_ROWS = {(1.5, 1.5, 10.0): 78659, (2.0, 2.0, 11.5): 91045}


def _sha(a: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()


def test_sphere_lut_bit_exact():
    for vox, want in GOLDEN_SHA256.items():
        px = sphere_pixels(vox, 50)
        assert px.shape == (GOLDEN_ROWS[vox], 4)
        assert px.dtype == np.float64
        assert _sha(px) == want


def test_sphere_lut_structure():
    px = sphere_pixels((1.5, 1.5, 10.0), 50)
    # first row is the [0,0,0,0] initializer; radii monotone nondecreasing
    assert np.array_equal(px[0], np.zeros(4))
    assert np.all(np.diff(px[:, 0]) >= 0)
    assert len(np.unique(px[:, 0])) == 2513
    # in-plane offsets bounded by Rmax, through-plane by Rmax/(10/1.5)
    assert np.abs(px[:, 1:3]).max() == 49
    assert np.abs(px[:, 3]).max() == 7


def test_parula_table():
    assert PARULA_64.shape == (64, 3)
    assert _sha(PARULA_64) == PARULA_SHA256
