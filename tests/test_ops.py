"""Device ops vs the CPU oracle (SURVEY.md §4 item 1).

Each op must reproduce the oracle voxel-for-voxel (exact for integer-valued
outputs like defect masks and borders, float32-tolerance for scalar metrics).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ventjax import oracle
from ventjax.ops import (
    calculate_snr,
    gradient_border,
    median3x3_binary,
    minmax_normalize,
    masked_sorted_index,
    vdp_kmeans,
    vdp_linear_binning,
    vdp_mean_anchored,
)


@pytest.fixture(scope="module")
def n4_pair(phantom_small):
    """Oracle N4 output used as a fixed input to the VDP ops."""
    n4 = oracle.n4_bias_correction_oracle(phantom_small.hp, phantom_small.mask)
    return n4, phantom_small


def test_normalize_matches(rng):
    x = rng.normal(size=(16, 16, 4)).astype(np.float32)
    assert np.allclose(np.asarray(minmax_normalize(jnp.asarray(x))),
                       oracle.normalize(x), atol=1e-7)


def test_border_matches(phantom_small):
    dev = np.asarray(gradient_border(jnp.asarray(phantom_small.mask)))
    assert np.array_equal(dev, oracle.calculate_border(phantom_small.mask))


def test_median3x3_matches_scipy(rng):
    from scipy.signal import medfilt2d
    x = (rng.random((32, 32, 4)) > 0.6).astype(np.float32)
    dev = np.asarray(median3x3_binary(jnp.asarray(x)))
    want = np.stack([medfilt2d(x[:, :, k]) for k in range(4)], axis=2)
    assert np.array_equal(dev, want)


def test_masked_sorted_index_floor_convention(rng):
    x = rng.normal(size=(10, 10, 1)).astype(np.float32)
    m = (rng.random((10, 10, 1)) > 0.3).astype(np.float32)
    vals = sorted(x[m > 0])
    want = vals[int(len(vals) * 0.99)]
    got = float(masked_sorted_index(jnp.asarray(x), jnp.asarray(m), 0.99))
    assert got == pytest.approx(want, rel=1e-6)


def test_snr_matches(phantom_small):
    dev = float(calculate_snr(jnp.asarray(phantom_small.hp),
                              jnp.asarray(phantom_small.mask)))
    want = oracle.calculate_snr(phantom_small.hp, phantom_small.mask)
    assert dev == pytest.approx(want, rel=1e-5)


def test_snr_mask_touching_row0(rng):
    """Exercise the quirky rr/ss index-0 behavior with a mask at the corner."""
    mask = np.zeros((48, 48, 6))
    mask[0:10, 1:12, 0:3] = 1.0
    a = rng.normal(10, 2, mask.shape).astype(np.float32) + 50 * mask
    dev = float(calculate_snr(jnp.asarray(a), jnp.asarray(mask), fov_buffer=5))
    want = oracle.calculate_snr(a, mask, fov_buffer=5)
    assert dev == pytest.approx(want, rel=1e-5)


def test_vdp_mean_anchored_matches(n4_pair):
    n4, ph = n4_pair
    n4j = jnp.asarray(n4.astype(np.float32))
    d_dev, v_dev = vdp_mean_anchored(n4j, jnp.asarray(ph.mask))
    d_or, v_or = oracle.vdp_mean_anchored(n4, ph.mask)
    assert np.array_equal(np.asarray(d_dev), d_or)
    assert float(v_dev) == pytest.approx(v_or, abs=1e-4)


def test_vdp_linear_binning_matches(n4_pair):
    n4, ph = n4_pair
    n4j = jnp.asarray(n4.astype(np.float32))
    lb_dev, v_dev = vdp_linear_binning(n4j, jnp.asarray(ph.mask))
    lb_or, v_or = oracle.vdp_linear_binning(n4, ph.mask)
    assert np.array_equal(np.asarray(lb_dev), lb_or)
    assert float(v_dev) == pytest.approx(v_or, abs=1e-4)


def test_vdp_kmeans_matches(n4_pair):
    n4, ph = n4_pair
    n4j = jnp.asarray(n4.astype(np.float32))
    km_dev, v_dev = vdp_kmeans(n4j, jnp.asarray(ph.mask))
    km_or, v_or = oracle.vdp_kmeans(n4, ph.mask)
    # float32 vs float64 Lloyd's can flip voxels exactly on a boundary;
    # require metric agreement well under the 0.1pp fidelity budget.
    assert float(v_dev) == pytest.approx(v_or, abs=0.05)
    frac_diff = np.mean(np.asarray(km_dev) != km_or)
    assert frac_diff < 1e-3


# ---------------------------------------------------------------------------
# Morphology (the reference's "edit mask" roadmap item, README.md:28)
# ---------------------------------------------------------------------------

def _scipy_slicewise(fn, vol, *a, **k):
    import numpy as np
    out = np.zeros_like(vol, dtype=bool)
    for s in range(vol.shape[2]):
        out[:, :, s] = fn(vol[:, :, s] > 0, *a, **k)
    return out


def test_morphology_matches_scipy(rng):
    scipy_nd = pytest.importorskip("scipy.ndimage")
    from ventjax.ops import morphology as mo

    vol = (rng.random((24, 20, 4)) > 0.62).astype(np.float32)
    vol[0, :3, 0] = 1  # border-touching region (erosion border semantics)

    for iters in (1, 2):
        got = np.asarray(mo.binary_dilate(vol, iters)) > 0
        want = _scipy_slicewise(scipy_nd.binary_dilation, vol,
                                iterations=iters)
        assert np.array_equal(got, want), f"dilate x{iters}"

        got = np.asarray(mo.binary_erode(vol, iters)) > 0
        want = _scipy_slicewise(scipy_nd.binary_erosion, vol,
                                iterations=iters)
        assert np.array_equal(got, want), f"erode x{iters}"

    got = np.asarray(mo.binary_open(vol, 1)) > 0
    want = _scipy_slicewise(scipy_nd.binary_opening, vol)
    assert np.array_equal(got, want)

    got = np.asarray(mo.binary_close(vol, 1)) > 0
    want = _scipy_slicewise(scipy_nd.binary_closing, vol)
    assert np.array_equal(got, want)

    # full-3D variants (cross / 6-neighbor element, scipy default)
    got = np.asarray(mo.binary_dilate(vol, 1, slicewise=False)) > 0
    assert np.array_equal(got, scipy_nd.binary_dilation(vol > 0))
    got = np.asarray(mo.binary_erode(vol, 1, slicewise=False)) > 0
    assert np.array_equal(got, scipy_nd.binary_erosion(vol > 0))

    # 8-neighbor (connectivity 2) element
    full = np.ones((3, 3), bool)
    got = np.asarray(mo.binary_dilate(vol, 1, connectivity=2)) > 0
    want = _scipy_slicewise(scipy_nd.binary_dilation, vol, structure=full)
    assert np.array_equal(got, want)


def test_fill_holes_matches_scipy(rng):
    scipy_nd = pytest.importorskip("scipy.ndimage")
    from ventjax.ops import morphology as mo

    # rings with interior holes, plus border-open bays that must NOT fill
    vol = np.zeros((32, 28, 3), np.float32)
    vol[5:15, 5:15, :] = 1
    vol[8:12, 8:12, :] = 0        # enclosed hole -> fills
    vol[20:30, 10:20, 1] = 1
    vol[24:27, 13:17, 1] = 0      # enclosed hole -> fills
    vol[0:6, 20:24, 0] = 1
    vol[0:3, 21:23, 0] = 0        # open to the border -> stays

    got = np.asarray(mo.fill_holes(vol)) > 0
    want = _scipy_slicewise(scipy_nd.binary_fill_holes, vol)
    assert np.array_equal(got, want)

    got = np.asarray(mo.fill_holes(vol, slicewise=False)) > 0
    assert np.array_equal(got, scipy_nd.binary_fill_holes(vol > 0))


def test_fill_holes_spiral_corridor_matches_scipy():
    """A background corridor that winds through the mask and opens only at
    the border: its geodesic distance far exceeds H+W, so a bounded flood
    would misclassify it as a hole (review finding).  The flood must run
    to its fixpoint and leave it unfilled, exactly like scipy."""
    scipy_nd = pytest.importorskip("scipy.ndimage")
    from ventjax.ops import morphology as mo

    n = 41
    sl = np.ones((n, n), np.float32)
    # carve a rectangular spiral corridor of background starting at the
    # border: walk inward with decreasing straight runs
    r0, r1, c0, c1 = 0, n - 1, 0, n - 1
    sl[r0, c0:c1 + 1] = 0
    while r1 - r0 > 4 and c1 - c0 > 4:
        sl[r0:r1 + 1, c1] = 0
        sl[r1, c0 + 2:c1 + 1] = 0
        sl[r0 + 2:r1 + 1, c0 + 2] = 0
        r0, r1, c0, c1 = r0 + 2, r1 - 2, c0 + 2, c1 - 2
        sl[r0, c0:c1 + 1] = 0
    vol = sl[:, :, None]
    got = np.asarray(mo.fill_holes(vol)) > 0
    want = _scipy_slicewise(scipy_nd.binary_fill_holes, vol)
    assert np.array_equal(got, want)


def test_edit_mask_recipe(rng):
    from ventjax.ops import morphology as mo

    vol = (rng.random((24, 20, 4)) > 0.5).astype(np.float32)
    step = np.asarray(mo.edit_mask(vol, "close:1, fillholes, erode:2"))
    manual = mo.binary_close(vol, 1)
    manual = mo.fill_holes(manual)
    manual = np.asarray(mo.binary_erode(manual, 2))
    assert np.array_equal(step, manual)
    assert np.array_equal(np.asarray(mo.edit_mask(vol, "")), vol > 0)

    with pytest.raises(ValueError, match="unknown mask-edit op"):
        mo.edit_mask(vol, "sharpen:1")
    with pytest.raises(ValueError, match="bad iteration count"):
        mo.edit_mask(vol, "dilate:x")
    with pytest.raises(ValueError, match="negative"):
        mo.edit_mask(vol, "dilate:-1")
