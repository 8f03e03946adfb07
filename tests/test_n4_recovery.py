"""Ground-truth N4 validation that needs no ITK: planted-field recovery.

The reference's N4 *is* SimpleITK's C++ filter (Vent_Analysis.py:316-334);
SimpleITK cannot be installed in this environment, so golden comparison is
blocked (tests/test_n4_goldens.py stands ready for when it exists).  These
tests validate the property the filter exists to deliver: given
``img = clean * exp(field)`` for a *known* smooth log-field, both the
float64 oracle and the device op must recover that field — masked
correlation > 0.99 and bounded relative residual — across B-spline and
non-B-spline field shapes, multiple amplitudes, and two mask geometries.
This converts "we believe the math is ITK's" (docs/N4_ITK_AUDIT.md) into
"the math demonstrably removes multiplicative bias".
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ventjax.oracle.n4_oracle import bspline_basis_1d, n4_bias_correction_oracle
from ventjax.ops import n4_bias_correction


def _geometry(shape):
    """Two-lobe mask + HIGH-frequency-textured clean signal.

    The clean signal must carry no *smooth* spatial variation: a smooth
    multiplicative clean component is mathematically indistinguishable
    from bias (N4 — and ITK's filter — would absorb it into the field,
    which is correct filter behavior but contaminates the planted-field
    metric).  High-frequency texture instead exercises exactly what N4
    must NOT absorb: its B-spline field cannot represent it, so recovery
    of the planted smooth field should remain near-perfect.  No defects:
    they are intensity outliers by design and covered by tests/test_n4.py.
    """
    H, W, D = shape
    r, c, s = np.meshgrid(
        np.arange(H), np.arange(W), np.arange(D), indexing="ij"
    )

    def ellipsoid(center, radii):
        d = (((r - center[0]) / radii[0]) ** 2
             + ((c - center[1]) / radii[1]) ** 2
             + ((s - center[2]) / radii[2]) ** 2)
        return d <= 1.0

    left = ellipsoid((H * 0.5, W * 0.3, D * 0.5), (H * 0.32, W * 0.18, D * 0.44))
    right = ellipsoid((H * 0.5, W * 0.7, D * 0.5), (H * 0.32, W * 0.18, D * 0.44))
    mask = (left | right).astype(np.float32)
    clean = 400.0 * (1.0 + 0.08 * np.sin(2 * np.pi * r / 5)
                     * np.cos(2 * np.pi * c / 7)).astype(np.float64)
    nr = (r - H / 2) / H
    nc = (c - W / 2) / W
    ns = (s - D / 2) / D
    return mask, clean, (nr, nc, ns)


def _field(kind, shape, norm_coords, seed=7):
    """A smooth planted log-field of unit max-abs over the volume."""
    nr, nc, ns = norm_coords
    if kind == "bspline":
        # Exactly in N4's model class: a tensor-product cubic B-spline on
        # the level-1 grid (n_elements=2 -> ncp=5 per axis).
        rng = np.random.default_rng(seed)
        H, W, D = shape
        br = bspline_basis_1d(H, 2)
        bc = bspline_basis_1d(W, 2)
        bs = bspline_basis_1d(D, 2)
        coef = rng.normal(0, 1, (br.shape[1], bc.shape[1], bs.shape[1]))
        f = np.einsum("rc,wd,se,cde->rws", br, bc, bs, coef)
    elif kind == "poly":
        f = 0.8 * nr + 0.6 * nc - 0.5 * ns + 0.9 * nr * nc - 0.6 * nr * nr
    elif kind == "gauss":
        f = np.exp(-(((nr - 0.12) / 0.35) ** 2 + ((nc + 0.1) / 0.35) ** 2
                     + (ns / 0.5) ** 2))
    elif kind == "sine":
        f = np.sin(np.pi * nr) * np.cos(np.pi * nc) + 0.4 * np.sin(np.pi * ns)
    else:  # pragma: no cover
        raise ValueError(kind)
    return f / np.abs(f).max()


def _recovery_metrics(recovered, planted_log, mask):
    m = mask > 0
    p = planted_log[m] - planted_log[m].mean()
    e = np.asarray(recovered)[m]
    e = e - e.mean()
    corr = np.corrcoef(p, e)[0, 1]
    rel_res = np.sqrt(np.mean((e - p) ** 2)) / np.sqrt(np.mean(p ** 2))
    return corr, rel_res


CASES = [
    # (field kind, amplitude of the planted log-field)
    ("bspline", 0.3),
    ("bspline", 0.6),
    ("poly", 0.1),
    ("poly", 0.3),
    ("gauss", 0.3),
    ("sine", 0.2),
]


@pytest.mark.parametrize("kind,amp", CASES)
def test_planted_field_recovery_oracle_and_device(kind, amp):
    shape = (64, 64, 8)
    mask, clean, ncoords = _geometry(shape)
    planted = amp * _field(kind, shape, ncoords)
    img = (clean * np.exp(planted) * mask).astype(np.float32)

    _, f_or = n4_bias_correction_oracle(img, mask, return_field=True)
    corr_o, res_o = _recovery_metrics(f_or, planted, mask)
    assert corr_o > 0.99, (kind, amp, corr_o)
    assert res_o < 0.15, (kind, amp, res_o)

    _, f_dev = n4_bias_correction(
        jnp.asarray(img), jnp.asarray(mask), return_field=True
    )
    corr_d, res_d = _recovery_metrics(f_dev, planted, mask)
    assert corr_d > 0.99, (kind, amp, corr_d)
    assert res_d < 0.15, (kind, amp, res_d)


def test_planted_field_recovery_second_geometry_device():
    """A different geometry: larger in-plane grid, single central lobe,
    thicker stack — the device op at the reference's typical 128x128."""
    shape = (128, 128, 12)
    H, W, D = shape
    r, c, s = np.meshgrid(np.arange(H), np.arange(W), np.arange(D),
                          indexing="ij")
    d2 = (((r - H * 0.5) / (H * 0.4)) ** 2 + ((c - W * 0.5) / (W * 0.38)) ** 2
          + ((s - D * 0.5) / (D * 0.46)) ** 2)
    mask = (d2 <= 1.0).astype(np.float32)
    clean = 300.0 * (1.0 + 0.06 * np.cos(2 * np.pi * c / 6))
    nr, nc, ns = (r - H / 2) / H, (c - W / 2) / W, (s - D / 2) / D
    planted = 0.35 * _field("poly", shape, (nr, nc, ns))
    img = (clean * np.exp(planted) * mask).astype(np.float32)

    _, f_dev = n4_bias_correction(
        jnp.asarray(img), jnp.asarray(mask), return_field=True
    )
    corr, res = _recovery_metrics(f_dev, planted, mask)
    assert corr > 0.99, corr
    assert res < 0.15, res
