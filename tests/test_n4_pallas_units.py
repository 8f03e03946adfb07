"""Unit tests for the individual sharpen/fit Pallas kernels vs their XLA
counterparts (CPU interpreter mode; the e2e envelope is covered by
tests/test_n4_pallas.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from ventjax.ops import n4_pallas as npk
from ventjax.ops.n4 import _bspline_rows, _sharpen_vec, _sharpen_expectation
from ventjax.oracle.n4_oracle import _next_pow2_padded

BINS = 200
P = 2 * npk.PC


def _masked_vec(seed=0):
    rng = np.random.default_rng(seed)
    n_mask = P - 700
    wv = np.zeros(P, np.float32)
    wv[:n_mask] = 1.0
    logu = np.zeros(P, np.float32)
    logu[:n_mask] = rng.normal(5.0, 0.7, n_mask)
    return jnp.asarray(logu * wv), jnp.asarray(wv)


def _hist_xla(logu, wv):
    """The histogram slice of _sharpen_vec (ops/n4.py), f64 reduced."""
    lo = np.asarray(logu, np.float64)
    w = np.asarray(wv, np.float64)
    binmin = lo[w > 0].min()
    binmax = lo[w > 0].max()
    slope = (binmax - binmin) / (BINS - 1)
    t = np.clip((lo - binmin) / slope, 0, BINS - 1) * w
    i0 = np.floor(t).astype(int)
    f = t - i0
    h = np.zeros(256)
    np.add.at(h, i0, w * (1 - f))
    np.add.at(h, i0 + 1, w * f)
    return h[:BINS], binmin, slope


def test_hist_kernel_matches_numpy():
    logu, wv = _masked_vec(3)
    href, binmin, slope = _hist_xla(logu, wv)
    h = np.asarray(npk.sharpen_hist_pallas(
        logu, wv, jnp.float32(binmin), jnp.float32(slope), BINS,
        interpret=True,
    ))
    assert np.abs(h - href).max() < 1e-2 * max(href.max(), 1.0)
    # mass conservation: the triangular kernel distributes each masked
    # voxel's unit weight exactly once.
    assert abs(h.sum() - float(jnp.sum(wv))) < 0.5


def test_resid_kernel_matches_sharpen_vec():
    logu, wv = _masked_vec(4)
    padded = _next_pow2_padded(BINS)
    offset = (padded - BINS) // 2
    sv = jnp.asarray(
        np.random.default_rng(5).random(P).astype(np.float32) + 0.5)

    sharpened = _sharpen_vec(logu, wv, BINS, 0.15, 0.01, padded, offset)
    residual = (logu - sharpened) * wv
    residual = jnp.where(jnp.abs(residual) < 1e-18, 0.0, residual)
    a_ref = np.asarray(residual / jnp.maximum(sv, 1e-30))

    binmin = jnp.min(jnp.where(wv > 0, logu, jnp.inf))
    binmax = jnp.max(jnp.where(wv > 0, logu, -jnp.inf))
    slope = (binmax - binmin) / (BINS - 1)
    hist = npk.sharpen_hist_pallas(logu, wv, binmin, slope, BINS,
                                   interpret=True)
    e_loc = _sharpen_expectation(hist, binmin, slope, BINS, 0.15, 0.01,
                                 padded, offset)
    e256 = jnp.zeros(256, jnp.float32).at[:BINS + 2].set(e_loc)
    a = np.asarray(npk.sharpen_resid_pallas(
        logu, wv, sv, e256, binmin, slope, BINS, interpret=True))
    # The kernel's E-table selection uses the double-bf16 split (two
    # full-rate MXU dots on hi/lo components — Mosaic has no HIGH
    # precision and HIGHEST costs 37% of pipeline throughput), giving
    # ~2^-16 relative accuracy on the log-intensity-scale (~5) table:
    # ~1.5e-4 absolute on the residual.  Interpret mode reproduces the
    # same casts, so this bound is exercised on CPU too.
    assert np.abs(a - a_ref).max() < 1e-3


def test_delta_conv_matches_delta_plus_stats():
    rng = np.random.default_rng(6)
    H, W, D = 64, 64, 8
    ne = 8
    ncp = ne + 3
    hc = jnp.asarray(rng.integers(0, H, P), jnp.int32)
    wc = jnp.asarray(rng.integers(0, W, P), jnp.int32)
    sc = jnp.asarray(rng.integers(0, D, P), jnp.int32)
    wv = jnp.asarray((np.arange(P) < P - 300).astype(np.float32))
    brv = _bspline_rows(hc, H, ne, jnp.float32)
    bcv = _bspline_rows(wc, W, ne, jnp.float32)
    bsv = _bspline_rows(sc, D, ne, jnp.float32)
    rows = npk.basis_rows_padded
    phi = jnp.zeros((npk.CP, npk.FP), jnp.float32).at[
        :ncp, : ncp * ncp].set(
        jnp.asarray(rng.normal(0, 1e-3, (ncp, ncp * ncp)), jnp.float32))

    d, s1, s2 = npk.fit_delta_conv_pallas(
        phi, rows(brv, 1), rows(bcv, 1), rows(bsv, 1), wv, ncp,
        interpret=True)
    d = np.asarray(d)

    # reference delta from the plain kernel
    d_ref = np.asarray(npk.fit_delta_pallas(
        phi, rows(brv, 1), rows(bcv, 1), rows(bsv, 1), ncp, interpret=True))
    d_ref = np.where(np.abs(d_ref) < 1e-18, 0.0, d_ref) * np.asarray(wv)
    assert np.abs(d - d_ref).max() < 1e-6

    # convergence stats against the two-pass XLA formulas
    wvn = np.asarray(wv, np.float64)
    ed = np.exp(-d.astype(np.float64))
    n = wvn.sum()
    mu_ref = (ed * wvn).sum() / n
    var_ref = (wvn * (ed - mu_ref) ** 2).sum() / n
    mu = 1.0 + float(s1) / n
    var = max((float(s2) - float(s1) ** 2 / n) / n, 0.0)
    assert abs(mu - mu_ref) < 1e-6
    assert abs(var - var_ref) < 1e-9
