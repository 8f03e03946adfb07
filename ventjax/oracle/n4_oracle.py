"""NumPy oracle for N4 bias-field correction.

The reference reaches N4 through SimpleITK's C++ N4BiasFieldCorrectionImageFilter
with all default parameters (/root/reference/Vent_Analysis.py:316-334; Tustison
et al. 2010, "N4ITK").  SimpleITK is not available in this environment, so this
module is a from-scratch NumPy implementation of the N4 algorithm with the ITK
default parameters:

  - 4 fitting levels x 50 iterations, convergence threshold 0.001
  - 200-bin histogram sharpening, bias FWHM 0.15, Wiener noise 0.01
  - cubic B-spline field fit, 4 control points per dim at the coarsest level,
    mesh resolution doubling between levels

The B-spline fit is Lee's BA (scattered-data approximation) algorithm expressed
as separable 1-D basis contractions, so the JAX device version
(ventjax.ops.n4) is the *same math* mapped onto MXU matmuls; the two are
required to agree to float tolerance (tests/test_n4.py), and pipeline fidelity
is judged by downstream |dVDP| (SURVEY.md §7 step 4).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

LOG2 = np.log(2.0)


def _next_pow2_padded(n: int) -> int:
    """ITK pads the histogram FFT to exp2(ceil(log2(n)) + 1)."""
    return int(2 ** (np.ceil(np.log2(n)) + 1))


def sharpen_log_intensities(
    vals: np.ndarray,
    bins: int = 200,
    fwhm: float = 0.15,
    wiener_noise: float = 0.01,
) -> np.ndarray:
    """Histogram-sharpen a vector of log intensities (ITK SharpenImage).

    Returns the sharpened (expected true) log intensity for each input value.
    """
    binmin = float(vals.min())
    binmax = float(vals.max())
    slope = (binmax - binmin) / (bins - 1)
    if slope <= 0:
        return vals.copy()

    # Fractional (linearly interpolated) histogram.
    t = (vals - binmin) / slope
    i0 = np.floor(t).astype(int)
    f = t - i0
    i0 = np.clip(i0, 0, bins - 1)
    i1 = np.clip(i0 + 1, 0, bins - 1)
    hist = np.zeros(bins)
    np.add.at(hist, i0, 1.0 - f)
    np.add.at(hist, i1, f)

    padded = _next_pow2_padded(bins)
    offset = (padded - bins) // 2
    v = np.zeros(padded)
    v[offset:offset + bins] = hist
    vf = np.fft.fft(v)

    # Gaussian kernel in bin units.
    scaled_fwhm = fwhm / slope
    exp_factor = 4.0 * LOG2 / scaled_fwhm ** 2
    scale_factor = 2.0 * np.sqrt(LOG2 / np.pi) / scaled_fwhm
    n = np.arange(padded)
    half = np.minimum(n, padded - n)  # symmetric wrap-around distance
    fkernel = scale_factor * np.exp(-(half.astype(float) ** 2) * exp_factor)
    ff = np.fft.fft(fkernel)

    # Wiener deconvolution of the histogram.
    gf = np.conj(ff) / (np.abs(ff) ** 2 + wiener_noise)
    uf = vf * gf
    u = np.maximum(np.real(np.fft.ifft(uf)), 0.0)

    # Expectation mapping E[u|v]: smooth u*U and U with the Gaussian.
    bin_u = binmin + (n - offset) * slope
    num = np.real(np.fft.ifft(np.fft.fft(u * bin_u) * ff))
    den = np.real(np.fft.ifft(np.fft.fft(u) * ff))
    expectation = np.where(den != 0.0, num / np.where(den != 0, den, 1.0), 0.0)

    # Map each voxel through the expectation table (linear interp).
    tt = t + offset
    j0 = np.clip(np.floor(tt).astype(int), 0, padded - 2)
    g = tt - j0
    return (1.0 - g) * expectation[j0] + g * expectation[j0 + 1]


def bspline_basis_1d(n: int, n_elements: int) -> np.ndarray:
    """Dense [n, n_elements + 3] cubic B-spline basis over a regular grid.

    Grid positions map linearly onto [0, n_elements] parametric space; each
    position gets 4 nonzero cubic blending weights on control points
    span..span+3 (uniform cubic B-spline, as in ITK's scattered-data fitter).
    """
    ncp = n_elements + 3
    t = np.arange(n, dtype=np.float64) / max(n - 1, 1) * n_elements
    span = np.minimum(np.floor(t).astype(int), n_elements - 1)
    u = t - span
    b = np.zeros((n, 4))
    b[:, 0] = (1 - u) ** 3 / 6.0
    b[:, 1] = (3 * u ** 3 - 6 * u ** 2 + 4) / 6.0
    b[:, 2] = (-3 * u ** 3 + 3 * u ** 2 + 3 * u + 1) / 6.0
    b[:, 3] = u ** 3 / 6.0
    basis = np.zeros((n, ncp))
    for j in range(4):
        basis[np.arange(n), span + j] = b[:, j]
    return basis


def fit_bspline_field(
    residual: np.ndarray, weights: np.ndarray, n_elements: int
) -> np.ndarray:
    """Weighted Lee-BA cubic B-spline approximation of a 3-D residual field.

    phi_c = sum_p W_p w_cp^2 (w_cp d_p / S_p) / sum_p W_p w_cp^2 with
    separable weights w_cp = wr*wc*ws, so the sums are three 1-D basis
    contractions (cubed basis for the numerator, squared for the denominator).
    Returns the reconstructed smooth field on the full voxel grid.
    """
    H, W, D = residual.shape
    br = bspline_basis_1d(H, n_elements)
    bc = bspline_basis_1d(W, n_elements)
    bs = bspline_basis_1d(D, n_elements)

    # S_p = sum_c w_cp^2 (separable row-sums of squared bases).
    s1 = (br ** 2).sum(1)
    s2 = (bc ** 2).sum(1)
    s3 = (bs ** 2).sum(1)
    S = s1[:, None, None] * s2[None, :, None] * s3[None, None, :]

    a = weights * residual / S
    num = np.einsum("hc,wd,se,hws->cde", br ** 3, bc ** 3, bs ** 3, a)
    den = np.einsum("hc,wd,se,hws->cde", br ** 2, bc ** 2, bs ** 2, weights)
    phi = np.where(den != 0.0, num / np.where(den != 0, den, 1.0), 0.0)
    return np.einsum("hc,wd,se,cde->hws", br, bc, bs, phi)


def n4_bias_correction_oracle(
    image: np.ndarray,
    mask: np.ndarray,
    fitting_levels: int = 4,
    max_iters: int = 50,
    convergence_threshold: float = 0.001,
    bins: int = 200,
    fwhm: float = 0.15,
    wiener_noise: float = 0.01,
    control_points: int = 4,
    return_field: bool = False,
):
    """N4 bias correction: returns the corrected image (float64).

    Mirrors the ITK N4 loop: per level, iterate sharpen -> residual -> B-spline
    field fit -> accumulate total log field; convergence when the coefficient
    of variation of exp(delta field) over the mask drops below the threshold.
    """
    img = np.asarray(image, dtype=np.float64)
    m = (np.asarray(mask) > 0) & (img > 0)
    log_input = np.where(m, np.log(np.where(img > 0, img, 1.0)), 0.0)
    weights = m.astype(np.float64)

    total_field = np.zeros_like(log_input)
    for level in range(fitting_levels):
        n_elements = (control_points - 3) * 2 ** level
        for _ in range(max_iters):
            log_u = log_input - total_field
            vals = log_u[m]
            sharpened = np.zeros_like(log_u)
            sharpened[m] = sharpen_log_intensities(
                vals, bins=bins, fwhm=fwhm, wiener_noise=wiener_noise
            )
            residual = np.where(m, log_u - sharpened, 0.0)
            delta = fit_bspline_field(residual, weights, n_elements)
            total_field = total_field + delta
            # Convergence: CV over the mask of the pixelwise ratio
            # exp(old_field - new_field) = exp(-delta), matching ITK's
            # CalculateConvergenceMeasurement (itkN4BiasFieldCorrection-
            # ImageFilter.hxx subtracts old - new before exponentiating).
            ed = np.exp(-delta[m])
            cv = ed.std() / ed.mean()
            if cv < convergence_threshold:
                break

    corrected = img * np.exp(-total_field)
    if return_field:
        return corrected, total_field
    return corrected
