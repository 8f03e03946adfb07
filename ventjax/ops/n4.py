"""N4 bias-field correction as a jit-compiled JAX op.

Same algorithm and parameters as ventjax.oracle.n4_oracle (from-scratch N4,
ITK defaults; the reference reaches it through SimpleITK C++ at
Vent_Analysis.py:316-334).  TPU mapping:

- the 200-bin histogram is a scatter-add (static shape);
- Wiener sharpening is a pair of 512-point FFTs (tiny);
- the Lee-BA B-spline fit is three separable basis contractions --
  plain matmuls that land on the MXU;
- per-level iteration runs under lax.fori_loop with convergence-frozen
  updates, so the result equals the oracle's early-breaking loop while
  shapes stay static.

The per-level basis matrices are host-precomputed constants (shared code with
the oracle) so device and oracle geometry are identical.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ventjax.oracle.n4_oracle import _next_pow2_padded, bspline_basis_1d

LOG2 = float(np.log(2.0))


def _sharpen(logu, m, bins, fwhm, wiener_noise, padded, offset):
    """Histogram-sharpen masked log intensities; zeros outside the mask.

    TPU notes: the fractional histogram and the expectation-table lookup are
    expressed as triangular-kernel contractions instead of scatter/gather —
    linear interpolation into two adjacent bins is exactly a triangle weight
    relu(1 - |t - b|), so both become fused multiply-reduce loops that XLA
    keeps entirely on the VPU (a scatter-add of 262k voxels serializes on
    TPU and costs ~ms; this costs ~0.1ms).
    """
    dtype = logu.dtype
    w = m.astype(dtype)
    binmin = jnp.min(jnp.where(m, logu, jnp.inf))
    binmax = jnp.max(jnp.where(m, logu, -jnp.inf))
    slope = (binmax - binmin) / (bins - 1)

    t = (logu - binmin) / slope
    tflat = t.reshape(-1)
    bin_ids = jnp.arange(bins, dtype=dtype)
    # hist[b] = sum_v w_v * relu(1 - |t_v - b|)  (== fractional binning for
    # in-range t; masked voxels contribute 0 via w).
    tri = jnp.maximum(0.0, 1.0 - jnp.abs(tflat[:, None] - bin_ids[None, :]))
    hist = jnp.sum(w.reshape(-1)[:, None] * tri, axis=0)

    v = jnp.zeros(padded, dtype).at[offset:offset + bins].set(hist)
    vf = jnp.fft.fft(v)

    scaled_fwhm = fwhm / slope
    exp_factor = 4.0 * LOG2 / scaled_fwhm ** 2
    scale_factor = 2.0 * jnp.sqrt(LOG2 / jnp.pi) / scaled_fwhm
    n = jnp.arange(padded)
    half = jnp.minimum(n, padded - n).astype(dtype)
    fkernel = scale_factor * jnp.exp(-(half ** 2) * exp_factor)
    ff = jnp.fft.fft(fkernel)

    gf = jnp.conj(ff) / (jnp.abs(ff) ** 2 + wiener_noise)
    u = jnp.maximum(jnp.real(jnp.fft.ifft(vf * gf)), 0.0)

    bin_u = binmin + (n.astype(dtype) - offset) * slope
    num = jnp.real(jnp.fft.ifft(jnp.fft.fft(u * bin_u) * ff))
    den = jnp.real(jnp.fft.ifft(jnp.fft.fft(u) * ff))
    expectation = jnp.where(den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0)

    # sharpened_v = linear interp of E at (t + offset): same triangle trick.
    # In-mask positions live in [offset, offset+bins-1], so only a
    # (bins+2)-entry slice of E is ever touched — shrink the contraction and
    # express it as a fused multiply-reduce (a dot would materialize the
    # [V, bins] triangle matrix in HBM).
    e_loc = jax.lax.dynamic_slice(expectation, (offset - 1,), (bins + 2,))
    tloc = (t + 1.0).reshape(-1)  # t - (offset-1) + offset
    loc_ids = jnp.arange(bins + 2, dtype=dtype)
    tri2 = jnp.maximum(0.0, 1.0 - jnp.abs(tloc[:, None] - loc_ids[None, :]))
    sharpened = jnp.sum(tri2 * e_loc[None, :], axis=1).reshape(logu.shape)
    return jnp.where(m, sharpened, 0.0)


def _level_constants(shape: Tuple[int, int, int], n_elements: int, dtype):
    """Host-side per-level constants: 1-D bases and their powers."""
    H, W, D = shape
    br = bspline_basis_1d(H, n_elements)
    bc = bspline_basis_1d(W, n_elements)
    bs = bspline_basis_1d(D, n_elements)
    s = (
        (br ** 2).sum(1)[:, None, None]
        * (bc ** 2).sum(1)[None, :, None]
        * (bs ** 2).sum(1)[None, None, :]
    )
    cast = lambda a: jnp.asarray(a, dtype)
    return (
        cast(br), cast(bc), cast(bs),
        cast(br ** 2), cast(bc ** 2), cast(bs ** 2),
        cast(br ** 3), cast(bc ** 3), cast(bs ** 3),
        cast(s),
    )


def _fit_field(residual, w, consts, den):
    # precision=HIGHEST: these land on the MXU, whose default bf16 inputs
    # would inject ~1e-3 error into the bias field.
    br, bc, bs, _, _, _, br3, bc3, bs3, s = consts
    hi = jax.lax.Precision.HIGH
    a = w * residual / s
    num = jnp.einsum("hc,wd,se,hws->cde", br3, bc3, bs3, a, precision=hi)
    phi = jnp.where(den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0)
    return jnp.einsum("hc,wd,se,cde->hws", br, bc, bs, phi, precision=hi)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fitting_levels", "max_iters", "bins", "control_points", "return_field",
    ),
)
def n4_bias_correction(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    fitting_levels: int = 4,
    max_iters: int = 50,
    convergence_threshold: float = 0.001,
    bins: int = 200,
    fwhm: float = 0.15,
    wiener_noise: float = 0.01,
    control_points: int = 4,
    return_field: bool = False,
):
    """N4-corrected image (same dtype as input promoted to float32+)."""
    dtype = jnp.promote_types(image.dtype, jnp.float32)
    img = image.astype(dtype)
    m = (mask > 0) & (img > 0)
    w = m.astype(dtype)
    log_input = jnp.where(m, jnp.log(jnp.where(img > 0, img, 1.0)), 0.0)

    padded = _next_pow2_padded(bins)
    offset = (padded - bins) // 2

    total = jnp.zeros_like(log_input)
    for level in range(fitting_levels):
        n_elements = (control_points - 3) * 2 ** level
        consts = _level_constants(image.shape, n_elements, dtype)
        _, _, _, br2, bc2, bs2, _, _, _, _ = consts
        den = jnp.einsum(
            "hc,wd,se,hws->cde", br2, bc2, bs2, w,
            precision=jax.lax.Precision.HIGH,
        )

        def body(carry, consts=consts, den=den):
            i, total, done = carry
            logu = log_input - total
            sharpened = _sharpen(logu, m, bins, fwhm, wiener_noise, padded, offset)
            residual = jnp.where(m, logu - sharpened, 0.0)
            # Flush sub-normal residuals: as the fit converges these underflow
            # toward float32 denormals, which TPUs flush in hardware but CPUs
            # emulate at ~100x cost; 1e-18 is far below any meaningful
            # log-intensity residual.
            residual = jnp.where(jnp.abs(residual) < 1e-18, 0.0, residual)
            delta = _fit_field(residual, w, consts, den)
            delta = jnp.where(jnp.abs(delta) < 1e-18, 0.0, delta)
            # Convergence: CV of exp(delta) over the mask (population std).
            ed = jnp.exp(delta)
            nmask = jnp.sum(w)
            mu = jnp.sum(ed * w) / nmask
            sd = jnp.sqrt(jnp.sum(w * (ed - mu) ** 2) / nmask)
            cv = sd / mu
            # Oracle applies delta, then checks, then breaks: replicate by
            # freezing updates once done.
            new_total = jnp.where(done, total, total + delta)
            new_done = done | (cv < convergence_threshold)
            return i + 1, new_total, new_done

        # Early-stopping while loop: identical math to the oracle's breaking
        # loop (frozen-done lanes under vmap keep their converged state).
        _, total, _ = jax.lax.while_loop(
            lambda c: (c[0] < max_iters) & ~c[2],
            body,
            (jnp.asarray(0), total, jnp.asarray(False)),
        )

    corrected = img * jnp.exp(-total)
    if return_field:
        return corrected, total
    return corrected
