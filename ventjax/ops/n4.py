"""N4 bias-field correction as a jit-compiled JAX op.

Same algorithm and parameters as ventjax.oracle.n4_oracle (from-scratch N4,
ITK defaults; the reference reaches it through SimpleITK C++ at
Vent_Analysis.py:316-334).

TPU mapping (three ideas):
1. Only masked voxels participate in every iteration (histogram, sharpening,
   residual, and the B-spline fit's nonzero contributions), and the mask is
   iteration-invariant — so the loop runs on a *compacted* padded vector of
   masked voxels (~2-10% of the volume) with per-voxel gathered B-spline
   basis rows; the full-grid field is reconstructed once at the end.
2. The fractional histogram and expectation-table lookup are triangular-
   kernel contractions (linear interpolation == relu(1-|t-b|) weights), i.e.
   fused multiply-reduce loops — scatter/gather-free (both serialize on TPU).
3. The Lee-BA fit is separable basis contractions — small MXU matmuls; the
   per-level lattice accumulates so the final field is one dense evaluation.

Iteration runs under an early-stopping while_loop with convergence-frozen
updates, matching the oracle's breaking loop exactly.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ventjax.oracle.n4_oracle import _next_pow2_padded, bspline_basis_1d

LOG2 = float(np.log(2.0))


@functools.lru_cache(maxsize=4)
def _dft_mats_np(padded: int):
    """Cos/sin DFT matrices: the 512-pt transforms as MXU matmuls.

    The histogram-sharpening chain needs ~6 length-`padded` transforms per
    iteration; on this TPU a [B,512]@[512,512] matmul is effectively free on
    the MXU while the XLA FFT lowering is a long chain of small sequential
    ops inside the while_loop body.
    """
    n = np.arange(padded)
    ang = 2.0 * np.pi / padded * np.outer(n, n)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _sharpen_expectation(hist, binmin, slope, bins, fwhm, wiener_noise,
                         padded, offset):
    """(bins+2)-entry local expectation slice from the fractional histogram.

    The Wiener-deconvolution sharpening core of ITK's N4 (tests pin the
    full op against the float64 oracle): Gaussian-blur kernel in the
    padded-DFT domain, deconvolve the histogram, take the conditional
    expectation E[u|v], and slice the entries reachable by masked voxels
    (t+1 in [1, bins] -> slots offset-1 .. offset+bins of the padded
    axis).  All transforms are the 512-pt DFT-as-matmul (_dft_mats_np) —
    at this size a dense MXU matmul beats jnp.fft on TPU.
    """
    dtype = hist.dtype
    hiprec = jax.lax.Precision.HIGH
    cosm, sinm = _dft_mats_np(padded)
    Fc = jnp.asarray(cosm, dtype)
    Fs = jnp.asarray(sinm, dtype)
    dot = lambda x, M: jnp.einsum("i,ij->j", x, M, precision=hiprec)
    fwd = lambda x: (dot(x, Fc), -dot(x, Fs))            # FFT of a real vector
    inv_real = lambda xr, xi: (dot(xr, Fc) - dot(xi, Fs)) / padded

    v = jnp.zeros(padded, dtype).at[offset:offset + bins].set(hist)
    vr, vi = fwd(v)

    scaled_fwhm = fwhm / slope
    exp_factor = 4.0 * LOG2 / scaled_fwhm ** 2
    scale_factor = 2.0 * jnp.sqrt(LOG2 / jnp.pi) / scaled_fwhm
    n = jnp.arange(padded)
    half = jnp.minimum(n, padded - n).astype(dtype)
    fkernel = scale_factor * jnp.exp(-(half ** 2) * exp_factor)
    fr, fi = fwd(fkernel)

    # Wiener deconvolution gf = conj(ff) / (|ff|^2 + noise).
    gdenom = fr * fr + fi * fi + wiener_noise
    gr = fr / gdenom
    gi = -fi / gdenom
    u = jnp.maximum(inv_real(vr * gr - vi * gi, vr * gi + vi * gr), 0.0)

    bin_u = binmin + (n.astype(dtype) - offset) * slope
    yr, yi = fwd(u * bin_u)
    num = inv_real(yr * fr - yi * fi, yr * fi + yi * fr)
    ur, ui = fwd(u)
    den = inv_real(ur * fr - ui * fi, ur * fi + ui * fr)
    expectation = jnp.where(
        den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0
    )
    return jax.lax.dynamic_slice(expectation, (offset - 1,), (bins + 2,))


def _sharpen_vec(logu, wv, bins, fwhm, wiener_noise, padded, offset,
                 binmin=None, binmax=None):
    """Histogram-sharpen a padded masked-value vector (weights wv in {0,1}).

    Same math as the dense triangular-kernel version (and the float64 oracle,
    ventjax.oracle.n4_oracle.sharpen_log_intensities), restructured for the
    MXU: the fractional histogram's triangle weights relu(1-|t-b|) touch only
    bins floor(t) and floor(t)+1, so splitting the bin index into
    (hi, lo) = divmod(b, 16) turns both the histogram build and the
    expectation interpolation into tiny one-hot matmuls — [G,P]@[P,16] and
    [P,G]@[G,16] — instead of [P,bins] dense broadcasting (which at
    bins=200 is ~10x the VPU work and materializes in HBM).

    binmin/binmax: optional precomputed masked range of logu (the fused
    delta kernel emits it a whole iteration early — VERDICT r2 item 9);
    None computes it here.
    """
    dtype = logu.dtype
    hiprec = jax.lax.Precision.HIGH
    if binmin is None:
        binmin = jnp.min(jnp.where(wv > 0, logu, jnp.inf))
    if binmax is None:
        binmax = jnp.max(jnp.where(wv > 0, logu, -jnp.inf))
    slope = (binmax - binmin) / (bins - 1)

    t = jnp.clip((logu - binmin) / slope, 0.0, float(bins - 1)) * wv

    GL = 16                          # lo-group width
    NG = -(-(bins + 2) // GL)        # hi groups (covers bins+1 interp slots)
    g_ids = jnp.arange(NG, dtype=jnp.int32)
    l_ids = jnp.arange(GL, dtype=jnp.int32)

    def onehots(idx):
        A = ((idx // GL)[:, None] == g_ids[None, :]).astype(dtype)
        C = ((idx % GL)[:, None] == l_ids[None, :]).astype(dtype)
        return A, C

    # hist[b] = sum_v wv * relu(1 - |t_v - b|): exactly (1-f) at floor(t)
    # plus f at floor(t)+1 (f = frac(t); the f=0 edge contributes only once).
    i0 = jnp.floor(t)
    f = t - i0
    i0 = i0.astype(jnp.int32)
    A0, C0 = onehots(i0)
    A1, C1 = onehots(i0 + 1)
    w0 = wv * (1.0 - f)
    w1 = wv * f
    h2d = (
        jnp.einsum("pg,pl->gl", A0 * w0[:, None], C0, precision=hiprec)
        + jnp.einsum("pg,pl->gl", A1 * w1[:, None], C1, precision=hiprec)
    )
    hist = h2d.reshape(NG * GL)[:bins]
    e_loc = _sharpen_expectation(
        hist, binmin, slope, bins, fwhm, wiener_noise, padded, offset
    )
    # linear interp of E at t+offset: same one-hot split over the
    # (bins+2)-entry slice of E that masked positions can touch.
    E2d = jnp.zeros(NG * GL, dtype).at[:bins + 2].set(e_loc).reshape(NG, GL)
    s = t + 1.0
    j0 = jnp.floor(s)
    fs = s - j0
    j0 = j0.astype(jnp.int32)
    A0s, C0s = onehots(j0)
    A1s, C1s = onehots(j0 + 1)
    v0 = jnp.sum(
        jnp.einsum("pg,gl->pl", A0s, E2d, precision=hiprec) * C0s, axis=1
    )
    v1 = jnp.sum(
        jnp.einsum("pg,gl->pl", A1s, E2d, precision=hiprec) * C1s, axis=1
    )
    return ((1.0 - fs) * v0 + fs * v1) * wv


def _bspline_rows(coords, n, n_elements, dtype):
    """[P, ncp] cubic B-spline basis rows at integer grid coords.

    Analytic cardinal form — basis[h, c] = B(t_h - c + 1) with B the
    cardinal cubic B-spline — instead of gathering rows from the
    bspline_basis_1d table (per-voxel gathers are the single slowest
    primitive on this TPU).  Identical to the table, including the end
    clamp: at t = n_elements the clamped (span=ne-1, u=1) and unclamped
    (span=ne, u=0) parameterizations place the same weights on the same
    columns, which is exactly what the continuous cardinal form evaluates.
    """
    ncp = n_elements + 3
    t = coords.astype(dtype) * (float(n_elements) / float(max(n - 1, 1)))
    x = jnp.abs(t[:, None] - jnp.arange(ncp, dtype=dtype)[None, :] + 1.0)
    near = (4.0 - 6.0 * x * x + 3.0 * x ** 3) / 6.0
    far = (2.0 - x) ** 3 / 6.0
    return jnp.where(x < 1.0, near, jnp.where(x < 2.0, far, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "fitting_levels", "max_iters", "bins", "control_points",
        "mask_pad", "return_field", "return_overflow", "return_compacted",
        "return_iters", "return_phi",
        "use_pallas",
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
    mask_pad: Optional[int] = None,
    return_field: bool = False,
    return_overflow: bool = False,
    return_iters: bool = False,
    return_phi: bool = False,
    return_compacted: bool = False,
    compacted=None,
    use_pallas: Optional[bool] = None,
):
    """N4-corrected image.  mask_pad statically bounds the masked voxel
    count (default: the full volume — always safe); if the mask exceeds it,
    excess voxels are ignored and the overflow flag (return_overflow) is set.

    `compacted` optionally supplies (idx, raw_vals, n_mask) from
    ventjax.ops.basic.sort_compact_masked over the PLAIN mask (mask > 0) of
    the flat image — the pipeline computes it once and shares it here and
    with k-means.  The img > 0 sub-condition is applied through the weight
    vector, so results equal the self-compacted path (all reductions are
    weighted).  `return_compacted` appends (idx, corrected_vals, wv01) —
    the compacted N4 output k-means consumes without its own sort.

    use_pallas routes the B-spline fit phase through the VMEM kernels in
    ventjax.ops.n4_pallas (num/den/delta with basis rows rebuilt in VMEM
    from coordinates — ~25x less HBM traffic per iteration than the XLA
    outer-product operands).  None = auto: TPU backend and PC-aligned pad;
    True on a CPU backend runs the kernels in interpreter mode (tests).
    The kernels accumulate in plain float32 where the XLA path uses bf16
    operands — both are validated against the float64 oracle.
    """
    H, W, D = image.shape
    V = H * W * D
    P = V if mask_pad is None else min(int(mask_pad), V)
    dtype = jnp.promote_types(image.dtype, jnp.float32)
    img = image.astype(dtype)

    from ventjax.ops.basic import sort_compact_masked

    if compacted is None:
        m = (mask > 0) & (img > 0)
        idx, raw_vals, n_mask = sort_compact_masked(
            img.reshape(-1), m.reshape(-1), P
        )
        wv = (jnp.arange(P) < n_mask).astype(dtype)
    else:
        idx, raw_vals, n_mask = compacted
        raw_vals = raw_vals.astype(dtype)
        wv = ((jnp.arange(P) < n_mask) & (raw_vals > 0)).astype(dtype)
    overflow = n_mask > P

    vals = jnp.maximum(raw_vals, 1.0e-30)
    logv = jnp.log(jnp.where(wv > 0, vals, 1.0)) * wv
    hc = (idx // (W * D)).astype(jnp.int32)
    wc = ((idx // D) % W).astype(jnp.int32)
    sc = (idx % D).astype(jnp.int32)

    padded = _next_pow2_padded(bins)
    offset = (padded - bins) // 2

    from ventjax.ops.n4_pallas import (
        PC as _PC,
        basis_rows_padded,
        fit_delta_conv_pallas,
        fit_moment_pallas,
        sharpen_hist_pallas,
        sharpen_resid_pallas,
    )

    pad_ok = P % _PC == 0
    # Auto mode means the Mosaic TPU kernels: engage them only on an
    # actual TPU backend (a GPU backend would fail to lower them).
    auto_ok = jax.default_backend() == "tpu" and pad_ok
    interpret = jax.default_backend() == "cpu"
    # Sharpen kernels are OFF in auto mode: their value-table dots need the
    # double-bf16 split for on-chip fidelity (benchmarks/n4_chip_fidelity.py
    # history: plain dots came back 1.4-1.9e-2 vs the oracle — the MXU's
    # default f32 path quantizes inputs to bf16, invisible to CPU interpret
    # tests), and at split precision they are a net loss on the fused
    # pipeline (303 vs 316 vol/s with the XLA sharpen).  use_pallas=True
    # still forces them — accurate (3.5-4.5e-4 on chip) and fully tested.
    # The per-LEVEL choice below governs only the B-spline fit, whose
    # Pallas form has no value tables (explicit bf16 operand casts,
    # CPU-visible, oracle-validated) and wins at the finest level.
    # The Pallas sharpen path hardcodes a 256-slot E table (e256, and the
    # hist kernel's >>4/&15 bin split), so it only supports bins+2 <= 256;
    # larger bins fall back to the XLA _sharpen_vec, which handles any bins.
    sharpen_fits = bins + 2 <= 256
    if use_pallas is None:
        sharpen_use = False
    else:
        sharpen_use = bool(use_pallas) and pad_ok and sharpen_fits

    field_v = jnp.zeros(P, dtype)
    phi_totals = []
    level_iters = []
    for level in range(fitting_levels):
        n_elements = (control_points - 3) * 2 ** level
        ncp = n_elements + 3
        # Per-voxel basis rows / normalizers (computed analytically — no
        # table gathers).
        brv = _bspline_rows(hc, H, n_elements, dtype)
        bcv = _bspline_rows(wc, W, n_elements, dtype)
        bsv = _bspline_rows(sc, D, n_elements, dtype)
        sv = ((brv ** 2).sum(1) * (bcv ** 2).sum(1) * (bsv ** 2).sum(1))
        hi = jax.lax.Precision.HIGH

        # Per-LEVEL choice: the VMEM kernels' cost is ncp-independent
        # (always FP=128-padded rows) while the XLA fit scales with ncp^2,
        # so Pallas only wins at the finest level (measured on v5e:
        # 0.96 vs 1.47 ms/iter/batch16 at ncp=11, but 0.96 vs ~0.2 at
        # ncp=4).  Auto = Pallas iff ncp^2 >= 100.
        # The VMEM kernels' static padding requires ncp^2 <= FP=128 and
        # ncp <= CP=16 (basis_rows_padded asserts / _selection_mats would
        # IndexError at trace time otherwise) — non-default params like
        # control_points=6 @ level 2 (ncp=15) or fitting_levels=5 (ncp=19)
        # exceed them, so both auto AND forced modes fall back to XLA.
        from ventjax.ops.n4_pallas import CP as _CPMAX, FP as _FPMAX
        ncp_fits = ncp * ncp <= _FPMAX and ncp <= _CPMAX
        if use_pallas is None:
            lvl_pallas = auto_ok and ncp_fits and ncp * ncp >= 100
        else:
            lvl_pallas = bool(use_pallas) and pad_ok and ncp_fits

        if lvl_pallas:
            # VMEM fit kernels (ventjax/ops/n4_pallas.py): the kernels
            # stream the iteration-invariant powered basis ROWS ([CP, P]
            # bf16 — 25x smaller than the [P, ncp^2] outer-product
            # operands) and build the outer product on the fly in VMEM.
            br1 = basis_rows_padded(brv, 1)
            bc1 = basis_rows_padded(bcv, 1)
            bs1 = basis_rows_padded(bsv, 1)
            br3 = basis_rows_padded(brv, 3)
            bc3 = basis_rows_padded(bcv, 3)
            bs3 = basis_rows_padded(bsv, 3)
            den_p = fit_moment_pallas(
                wv,
                basis_rows_padded(brv, 2), basis_rows_padded(bcv, 2),
                basis_rows_padded(bsv, 2),
                ncp, interpret=interpret,
            )
            fit_phase = None  # fused loop below; no separate fit closure
        else:
            # XLA fit: iteration-invariant outer-product operands
            # BO^k[p, d*ncp+e] = bcv^k[p,d] * bsv^k[p,e]; the 3-way point
            # contraction num[c,d,e] = sum_p a_p br^3_p[c] bc^3_p[d]
            # bs^3_p[e] collapses to the skinny matmul (a*brv^3)^T @ BO3.
            # The per-iteration operands live in bf16: at [P, ncp^2] they
            # are the dominant HBM traffic of every iteration, and the MXU
            # accumulates their products in f32.  Basis values are in
            # [0,1], so bf16 quantization perturbs the *smooth fitted
            # field* at ~1e-3 relative — far inside the |dVDP| budget
            # (validated against the float64 oracle in tests/test_n4.py).
            bo = (bcv[:, :, None] * bsv[:, None, :]).reshape(P, ncp * ncp)
            bo3 = (bcv[:, :, None] ** 3 * bsv[:, None, :] ** 3).reshape(
                P, ncp * ncp)
            bo2 = (bcv[:, :, None] ** 2 * bsv[:, None, :] ** 2).reshape(
                P, ncp * ncp)
            brv3 = brv ** 3
            bo_h = bo.astype(jnp.bfloat16)
            bo3_h = bo3.astype(jnp.bfloat16)
            den = jnp.einsum(
                "pc,pf->cf", wv[:, None] * brv ** 2, bo2, precision=hi
            )

            def fit_phase(a_v, den=den, brv=brv, brv3=brv3, bo=bo_h,
                          bo3=bo3_h, ncp=ncp):
                num = jnp.einsum(
                    "pc,pf->cf",
                    (a_v[:, None] * brv3).astype(jnp.bfloat16), bo3,
                    preferred_element_type=jnp.float32,
                )
                phi = jnp.where(
                    den != 0.0, num / jnp.where(den != 0.0, den, 1.0), 0.0
                )
                # delta_p = sum_c brv[p,c] * (BO @ phi[c,:]^T)[p,c]
                g = jnp.einsum(
                    "pf,cf->pc", bo, phi.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                return phi, jnp.sum(brv * g, axis=1)

        phi_total = jnp.zeros((ncp, ncp * ncp), dtype)

        def _a_v_from(logu, bmn, bmx, sv=sv):
            """Sharpen phase -> fit target a_v, given logu and its masked
            range (precomputed by the fused delta kernel when available)."""
            if sharpen_use:
                # Pallas sharpen: the histogram build and the E-interp /
                # residual run in VMEM (ventjax/ops/n4_pallas.py); only
                # the tiny 512-pt Wiener-sharpening chain stays in XLA.
                slope = (bmx - bmn) / (bins - 1)
                hist = sharpen_hist_pallas(
                    logu, wv, bmn, slope, bins, interpret=interpret
                )
                e_loc = _sharpen_expectation(
                    hist, bmn, slope, bins, fwhm, wiener_noise, padded,
                    offset,
                )
                e256 = jnp.zeros(256, dtype).at[:bins + 2].set(e_loc)
                return sharpen_resid_pallas(
                    logu, wv, sv, e256, bmn, slope, bins,
                    interpret=interpret,
                )
            sharpened = _sharpen_vec(
                logu, wv, bins, fwhm, wiener_noise, padded, offset,
                binmin=bmn, binmax=bmx,
            )
            residual = (logu - sharpened) * wv
            # flush sub-normals (CPU denormal emulation is ~100x slower)
            residual = jnp.where(jnp.abs(residual) < 1e-18, 0.0, residual)
            return residual / jnp.maximum(sv, 1e-30)

        def _masked_range(logu):
            return (jnp.min(jnp.where(wv > 0, logu, jnp.inf)),
                    jnp.max(jnp.where(wv > 0, logu, -jnp.inf)))

        if lvl_pallas:
            from ventjax.ops.n4_pallas import fit_delta_conv_field_pallas

            def body(carry, ncp=ncp, den_p=den_p, br1=br1, bc1=bc1,
                     bs1=bs1, br3=br3, bc3=bc3, bs3=bs3):
                # Fused iteration tail (VERDICT r2 item 9): the delta
                # kernel emits the done-frozen field, the next logu, AND
                # its histogram range — the only XLA glue left per
                # iteration is the scalar CV arithmetic.
                i, field_v, phi_total, done, itc, logu, bmn, bmx = carry
                a_v = _a_v_from(logu, bmn, bmx)
                num_p = fit_moment_pallas(
                    a_v, br3, bc3, bs3, ncp, interpret=interpret
                )
                phi_p = jnp.where(
                    den_p != 0.0,
                    num_p / jnp.where(den_p != 0.0, den_p, 1.0), 0.0,
                )
                nf, lu, s1, s2, nbmn, nbmx = fit_delta_conv_field_pallas(
                    phi_p, br1, bc1, bs1, wv, field_v, logv, done, ncp,
                    interpret=interpret,
                )
                # ITK convergence: CV of exp(-delta) over the mask, from
                # the kernel's cancellation-free (ed-1) moments.
                nmask = jnp.sum(wv)
                mu = 1.0 + s1 / nmask
                var = jnp.maximum((s2 - s1 * s1 / nmask) / nmask, 0.0)
                cv = jnp.sqrt(var) / mu
                phi = phi_p[:ncp, : ncp * ncp]
                new_phi = jnp.where(done, phi_total, phi_total + phi)
                new_done = done | (cv < convergence_threshold)
                itc = itc + (~done).astype(jnp.int32)
                return i + 1, nf, new_phi, new_done, itc, lu, nbmn, nbmx

            logu0 = (logv - field_v) * wv
            bmn0, bmx0 = _masked_range(logu0)
            out = jax.lax.while_loop(
                lambda c: (c[0] < max_iters) & ~c[3],
                body,
                (jnp.asarray(0), field_v, phi_total, jnp.asarray(False),
                 jnp.asarray(0), logu0, bmn0, bmx0),
            )
            _, field_v, phi_total, _, itc = out[:5]
        else:
            def body(carry, fit_phase=fit_phase):
                i, field_v, phi_total, done, _ = carry
                logu = (logv - field_v) * wv
                bmn, bmx = _masked_range(logu)
                a_v = _a_v_from(logu, bmn, bmx)

                # ITK's convergence measurement: CV of exp(old - new) =
                # exp(-delta) over the mask
                # (itkN4BiasFieldCorrectionImageFilter.hxx).
                nmask = jnp.sum(wv)
                phi, raw = fit_phase(a_v)
                delta = jnp.where(jnp.abs(raw) < 1e-18, 0.0, raw) * wv
                ed = jnp.exp(-delta)
                mu = jnp.sum(ed * wv) / nmask
                sd = jnp.sqrt(jnp.sum(wv * (ed - mu) ** 2) / nmask)
                cv = sd / mu

                new_field = jnp.where(done, field_v, field_v + delta)
                new_phi = jnp.where(done, phi_total, phi_total + phi)
                new_done = done | (cv < convergence_threshold)
                itc = carry[4] + (~done).astype(jnp.int32)
                return i + 1, new_field, new_phi, new_done, itc

            _, field_v, phi_total, _, itc = jax.lax.while_loop(
                lambda c: (c[0] < max_iters) & ~c[3],
                body,
                (jnp.asarray(0), field_v, phi_total, jnp.asarray(False),
                 jnp.asarray(0)),
            )
        level_iters.append(itc)
        phi_totals.append((level, phi_total))

    # Full-grid field: one dense separable evaluation per level (cheap, once).
    total_field = jnp.zeros((H, W, D), dtype)
    for level, phi_total in phi_totals:
        n_elements = (control_points - 3) * 2 ** level
        br = jnp.asarray(bspline_basis_1d(H, n_elements), dtype)
        bc = jnp.asarray(bspline_basis_1d(W, n_elements), dtype)
        bs = jnp.asarray(bspline_basis_1d(D, n_elements), dtype)
        ncp = br.shape[1]
        total_field = total_field + jnp.einsum(
            "hc,wd,se,cde->hws", br, bc, bs,
            phi_total.reshape(ncp, ncp, ncp),
            precision=jax.lax.Precision.HIGH,
        )

    corrected = img * jnp.exp(-total_field)
    out = (corrected,)
    if return_field:
        out = out + (total_field,)
    if return_overflow:
        out = out + (overflow,)
    if return_iters:
        # Diagnostic: per-level count of iterations this call was still
        # unconverged (per-lane under vmap — quantifies lock-step waste).
        out = out + (jnp.stack(level_iters),)
    if return_phi:
        # The complete fitted model, flat: the per-level control lattices
        # concatenated in level order (sizes = n4_phi_sizes).  ~1.9k floats
        # at the defaults — the whole dense bias field compressed to the
        # coefficients that generate it.  n4_field_from_phi_np rebuilds the
        # dense field host-side (the cohort export's compact-N4 transfer).
        out = out + (jnp.concatenate(
            [p.reshape(-1).astype(dtype) for _, p in phi_totals]),)
    if return_compacted:
        # Compacted corrected values at the iteration's own field estimate
        # (field_v; bf16-accumulated, ~1e-4 relative of the dense field) —
        # k-means consumes these without re-sorting; its loose tolerances
        # (centers are means over ~50k voxels) absorb the eps.
        corrected_vals = raw_vals * jnp.exp(-field_v)
        wv_mask_only = (jnp.arange(P) < n_mask).astype(dtype)
        out = out + ((idx, corrected_vals, wv_mask_only),)
    return out if len(out) > 1 else out[0]


def n4_phi_sizes(fitting_levels: int = 4, control_points: int = 4):
    """Per-level flat lattice sizes of the return_phi vector."""
    return [((control_points - 3) * 2 ** level + 3) ** 3
            for level in range(fitting_levels)]


def n4_field_from_phi_np(
    phi_flat: np.ndarray,
    shape,
    fitting_levels: int = 4,
    control_points: int = 4,
) -> np.ndarray:
    """Host (numpy, float64) dense log-bias field from the return_phi vector.

    Mirrors the device's final dense evaluation (the per-level separable
    einsum above) but in float64 numpy, so `hp * exp(-field)` reconstructs
    the corrected volume from host-known inputs plus the ~1.9k-float
    lattice vector.  NOT bit-identical to the device's Precision.HIGH
    (bf16_3x) einsum — agreement is ~1e-6 relative (pinned by
    tests/test_pipeline.py) — which is why the cohort export overwrites
    every masked voxel with device-exact shipped values and uses this only
    for the out-of-mask background, where no metric is ever computed.
    """
    H, W, D = shape
    field = np.zeros((H, W, D), np.float64)
    off = 0
    for level in range(fitting_levels):
        n_elements = (control_points - 3) * 2 ** level
        ncp = n_elements + 3
        k = ncp ** 3
        phi = np.asarray(phi_flat[off:off + k], np.float64).reshape(
            ncp, ncp, ncp)
        off += k
        br = bspline_basis_1d(H, n_elements)
        bc = bspline_basis_1d(W, n_elements)
        bs = bspline_basis_1d(D, n_elements)
        # Separable: contract one axis at a time (never materialize the
        # [H,W,D,ncp^3] broadcast np.einsum would otherwise build).
        t = np.tensordot(br, phi, axes=(1, 0))      # [H, ncp, ncp]
        t = np.tensordot(bc, t, axes=(1, 1))        # [W, H, ncp]
        field += np.tensordot(t, bs, axes=(2, 1)).transpose(1, 0, 2)
    if off != len(phi_flat):
        raise ValueError(
            f"phi vector has {len(phi_flat)} coefficients; levels="
            f"{fitting_levels} control_points={control_points} expects {off}")
    return field
