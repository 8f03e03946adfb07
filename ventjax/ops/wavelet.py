"""2-D Haar wavelet decomposition / reconstruction / denoising.

The reference's roadmap lists a "Denoise Option" (README.md:29) prototyped in
its playground script with pywt's Haar dwt2/idwt2 + detail-coefficient
thresholding (vent playground.py, wavelet section).  pywt is not available
here; this is the orthonormal 2-D Haar transform written directly in JAX —
slice-wise over [H,W,D] volumes, fully vectorized, jit-able.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def haar_dwt2(x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Single-level orthonormal Haar DWT of [..., H, W] (H, W even).

    Returns (cA, (cH, cV, cD)) with pywt's layout: cH = horizontal detail
    (varies along rows), cV = vertical detail, cD = diagonal.
    """
    a = x[..., 0::2, 0::2]
    b = x[..., 0::2, 1::2]
    c = x[..., 1::2, 0::2]
    d = x[..., 1::2, 1::2]
    ca = (a + b + c + d) / 2.0
    ch = (a + b - c - d) / 2.0
    cv = (a - b + c - d) / 2.0
    cd = (a - b - c + d) / 2.0
    return ca, (ch, cv, cd)


def haar_idwt2(ca, coeffs) -> jnp.ndarray:
    """Inverse of haar_dwt2 (perfect reconstruction)."""
    ch, cv, cd = coeffs
    a = (ca + ch + cv + cd) / 2.0
    b = (ca + ch - cv - cd) / 2.0
    c = (ca - ch + cv - cd) / 2.0
    d = (ca - ch - cv + cd) / 2.0
    h2, w2 = ca.shape[-2], ca.shape[-1]
    out = jnp.zeros((*ca.shape[:-2], h2 * 2, w2 * 2), ca.dtype)
    out = out.at[..., 0::2, 0::2].set(a)
    out = out.at[..., 0::2, 1::2].set(b)
    out = out.at[..., 1::2, 0::2].set(c)
    out = out.at[..., 1::2, 1::2].set(d)
    return out


def denoise_volume(
    volume: jnp.ndarray, threshold: float, levels: int = 1, soft: bool = False
) -> jnp.ndarray:
    """Haar wavelet denoising of an [H,W,D] volume, slice by slice.

    Detail coefficients with |c| <= threshold are zeroed (hard, the
    playground's apply_threshold) or shrunk (soft thresholding).
    """
    H, W = volume.shape[0], volume.shape[1]
    step = 1 << levels
    if H % step or W % step:
        raise ValueError(
            f"H and W must be divisible by 2**levels={step} for the Haar "
            f"DWT (got {H}x{W}); pad or crop the volume first")
    x = jnp.moveaxis(volume, -1, 0).astype(jnp.float32)  # [D, H, W]

    def thresh(c):
        if soft:
            return jnp.sign(c) * jnp.maximum(jnp.abs(c) - threshold, 0.0)
        return jnp.where(jnp.abs(c) > threshold, c, 0.0)

    def denoise_level(x, level):
        if level == 0:
            return x
        ca, (ch, cv, cd) = haar_dwt2(x)
        ca = denoise_level(ca, level - 1)
        return haar_idwt2(ca, (thresh(ch), thresh(cv), thresh(cd)))

    out = denoise_level(x, levels)
    return jnp.moveaxis(out, 0, -1)
