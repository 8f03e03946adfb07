"""K-space reconstruction for raw (TWIX) data.

Device equivalent of the reference's per-slice loop
(Vent_Analysis.py:537-540): fftshift(fft2(fftshift(k))) per slice, then
transpose (1,0,2) and flip the column axis.  Batched over slices in one
jitted program (jnp.fft on the slice-stack) instead of a Python loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def recon_2d_multislice(kspace: jnp.ndarray) -> jnp.ndarray:
    """[H, W, S] complex k-space -> image stack with the reference's
    orientation (transpose + column flip)."""
    k = jnp.asarray(kspace)
    shifted = jnp.fft.fftshift(k, axes=(0, 1))
    img = jnp.fft.fft2(shifted, axes=(0, 1))
    img = jnp.fft.fftshift(img, axes=(0, 1))
    return jnp.transpose(img, (1, 0, 2))[:, ::-1, :]


@jax.jit
def recon_2d_multislice_rss(kspace_mc: jnp.ndarray) -> jnp.ndarray:
    """[C, H, W, S] multi-coil k-space -> root-sum-of-squares magnitude
    image stack (real), in the reference's orientation.

    The reference's process_RAW is single-coil only (its 3-D per-slice loop,
    Vent_Analysis.py:538); this is the standard coil combine for data the
    reference cannot ingest: per-coil recon, then sqrt(sum_c |img_c|^2).
    """
    per_coil = jax.vmap(recon_2d_multislice)(jnp.asarray(kspace_mc))
    return jnp.sqrt(jnp.sum(jnp.abs(per_coil) ** 2, axis=0))
