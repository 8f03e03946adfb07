"""SNR with the reference's exact noise-mask construction.

Mirrors Vent_Analysis.py:337-357, including its index quirks (documented in
ventjax.oracle.reference.calculate_snr): the zeroed region is the outer
product of
  rows:   {r : row r intersects the mask}  ∪ {0}  (0 sneaks in because the
          reference multiplies a boolean vector by arange and feeds the
          products — zeros included — to np.ix_),
  cols:   the contiguous range [min nonzero mask col (excluding col 0),
          max mask col)  — half-open, max excluded,
  slices: like rows (slice 0 sneaks in too),
after which the first/last `fov_buffer` rows are zeroed.  SNR =
(mean(signal) - mean(noise)) / std(noise) with population std.

Implemented as pure masked reductions — no boolean indexing — so the whole op
fuses under jit and vmaps over cohorts.
"""
from __future__ import annotations

import jax.numpy as jnp

from ventjax.ops.basic import masked_mean, masked_std


def noise_mask(mask: jnp.ndarray, fov_buffer: int = 20) -> jnp.ndarray:
    """The reference's noisemask (1 = noise voxel), shape-static."""
    H, W, D = mask.shape
    m = mask > 0
    row_has = jnp.any(m, axis=(1, 2))
    col_has = jnp.any(m, axis=(0, 2))
    slc_has = jnp.any(m, axis=(0, 1))

    r_idx = jnp.arange(H)
    c_idx = jnp.arange(W)
    s_idx = jnp.arange(D)

    # rows/slices: the set of products (has * index) includes 0 whenever any
    # index has no mask — i.e. index 0 is zeroed unless every row has mask.
    row_zero = row_has | ((r_idx == 0) & ~jnp.all(row_has))
    slc_zero = slc_has | ((s_idx == 0) & ~jnp.all(slc_has))

    # cols: contiguous arange(min positive masked col, max masked col).
    col_pos = jnp.where(col_has & (c_idx > 0), c_idx, W + 1)
    min_pos = jnp.min(col_pos)
    max_col = jnp.max(jnp.where(col_has, c_idx, 0))
    col_zero = (c_idx >= min_pos) & (c_idx < max_col)

    zeroed = (
        row_zero[:, None, None] & col_zero[None, :, None] & slc_zero[None, None, :]
    )
    nm = jnp.where(zeroed, 0.0, 1.0)
    buffer_rows = (r_idx < fov_buffer) | (r_idx >= H - fov_buffer)
    return jnp.where(buffer_rows[:, None, None], 0.0, nm)


def calculate_snr(a: jnp.ndarray, mask: jnp.ndarray, fov_buffer: int = 20) -> jnp.ndarray:
    nm = noise_mask(mask, fov_buffer)
    sig_mean = masked_mean(a, (mask > 0).astype(a.dtype))
    noi_mean = masked_mean(a, nm)
    noi_std = masked_std(a, nm)
    return (sig_mean - noi_mean) / noi_std
