"""Ventilation Defect Percentage ops (mean-anchored and linear-binning).

Mirrors Vent_Analysis.py:244-257 voxel-for-voxel; ground truth in
ventjax.oracle.reference.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ventjax.ops.basic import masked_mean, masked_sorted_index
from ventjax.ops.median import median3x3_binary


def vdp_mean_anchored(
    n4: jnp.ndarray, mask: jnp.ndarray, thresh: float = 0.6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean-anchored VDP [Thomen 2015] (Vent_Analysis.py:244-252).

    Returns (defectArray float 0/1, VDP percent).
    defect = medfilt3x3((n4 / mean(n4[mask]) < thresh) * mask) per slice.
    """
    m = (mask > 0).astype(n4.dtype)
    mean_sig = masked_mean(n4, m)
    raw = (n4 / mean_sig < thresh).astype(n4.dtype) * m
    defect = median3x3_binary(raw)
    vdp = 100.0 * jnp.sum(defect) / jnp.sum(mask)
    return defect, vdp


def vdp_linear_binning(
    n4: jnp.ndarray,
    mask: jnp.ndarray,
    edges: Tuple[float, ...] = (0.16, 0.34, 0.52, 0.70, 0.88),
    percentile: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear-binning VDP [Mu He 2016] (Vent_Analysis.py:254-257).

    Normalizer = sorted masked signal at floor index int(count * .99);
    6 bins with <=/> boundaries exactly as the reference writes them;
    VDP_lb counts bins 1 and 2.  Returns (defectArrayLB, VDP_lb).
    """
    m = (mask > 0).astype(n4.dtype)
    denom = masked_sorted_index(n4, m, percentile)
    norm = n4 / denom
    e = edges
    lb = (
        (norm <= e[0]) * 1.0
        + (norm > e[0]) * (norm <= e[1]) * 2.0
        + (norm > e[1]) * (norm <= e[2]) * 3.0
        + (norm > e[2]) * (norm <= e[3]) * 4.0
        + (norm > e[3]) * (norm <= e[4]) * 5.0
        + (norm > e[4]) * 6.0
    ) * mask
    vdp_lb = 100.0 * (jnp.sum(lb == 1) + jnp.sum(lb == 2)) / jnp.sum(mask)
    return lb, vdp_lb
