"""3x3 per-slice median filter for binary defect masks.

The reference applies scipy.signal.medfilt2d (default 3x3, zero-padded) to the
binary array (norm < thresh) * mask, slice by slice
(Vent_Analysis.py:248-249).  For a 0/1 input the 3x3 median is simply
"at least 5 of the 9 window entries are 1", which maps to one zero-padded
3x3 box-sum (a reduce_window add) and a compare — no sorting network needed.
This keeps the op a fused VPU kernel under XLA for the whole [H,W,D] volume.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def median3x3_binary(x: jnp.ndarray) -> jnp.ndarray:
    """Per-slice 3x3 zero-padded median of a binary [H,W,D] volume."""
    counts = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        window_dimensions=(3, 3, 1),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (0, 0)),
    )
    return (counts >= 5.0).astype(jnp.float32)
