"""Device ops: pure, jit-able JAX functions over [H,W,D] volumes.

Every op is shape-static, differentiable where meaningful, and vmap-able to
batched [N,H,W,D] cohorts (ventjax.pipeline does the batching/sharding).
Each op's semantics mirror a reference formula voxel-for-voxel; the matching
CPU ground truth lives in ventjax.oracle.
"""
from ventjax.ops.basic import (
    minmax_normalize,
    gradient_border,
    masked_mean,
    masked_sorted_index,
    masked_std,
)
from ventjax.ops.median import median3x3_binary
from ventjax.ops.snr import calculate_snr
from ventjax.ops.vdp import vdp_mean_anchored, vdp_linear_binning
from ventjax.ops.kmeans import vdp_kmeans
from ventjax.ops.n4 import n4_bias_correction
from ventjax.ops.ci import calculate_ci

__all__ = [
    "minmax_normalize",
    "gradient_border",
    "masked_mean",
    "masked_sorted_index",
    "masked_std",
    "median3x3_binary",
    "calculate_snr",
    "vdp_mean_anchored",
    "vdp_linear_binning",
    "vdp_kmeans",
    "n4_bias_correction",
    "calculate_ci",
]
