"""CI module compatibility surface (the reference's CI.py public API).

calculate_CI(defectArray, vox, Rmax, type) returns the same CI map the
reference's thread-pool sphere-growing produces (CI.py:107-145) — computed by
the device pairwise engine (exactness tests in tests/test_ci.py).  The helper
functions (multi_which, px2vec, vec2px, getSpherePix, getRadiiIndices) are
provided host-side for users who called them directly.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ventjax.config import DEFAULT_CONFIG, VentConfig
from ventjax.oracle import ci_oracle
from ventjax.pipeline.analyze import build_geometry
from ventjax.ops.ci import CIGeometry, calculate_ci as _ladder
from ventjax.ops.ci_pairwise import CIPairwiseGeometry, calculate_ci_pairwise


def multi_which(A):
    """Indices of nonzero voxels, rows of [i, j, k] (CI.py:10-30)."""
    if np.isscalar(A):
        return np.where(A)[0]
    return np.argwhere(np.asarray(A))


def px2vec(i, j, k, arrayShape):
    """Linear index map incl. the reference's 1-offset (CI.py:65-68)."""
    return i + (j - 1) * arrayShape[0] + (k - 1) * arrayShape[0] * arrayShape[1]


def vec2px(n, arrayShape):
    """Inverse of px2vec (CI.py:70-77)."""
    s = np.ceil(n / (arrayShape[0] * arrayShape[1]))
    n = n - (s - 1) * arrayShape[1] * arrayShape[0]
    c = np.ceil(n / arrayShape[0])
    r = n - (c - 1) * arrayShape[0]
    return int(r), int(c), int(s)


def getSpherePix(vox, radius):
    """Nx4 [r, di, dj, dk] shell table (CI.py:33-63), built in memory — no
    .npy cwd cache; bit-identical to the reference artifacts (golden test)."""
    return ci_oracle.sphere_pixels(vox, radius)


def getRadiiIndices(data):
    """Row indices where a new radius starts (CI.py:79-85)."""
    diffs = np.diff(data[:, 0]) > 0
    return np.where(diffs)[0] + 1


def calculate_CV(defectArrayShape, activeVoxel, defVec, spherePx):
    """Single-voxel CV (CI.py:87-105): the radius of the largest sphere
    centered at activeVoxel whose defect fraction stays >= 0.5.

    Returns np.append(activeVoxel, radius) in scaled-voxel units (the
    caller applies the min(vox) mm scaling, CI.py:142), and raises
    ValueError when even the Rmax sphere stays >= 50% defect — exactly the
    reference's contract, including its intersect1d uniqueness semantics
    (duplicate border-aliased indices count once in the numerator, raw
    prefix row count in the denominator).

    Implementation differs from the reference's per-radius intersect1d
    loop: one first-occurrence scan gives the cumulative unique-defect
    count at every prefix length, so all radii are tested in one pass.
    """
    activeVoxel = np.asarray(activeVoxel)
    sphereRads = getRadiiIndices(spherePx)
    sphereVec = px2vec(
        spherePx[:, 1] + activeVoxel[0],
        spherePx[:, 2] + activeVoxel[1],
        spherePx[:, 3] + activeVoxel[2],
        defectArrayShape,
    )
    uniq, first_idx = np.unique(sphereVec, return_index=True)
    hits = first_idx[np.isin(uniq, defVec)]
    # cum[L] = |unique(sphereVec[:L]) ∩ defVec|, via first occurrences
    cum = np.zeros(len(sphereVec) + 1, np.int64)
    np.add.at(cum, hits + 1, 1)
    cum = np.cumsum(cum)
    for ii in sphereRads:
        if cum[ii] / ii < 0.5:
            return np.append(activeVoxel, spherePx[ii - 1, 0])
    logging.critical(f"--MAX RADIUS of {spherePx[-1, 0]} REACHED--")
    raise ValueError(
        f"sphere at {tuple(activeVoxel)} stayed >=50% defect out to Rmax "
        f"({spherePx[-1, 0]}); the reference raises here too (CI.py:101-104)"
    )


def calculate_CI(
    defectArray,
    vox=(1, 1, 1),
    Rmax: int = 50,
    type: str = "fast",  # noqa: A002 — reference keyword
    config: Optional[VentConfig] = None,
):
    """CI map in mm (CI.py:107-145 'fast' semantics, device-computed).

    The 'slow'/'fast' distinction of the reference is moot here (both were
    the same math; 'slow' was additionally broken per CI.py:125) — every call
    uses the jit-compiled engine.
    """
    cfg = config or DEFAULT_CONFIG
    defect = np.asarray(defectArray)
    geom = build_geometry(
        tuple(float(v) for v in vox),
        defect.shape,
        cfg.replace(ci_rmax=int(Rmax)),
    )
    # Bucket the static pad size by powers of two so repeat calls with
    # similar defect loads reuse the compiled program.
    n_def = int((defect != 0).sum())
    k = max(256, 1 << int(np.ceil(np.log2(max(n_def, 1)))))
    if cfg.ci_shard_slices and cfg.ci_shard_slices > 1:
        # Oversize-volume path: slice-shard the CI over devices (halo
        # exchange, bit-identical; ventjax.dist.halo).  Raises with an
        # actionable message for non-pairwise geometries.
        from ventjax.dist.halo import calculate_ci_sharded

        ci_map, _, ovf = calculate_ci_sharded(
            jnp.asarray(defect.astype(np.float32)), geom,
            n_shards=cfg.ci_shard_slices, max_defect_voxels=k,
        )
        if bool(ovf):
            # k >= n_def rules out center overflow, so the flag means the
            # default per-shard tail budget (k//8) or halo coordinate
            # buffer (k//2 per side) overflowed; retry once with both at
            # full width — with tail_k = halo_pad = k >= n_def no overflow
            # cause remains, and this facade promises reference-exact
            # values, not saturation flags.
            ci_map, _, ovf2 = calculate_ci_sharded(
                jnp.asarray(defect.astype(np.float32)), geom,
                n_shards=cfg.ci_shard_slices, max_defect_voxels=k,
                tail_k=k, halo_pad=k,
            )
            if bool(ovf2):  # unreachable by construction; never go silent
                raise RuntimeError(
                    "sharded CI still overflowed at full-width budgets — "
                    "please report this geometry"
                )
        return np.asarray(ci_map, dtype=np.float64)
    if isinstance(geom, CIPairwiseGeometry):
        ci_map, _, ovf = calculate_ci_pairwise(
            jnp.asarray(defect.astype(np.float32)), geom, max_defect_voxels=k
        )
        if bool(ovf):
            # Same exactness retry as the sharded path above (tail
            # overflow is the only overflow reachable with k >= n_def).
            ci_map, _, _ = calculate_ci_pairwise(
                jnp.asarray(defect.astype(np.float32)), geom,
                max_defect_voxels=k, tail_k=k,
            )
    else:
        ci_map, _, _ = _ladder(
            jnp.asarray(defect.astype(np.float32)), geom, max_defect_voxels=k
        )
    return np.asarray(ci_map, dtype=np.float64)
