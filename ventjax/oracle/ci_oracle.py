"""CPU oracle for the Cluster Index (CI) map.

Replicates the behavior of the reference CI module (/root/reference/CI.py)
exactly, including its quirks:

- Sphere geometry identical to getSpherePix (CI.py:33-63): shells grown on the
  float64 grid r = np.arange(0, Rmax, 0.01) with membership
  (r-0.01)^2 < d2 <= r^2 in voxel-scaled space vox/min(vox); the table starts
  with a single [0,0,0,0] row (the np.zeros((1,4)) initializer).
- Linear-index aliasing at volume borders (CI.py:65-68): px2vec has no bounds
  clamp, so out-of-bounds sphere voxels wrap in index space.  Two offsets
  collide iff their linear deltas are equal, independent of the center voxel.
- intersect1d uniqueness (CI.py:96): duplicate aliased indices count once in
  the numerator, while the denominator is the raw prefix row count.
- First-crossing semantics (CI.py:94-105): CV(v) = radius of the *first* ball
  (complete-shell prefix) whose defect fraction drops below 0.5; the final
  shell's complete prefix is never tested; if no prefix fails, the reference
  raises ValueError (we optionally saturate at the last tested radius).

The per-voxel engine here is restated as an incremental shell scan with a hash
set — semantically identical to the reference's O(radii x intersect1d) loop
but fast enough to serve as a test oracle.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=8)
def _sphere_pixels_cached(vox: Tuple[float, float, float], radius: int) -> np.ndarray:
    vox_arr = np.asarray(vox, dtype=np.float64)
    radius = int(radius)
    scale = vox_arr / np.min(vox_arr)
    rng = np.arange(-radius, radius + 1)
    # Offsets and their scaled squared distances.  The reference builds these
    # via `X, Z, Y = np.meshgrid(...)` with default 'xy' indexing (CI.py:52),
    # whose C-order flat scan iterates (Z, X, Y) — we replicate that scan
    # order so the table is bit-identical to the shipped golden LUTs.
    Z, X, Y = np.meshgrid(rng, rng, rng, indexing="ij")
    d2 = (X * scale[0]) ** 2 + (Y * scale[1]) ** 2 + (Z * scale[2]) ** 2
    x = X.ravel()
    y = Y.ravel()
    z = Z.ravel()
    d2 = d2.ravel()

    # Shell radii grid, float64, exactly as the reference computes it.
    r_grid = np.arange(0, radius, 0.01)
    lo = (r_grid - 0.01) ** 2  # note: r_grid[k]-0.01 != r_grid[k-1] exactly
    hi = r_grid ** 2

    # For each offset find every grid radius whose shell captures it:
    # lo[k] < d2 <= hi[k].  hi is increasing, so candidates cluster around
    # searchsorted; float noise in `lo` can in principle catch an offset in
    # two adjacent shells (the reference's vstack loop would then duplicate
    # the row) — we check a small window to reproduce that faithfully.
    k0 = np.searchsorted(hi, d2, side="left")
    rows = []
    for dk in (-1, 0, 1):
        k = k0 + dk
        ok = (k >= 0) & (k < len(r_grid))
        kk = np.clip(k, 0, len(r_grid) - 1)
        member = ok & (d2 <= hi[kk]) & (d2 > lo[kk])
        idx = np.nonzero(member)[0]
        if len(idx):
            rows.append(
                np.column_stack([r_grid[kk[idx]], x[idx], y[idx], z[idx], idx])
            )
    allrows = np.concatenate(rows, axis=0)
    # Reference row order: shells in radius order; within a shell, C-order of
    # the meshgrid scan (which the flat `idx` preserves).
    order = np.lexsort((allrows[:, 4], allrows[:, 0]))
    pxls = allrows[order][:, :4]
    # Prepend the [0,0,0,0] initializer row (CI.py:54 np.zeros((1,4))).
    return np.vstack([np.zeros((1, 4)), pxls])


def sphere_pixels(vox, radius: int = 50) -> np.ndarray:
    """Nx4 [radius, di, dj, dk] sphere-shell table, identical to the
    reference's getSpherePix output (CI.py:33-63)."""
    return _sphere_pixels_cached(tuple(float(v) for v in np.asarray(vox)), int(radius))


def shell_structure(sphere_px: np.ndarray):
    """Decompose the Nx4 table into (radii, shell_sizes, shell_start_rows).

    radii[j] is the radius of ball_j = complete prefix through shell j
    (shell 0 is the lone [0,0,0,0] row).  Boundaries tested by the reference
    loop are the prefixes ball_0 .. ball_{M-1} (the full-table prefix is
    never tested, CI.py:92-99).
    """
    r = sphere_px[:, 0]
    change = np.nonzero(np.diff(r) > 0)[0] + 1  # first row of each new radius
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(r)]])
    radii = r[starts]
    sizes = ends - starts
    return radii, sizes, starts


def calculate_ci_oracle(
    defect: np.ndarray,
    vox=(1, 1, 1),
    rmax: int = 50,
    saturate: bool = False,
) -> np.ndarray:
    """CI map: per defect voxel, CV * min(vox) mm (CI.py:107-145).

    With saturate=False, raises ValueError when a voxel never drops below the
    0.5 fraction before the last tested prefix — matching CI.py:101-104.
    """
    defect = np.asarray(defect)
    H, W, D = defect.shape
    HW = H * W
    vox_arr = np.asarray(vox, dtype=np.float64)
    px = sphere_pixels(vox_arr, rmax)
    radii, sizes, starts = shell_structure(px)

    # Linear-index deltas (the aliasing map).  vec(v+o) = vec(v) + delta(o)
    # where vec(i,j,k) = i + (j-1)H + (k-1)HW (CI.py:65-68).
    delta = (px[:, 1] + px[:, 2] * H + px[:, 3] * HW).astype(np.int64)
    # intersect1d counts unique values: mark the first occurrence of each
    # delta so aliased duplicates count once in the numerator.
    _, first_idx = np.unique(delta, return_index=True)
    is_first = np.zeros(len(delta), dtype=bool)
    is_first[first_idx] = True

    # Defect voxel set in vec space (injective over valid coords).
    dv = np.argwhere(defect != 0)
    def_vec = dv[:, 0] + (dv[:, 1] - 1) * H + (dv[:, 2] - 1) * HW

    n_shells = len(radii)
    ci = np.zeros(defect.shape, dtype=np.float64)
    min_vox = float(np.min(vox_arr))
    def_vec_sorted = np.sort(def_vec)
    rows_ball = np.cumsum(sizes)

    for (i, j, k), base in zip(dv, def_vec):
        # Unique-value membership of every sphere voxel (vectorized per voxel).
        hit = is_first & np.isin(base + delta, def_vec_sorted)
        cum_hits = np.cumsum(np.add.reduceat(hit, starts))
        frac = cum_hits / rows_ball
        # The reference tests balls 0..M-2 in order (the full-table prefix is
        # never tested) and takes the radius of the first failing ball.
        failing = frac[: n_shells - 1] < 0.5
        if failing.any():
            cv = radii[int(np.argmax(failing))]
        elif saturate:
            cv = radii[n_shells - 1]
        else:
            raise ValueError(f"MAX RADIUS reached at voxel ({i},{j},{k})")
        ci[i, j, k] = cv * min_vox
    return ci


def subject_ci(ci_map: np.ndarray, defect: np.ndarray, percentile: float = 0.95) -> float:
    """Subject CI = sorted CI values over defect voxels at index
    int(p * len) (Vent_Analysis.py:268-270)."""
    cvlist = np.sort(ci_map[defect > 0])
    return float(cvlist[int(percentile * len(cvlist))])
