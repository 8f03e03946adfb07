"""Cluster Index (CI) map as a jit-compiled device op.

The reference computes CI with a per-defect-voxel Python thread pool doing
O(radii x np.intersect1d) set intersections (CI.py:87-145) — minutes per
subject.  Here the same first-crossing sphere-growing semantics are
reformulated as dense device work:

  CV(v) = radius of the first complete-shell ball around v whose defect
          fraction drops below 0.5

which, for a batch of defect voxels, is one big gather from a flat defect
indicator followed by a per-shell prefix sum and an argmax — all static
shapes.  Key identity making this exact: the reference's linear-index map
(CI.py:65-68) satisfies vec(v + o) = vec(v) + delta(o), so sphere membership
(including the reference's border aliasing *and* its intersect1d uniqueness
— two offsets collide iff their deltas collide, independent of the center)
is a pure function of host-precomputed per-(vox,Rmax,shape) tables.

Border modes:
  - "wrap": bit-matches the reference/oracle (index aliasing at borders);
  - "pad": geometrically correct zero-padding outside the volume.

The defect-voxel list is padded to a static size `max_defect_voxels`; volumes
with more defect voxels are flagged via the returned overflow indicator (the
pipeline surfaces it in StudyMetrics).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ventjax.oracle.ci_oracle import shell_structure, sphere_pixels


@dataclasses.dataclass(frozen=True)
class CIGeometry:
    """Host-precomputed CI tables for one (vox, rmax, shape, border_mode)."""
    vox: Tuple[float, float, float]
    rmax: int
    shape: Tuple[int, int, int]
    border_mode: str
    delta: np.ndarray        # [U] int32 linear-index delta per LUT row
    first_occ: np.ndarray    # [U] bool: first occurrence of each delta value
    shell_ends: np.ndarray   # [M] int32 cumulative row count per ball
    radii: np.ndarray        # [M] float32 ball radii (scaled-voxel units)
    flat_len: int            # length of the flat indicator array
    pads: Tuple[int, int, int]  # zero-pad widths per axis ("pad" mode only)
    min_vox: float


@functools.lru_cache(maxsize=16)
def build_ci_geometry(
    vox: Tuple[float, float, float],
    shape: Tuple[int, int, int],
    rmax: int = 50,
    border_mode: str = "wrap",
) -> CIGeometry:
    H, W, D = shape
    px = sphere_pixels(vox, rmax)
    radii, sizes, _ = shell_structure(px)
    di = px[:, 1].astype(np.int64)
    dj = px[:, 2].astype(np.int64)
    dk = px[:, 3].astype(np.int64)

    if border_mode == "wrap":
        # Reference linear indexing: vec(i,j,k) = i + (j-1)H + (k-1)HW.
        # Shifting by (H + HW) maps valid voxels onto Fortran-order flat
        # indices in [0, H*W*D); aliased out-of-bounds sphere voxels land on
        # other in-range indices exactly as the reference's px2vec does.
        delta = di + dj * H + dk * H * W
        flat_len = H * W * D
        pads = (0, 0, 0)
    elif border_mode == "pad":
        # Zero-padded flat volume: distinct offsets never collide.
        pr, pc, ps = int(np.abs(di).max()), int(np.abs(dj).max()), int(np.abs(dk).max())
        Hp, Wp, Dp = H + 2 * pr, W + 2 * pc, D + 2 * ps
        delta = di + dj * Hp + dk * Hp * Wp
        flat_len = Hp * Wp * Dp
        pads = (pr, pc, ps)
    else:
        raise ValueError(f"unknown border_mode {border_mode!r}")

    # intersect1d uniqueness: duplicates of a delta count once (CI.py:96).
    _, first_idx = np.unique(delta, return_index=True)
    first_occ = np.zeros(len(delta), dtype=bool)
    first_occ[first_idx] = True

    return CIGeometry(
        vox=tuple(float(v) for v in vox),
        rmax=int(rmax),
        shape=(H, W, D),
        border_mode=border_mode,
        delta=delta.astype(np.int32),
        first_occ=first_occ,
        shell_ends=np.cumsum(sizes).astype(np.int32),
        radii=radii.astype(np.float32),
        flat_len=int(flat_len),
        pads=pads,
        min_vox=float(np.min(np.asarray(vox))),
    )


def _fortran_flat(defect: jnp.ndarray) -> jnp.ndarray:
    """Column-major (i + j*H + k*H*W) flattening of an [H,W,D] volume."""
    return jnp.transpose(defect, (2, 1, 0)).reshape(-1)


def _padded_fortran_flat(defect: jnp.ndarray, geom: CIGeometry) -> jnp.ndarray:
    pr, pc, ps = geom.pads
    padded = jnp.pad(defect, ((pr, pr), (pc, pc), (ps, ps)))
    return _fortran_flat(padded)


def calculate_ci(
    defect: jnp.ndarray,
    geom: CIGeometry,
    max_defect_voxels: int = 8192,
    chunk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CI map for one [H,W,D] binary defect volume.

    Returns (ci_map [H,W,D] float32 in mm, n_saturated, overflowed) where
    n_saturated counts voxels that never crossed below the defect-fraction
    threshold (the reference raises ValueError there, CI.py:101-104) and
    overflowed flags defect counts exceeding the static pad size.
    """
    H, W, D = geom.shape
    K = max_defect_voxels
    d01 = (defect != 0)

    if geom.border_mode == "wrap":
        flat = _fortran_flat(d01).astype(jnp.float32)
    else:
        flat = _padded_fortran_flat(d01, geom).astype(jnp.float32)

    # Static-size defect voxel list in C order (np.argwhere order).
    flat_c = d01.reshape(-1)
    n_def = jnp.sum(flat_c)
    (cidx,) = jnp.nonzero(flat_c, size=K, fill_value=0)
    valid = jnp.arange(K) < n_def
    ii = cidx // (W * D)
    jj = (cidx // D) % W
    kk = cidx % D

    if geom.border_mode == "wrap":
        base = ii + jj * H + kk * H * W
    else:
        pr, pc, ps = geom.pads
        Hp, Wp = H + 2 * pr, W + 2 * pc
        base = (ii + pr) + (jj + pc) * Hp + (kk + ps) * Hp * Wp

    delta = jnp.asarray(geom.delta)
    weight = jnp.asarray(geom.first_occ, jnp.float32)
    ends = jnp.asarray(geom.shell_ends)
    radii = jnp.asarray(geom.radii)
    rows_ball = ends.astype(jnp.float32)
    M = int(geom.shell_ends.shape[0])
    L = geom.flat_len

    def chunk_fn(bases):
        tgt = bases[:, None] + delta[None, :]
        ok = (tgt >= 0) & (tgt < L)
        vals = jnp.take(flat, jnp.clip(tgt, 0, L - 1), axis=0)
        vals = vals * ok.astype(jnp.float32) * weight[None, :]
        cum = jnp.cumsum(vals, axis=1)
        hits_ball = cum[:, ends - 1]
        frac = hits_ball / rows_ball[None, :]
        failing = frac[:, : M - 1] < 0.5
        any_fail = jnp.any(failing, axis=1)
        jstar = jnp.argmax(failing, axis=1)
        cv = jnp.where(any_fail, radii[jstar], radii[M - 1])
        return cv, ~any_fail

    n_chunks = -(-K // chunk)
    kpad = n_chunks * chunk
    bases_pad = jnp.zeros(kpad, jnp.int32).at[:K].set(
        jnp.where(valid, base, 0).astype(jnp.int32)
    )
    cv, saturated = jax.lax.map(chunk_fn, bases_pad.reshape(n_chunks, chunk))
    cv = cv.reshape(-1)[:K] * geom.min_vox
    saturated = saturated.reshape(-1)[:K] & valid

    ci_flat = jnp.zeros(H * W * D, jnp.float32)
    # Padded lanes scatter out of range and are dropped.
    scatter_idx = jnp.where(valid, cidx, H * W * D)
    ci_flat = ci_flat.at[scatter_idx].set(cv, mode="drop")
    ci_map = ci_flat.reshape(H, W, D)
    return ci_map, jnp.sum(saturated), n_def > K
