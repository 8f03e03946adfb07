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


def _snap_stage_rows(geom: CIGeometry, stage_rows) -> list:
    """Snap requested stage row boundaries to complete-ball row counts."""
    ends = geom.shell_ends
    U = int(ends[-1])
    snapped = []
    for r in stage_rows:
        if r >= U:
            continue
        snapped.append(int(ends[np.searchsorted(ends, r)]))
    snapped.append(U)
    # dedupe while preserving order
    out = []
    for r in snapped:
        if not out or r > out[-1]:
            out.append(r)
    return out


def calculate_ci_staged(
    defect: jnp.ndarray,
    geom: CIGeometry,
    max_defect_voxels: int = 8192,
    stage_rows: Tuple[int, ...] = (640, 4096, 16384),
    stage_k: Tuple[int, ...] = (2048, 512, 256),
    chunk_elems: int = 1 << 22,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage-laddered exact CI: identical semantics to calculate_ci, ~20-50x
    less gather work.

    Sphere-growing cost concentrates in the tail: almost every defect voxel's
    first crossing happens within a small radius (the first few hundred LUT
    rows), but the flat scan pays all U~78k rows for every voxel.  The ladder
    processes the radius axis in stages (stage boundaries snapped to
    complete-ball row counts so first-crossing order is preserved exactly):
    stage 0 scans rows [0, r0) for all K voxels; voxels still unresolved are
    compacted (stable argsort, unresolved first) and only they continue into
    the next stage's rows, with their running ball-hit count carried over.

    stage_k[i] bounds how many voxels may continue into stage i+1.  If more
    remain unresolved, the excess voxels are reported saturated and counted
    in the returned stage_overflow (correctness is flagged, never silently
    wrong; bump stage_k to re-run exactly).

    Returns (ci_map, n_saturated, defect_overflow, stage_overflow).
    """
    H, W, D = geom.shape
    K = max_defect_voxels
    d01 = defect != 0

    if geom.border_mode == "wrap":
        flat = _fortran_flat(d01).astype(jnp.float32)
    else:
        flat = _padded_fortran_flat(d01, geom).astype(jnp.float32)

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
    base = base.astype(jnp.int32)

    ends_np = geom.shell_ends
    M = int(ends_np.shape[0])
    L = geom.flat_len
    radii = jnp.asarray(geom.radii)
    rows_snapped = _snap_stage_rows(geom, stage_rows)
    n_stages = len(rows_snapped)
    stage_ks = [K] + [min(int(k), K) for k in stage_k][: n_stages - 1]
    while len(stage_ks) < n_stages:
        stage_ks.append(stage_ks[-1])

    # Global per-lane state.
    resolved = ~valid
    cv_ball = jnp.full(K, M - 1, jnp.int32)   # default: saturated at last ball
    hits = jnp.zeros(K, jnp.float32)
    stage_overflow = jnp.zeros((), jnp.int32)

    a = 0
    for s in range(n_stages):
        b = rows_snapped[s]
        Ks = stage_ks[s]
        # Ball ends strictly inside (a, b]; drop the global last ball, which
        # the reference never tests (CI.py:92-99).
        in_stage = np.nonzero((ends_np > a) & (ends_np <= b))[0]
        in_stage = in_stage[in_stage < M - 1]
        ends_rel = jnp.asarray(ends_np[in_stage] - a - 1, jnp.int32)
        balls = jnp.asarray(in_stage, jnp.int32)
        denom = jnp.asarray(ends_np[in_stage], jnp.float32)
        delta_s = jnp.asarray(geom.delta[a:b])
        w_s = jnp.asarray(geom.first_occ[a:b], jnp.float32)
        rows_s = b - a

        if s == 0:
            sel = jnp.arange(K)
        else:
            # Stable sort: unresolved lanes first, in original order.
            sel = jnp.argsort(resolved, stable=True)[:Ks]
            n_unres = jnp.sum(~resolved)
            stage_overflow = stage_overflow + jnp.maximum(
                n_unres.astype(jnp.int32) - Ks, 0
            )
        bases_s = base[sel]
        carry_s = hits[sel]
        live_s = ~resolved[sel]

        def stage_chunk(args, delta_s=delta_s, w_s=w_s, ends_rel=ends_rel,
                        denom=denom, balls=balls):
            bs, carry, live = args
            tgt = bs[:, None] + delta_s[None, :]
            ok = (tgt >= 0) & (tgt < L)
            vals = jnp.take(flat, jnp.clip(tgt, 0, L - 1), axis=0)
            vals = vals * ok.astype(jnp.float32) * w_s[None, :]
            cum = carry[:, None] + jnp.cumsum(vals, axis=1)
            if ends_rel.shape[0] > 0:
                totals = cum[:, ends_rel]
                failing = (totals / denom[None, :]) < 0.5
                any_f = jnp.any(failing, axis=1) & live
                jrel = jnp.argmax(failing, axis=1)
                ball_g = balls[jrel]
            else:
                any_f = jnp.zeros(bs.shape, bool)
                ball_g = jnp.zeros(bs.shape, jnp.int32)
            return any_f, ball_g, cum[:, -1]

        ck = max(1, min(Ks, chunk_elems // max(rows_s, 1)))
        n_chunks = -(-Ks // ck)
        kpad = n_chunks * ck
        pad = lambda x, fill: jnp.full((kpad,), fill, x.dtype).at[:Ks].set(x)
        any_f, ball_g, new_hits = jax.lax.map(
            stage_chunk,
            (
                pad(bases_s, 0).reshape(n_chunks, ck),
                pad(carry_s, 0.0).reshape(n_chunks, ck),
                pad(live_s, False).reshape(n_chunks, ck),
            ),
        )
        any_f = any_f.reshape(-1)[:Ks]
        ball_g = ball_g.reshape(-1)[:Ks]
        new_hits = new_hits.reshape(-1)[:Ks]

        # Scatter stage results back into global lanes.
        found = any_f & live_s
        cv_ball = cv_ball.at[sel].set(
            jnp.where(found, ball_g, cv_ball[sel])
        )
        hits = hits.at[sel].set(jnp.where(live_s, new_hits, hits[sel]))
        resolved = resolved.at[sel].set(resolved[sel] | found)
        a = b

    # Unresolved lanes (true Rmax saturation or stage overflow) keep the
    # saturated default; stage_overflow is additionally reported so callers
    # can distinguish "genuinely never crossed" from "needs bigger stage_k".
    saturated = ~resolved & valid
    cv = radii[cv_ball] * geom.min_vox

    ci_flat = jnp.zeros(H * W * D, jnp.float32)
    scatter_idx = jnp.where(valid, cidx, H * W * D)
    ci_flat = ci_flat.at[scatter_idx].set(cv, mode="drop")
    return (
        ci_flat.reshape(H, W, D),
        jnp.sum(saturated),
        n_def > K,
        stage_overflow,
    )
