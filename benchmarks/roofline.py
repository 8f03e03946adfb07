"""Roofline accounting for the pipeline's top time sinks (round-5 item 5).

For each hot component, measures on-device time and derives achieved
HBM bytes/s and arithmetic FLOP/s from first-principles operation counts,
against the chip peaks, so "structural floor" claims in docs/NEXT.md are
auditable numbers instead of assertions.  The point of the table is the
DIAGNOSIS each row supports: a component near the bandwidth roof is
HBM-bound (more fusion won't help), one near the FLOP roof is
compute-bound, and one far from BOTH is latency/serialization-bound —
the sort networks and scatters on this chip — where neither more FLOPs
nor more bandwidth is the lever.

Peaks used (TPU v5e / v5 lite, public spec): 197 TFLOP/s bf16 MXU,
819 GB/s HBM.  f32 matmul on the MXU runs as bf16 passes (1 pass at
default precision, 3 at HIGH, 6 at HIGHEST) — FLOP utilization is
reported against the bf16 peak with the pass multiplier applied, i.e.
"fraction of the MXU's issue capacity actually used".

Operation counts are arithmetic LOWER bounds (documented per row below);
real traffic includes XLA temporaries, so achieved/peak fractions are
conservative (the truth is at least this close to the roof).

Usage: python benchmarks/roofline.py [--reps 30] [--batch 16]
One JSON line per row; markdown table at the end for docs/PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def timeit(fn, args, reps, sync, chain=10):
    """Median per-dispatch time with CHAINED dispatches: `chain` async
    dispatches per sync, so the ~30-45 ms tunnel sync latency amortizes
    instead of dominating ms-scale ops (docs/PERF.md measurement rule).
    The device executes in-order, so syncing the last output bounds all."""
    fn(*args)  # warm/compile
    sync(fn(*args))
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn(*args)
        sync(out)
        lat.append((time.perf_counter() - t0) / chain)
    return statistics.median(lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch

    os.environ.setdefault("VENTJAX_CACHE_DIR",
                          os.path.expanduser("~/.cache/ventjax/xla"))
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ventjax  # noqa: F401 — engages the compile cache
    from ventjax.ops.basic import sort_compact_masked

    sync = lambda t: jax.tree_util.tree_map(np.asarray, t)
    rows = []

    def emit(name, ms, flop=None, bytes_=None, note=""):
        row = {"component": name, "ms": round(ms * 1e3, 3)}
        if flop is not None:
            row["gflops_achieved"] = round(flop / ms / 1e9, 1)
            row["mxu_frac"] = round(flop / ms / PEAK_BF16_FLOPS, 4)
        if bytes_ is not None:
            row["gbps_achieved"] = round(bytes_ / ms / 1e9, 1)
            row["hbm_frac"] = round(bytes_ / ms / PEAK_HBM_BPS, 4)
        row["note"] = note
        rows.append(row)
        print(json.dumps(row), flush=True)

    V = 128 * 128 * 16          # flagship volume
    rng = np.random.default_rng(0)

    # Representative inputs: REAL phantoms (bias field + planted defects),
    # not random noise — random data converges N4 in one iteration and
    # makes every number a fantasy (first version of this script did).
    from ventjax.io.phantom import make_cohort
    hp_np, mask_np, _ = make_cohort(B, shape=(128, 128, 16),
                                    vox=(1.5, 1.5, 10.0), seed=3)
    hp = jnp.asarray(hp_np)
    mask = jnp.asarray(mask_np)

    # ---- 1. mask compaction (key-value lax.sort over V lanes) ----------
    vals = jnp.asarray(hp_np.reshape(B, V))
    m = jnp.asarray(mask_np.reshape(B, V) > 0)
    # timed fns return SLICES of their outputs: the chained-dispatch sync
    # would otherwise pull MB-scale results over the 39 MB/s tunnel and
    # pollute per-op time; slices force full materialization but transfer
    # ~nothing.
    def _sorted_slice(v, mm):
        i, vv, n = sort_compact_masked(v, mm, 32768)
        return i[:8], vv[:8], n
    f_sort = jax.jit(jax.vmap(_sorted_slice))
    ms = timeit(f_sort, (vals, m), args.reps, sync) / B
    # logical traffic LOWER bound: one read + one write of (key,value) =
    # V*8 B each way; the bitonic-class sort network makes ~log2(V)=18
    # passes over the data, so the sequential-work bound is 2*V*8*18.
    emit("mask compaction (kv-sort V=262144)", ms,
         bytes_=2 * V * 8 * 18,
         note="sort-network passes; far from both roofs => "
              "serialization-bound, not HBM-bound")

    # ---- 2. CI dense-map scatter (K values into V zeros) ---------------
    K = 4096
    idx = jnp.asarray(
        np.sort(rng.choice(V, (B, K), replace=False)).astype(np.int32))
    cv = jnp.asarray(rng.random((B, K)).astype(np.float32))
    # exactly the engine's lowering (ci_pairwise.py:437-438)
    f_scat = jax.jit(jax.vmap(
        lambda i, c: jnp.zeros(V, jnp.float32)
        .at[i].set(c, mode="drop")[::4096]))
    ms = timeit(f_scat, (idx, cv), args.reps, sync) / B
    emit("CI dense-map scatter (K=4096 -> V)", ms,
         bytes_=V * 4 + K * 8,
         note="write V f32 + read K idx/val; XLA scatter lowering")

    # ---- 3. CI pairwise head (distance compare-reduce blocks) ----------
    from ventjax.ops.ci_pairwise import build_ci_pairwise_geometry
    geom = build_ci_pairwise_geometry(
        (1.5, 1.5, 10.0), (128, 128, 16), 50.0, "wrap")
    from ventjax.ops.ci_pairwise import calculate_ci_pairwise
    defect = np.zeros((B, 128, 128, 16), np.float32)
    for b in range(B):
        # clustered severe-ish load ~2000 voxels
        # clustered load like benchmarks config 6 (scattered singles would
        # push every row into the tail sort — a different operating point)
        r0, c0, s0 = rng.integers(20, 90), rng.integers(20, 90), rng.integers(2, 8)
        defect[b, r0:r0 + 14, c0:c0 + 14, s0:s0 + 6] = 1.0
        ii = rng.choice(V, 500, replace=False)
        defect[b].reshape(-1)[ii] = 1.0
    dj = jnp.asarray(defect)
    f_ci = jax.jit(jax.vmap(
        lambda d: calculate_ci_pairwise(d, geom, K)[0][::16, ::16, :]))
    ms = timeit(f_ci, (dj,), args.reps, sync) / B
    # head arithmetic lower bound: rows*K pairwise d2 (3 mul + 3 add +
    # min-reduce over ~alias combos ~ 9) + 96-ball compare-count (rows*K*
    # 96 cmp+add) — count cmp/add as 1 op each.
    n_rows = int(defect.reshape(B, -1).sum(1).mean())
    flop = n_rows * K * (9 * 3 + 96 * 2)
    emit(f"CI pairwise full op (rows~{n_rows}, K={K})", ms, flop=flop,
         bytes_=(V * 4 * 2 + n_rows * K * 0),  # compaction read + dense write
         note="includes compaction+head+tail+scatter; arithmetic is the "
              "head bound only")

    # ---- 4. N4 fit, finest level (Pallas VMEM kernels) ------------------
    from ventjax.ops.n4 import n4_bias_correction
    def _n4_slice(h, m):
        corr, it = n4_bias_correction(h, m, mask_pad=32768,
                                      return_iters=True)
        return corr[::16, ::16, :], it
    f_n4 = jax.jit(jax.vmap(_n4_slice))
    out = f_n4(hp, mask)
    iters = np.asarray(out[1])          # [B, levels]
    ms = timeit(f_n4, (hp, mask), args.reps, sync) / B
    P = 32768
    # per-iteration arithmetic lower bound at level l (ncp = nl+3):
    #   fit num + delta: 2 * (2*P*ncp^3)   [3-way basis contractions]
    #   sharpen one-hot matmuls: 4 * 2*P*16*16 (hi/lo groups, G~13)
    total_flop = 0.0
    for l in range(iters.shape[1]):
        ncp = (4 - 3) * 2 ** l + 3
        it = float(iters[:, l].mean())
        total_flop += it * (2 * 2 * P * ncp ** 3 + 4 * 2 * P * 13 * 16)
    emit("N4 full op (P=32768, mean iters "
         f"{np.round(iters.mean(axis=0), 1).tolist()})", ms,
         flop=total_flop,
         bytes_=V * 4 * 3,
         note="fit+sharpen arithmetic lower bound over measured iteration "
              "counts; small-ncp outputs cap MXU tiling")

    # ---- 5. context row: fused pipeline ---------------------------------
    from ventjax.config import DEFAULT_CONFIG
    from ventjax.pipeline.analyze import build_geometry, analyze_cohort
    cfg = DEFAULT_CONFIG.replace(ci_max_defect_voxels=4096)
    g2 = build_geometry((1.5, 1.5, 10.0), (128, 128, 16), cfg)
    f_pipe = jax.jit(lambda h, m: analyze_cohort(h, m, g2, cfg).metrics.vdp)
    # (vdp is [B] — already tiny)
    ms = timeit(f_pipe, (hp, mask), args.reps, sync) / B
    emit("fused pipeline (batch 16)", ms,
         note="context: the headline bench.py path")

    print("\n| component | ms/vol | GFLOP/s | MXU frac | GB/s | HBM frac | diagnosis |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['component']} | {r['ms']} | "
              f"{r.get('gflops_achieved','—')} | {r.get('mxu_frac','—')} | "
              f"{r.get('gbps_achieved','—')} | {r.get('hbm_frac','—')} | "
              f"{r['note']} |")


if __name__ == "__main__":
    main()
