"""Micro-bench of the Pallas N4 fit kernels (num + delta chained per iter).

Sweeps the PC (voxels-per-grid-step) constant — per-step grid overhead is
the suspected floor at PC=4096 (P=57344/4096 = 14 steps x 16 vmap lanes =
224 sequential steps per kernel call).  One process per PC value (PC is
baked into the traced kernels):

  for pc in 4096 8192; do python benchmarks/n4_pallas_micro.py --pc $pc; done
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--loop", type=int, default=100)
    p.add_argument("--pc", type=int, default=0, help="override n4_pallas.PC")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ventjax.ops import n4_pallas

    if args.pc:
        n4_pallas.PC = args.pc

    import jax
    import jax.numpy as jnp

    from ventjax.io.phantom import make_cohort
    from ventjax.ops.basic import sort_compact_masked

    B, L = args.batch, args.loop
    shape = (128, 128, 16)
    H, W, D = shape
    V = int(np.prod(shape))
    hp_np, mask_np, _ = make_cohort(B, shape=shape, vox=(1.5, 1.5, 10.0),
                                    seed=0)
    hp = jnp.asarray(hp_np)
    mask = jnp.asarray(mask_np)
    max_mask = int((mask_np > 0).sum(axis=(1, 2, 3)).max())
    P = min(V, -(-max_mask // 8192) * 8192)
    assert P % n4_pallas.PC == 0, (P, n4_pallas.PC)

    @jax.jit
    @jax.vmap
    def compact(h, m):
        return sort_compact_masked(h.reshape(-1), m.reshape(-1) > 0, P)

    idx, vals, n_mask = compact(hp, mask)
    wv = (jnp.arange(P)[None, :] < n_mask[:, None]).astype(jnp.float32)
    logv = jnp.log(jnp.maximum(vals, 1e-30)) * wv
    hc = (idx // (W * D)).astype(jnp.int32)
    wc = ((idx // D) % W).astype(jnp.int32)
    sc = (idx % D).astype(jnp.int32)

    level = 3
    n_elements = 1 * 2 ** level
    ncp = n_elements + 3
    interpret = jax.default_backend() == "cpu"

    from ventjax.ops.n4 import _bspline_rows

    @jax.jit
    @jax.vmap
    def fit_loop(residual0, w, hcv, wcv, scv):
        brv = _bspline_rows(hcv, H, n_elements, jnp.float32)
        bcv = _bspline_rows(wcv, W, n_elements, jnp.float32)
        bsv = _bspline_rows(scv, D, n_elements, jnp.float32)
        rows = n4_pallas.basis_rows_padded
        br1, bc1, bs1 = rows(brv, 1), rows(bcv, 1), rows(bsv, 1)
        br3, bc3, bs3 = rows(brv, 3), rows(bcv, 3), rows(bsv, 3)
        den = n4_pallas.fit_moment_pallas(
            w, rows(brv, 2), rows(bcv, 2), rows(bsv, 2), ncp,
            interpret=interpret)

        def body(_, residual):
            num = n4_pallas.fit_moment_pallas(
                residual, br3, bc3, bs3, ncp, interpret=interpret)
            phi = jnp.where(den != 0.0,
                            num / jnp.where(den != 0.0, den, 1.0), 0.0)
            delta = n4_pallas.fit_delta_pallas(
                phi, br1, bc1, bs1, ncp, interpret=interpret)
            return residual - 1e-6 * delta * w

        return jax.lax.fori_loop(0, L, body, residual0)

    outs = fit_loop(logv, wv, hc, wc, sc)
    np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fit_loop(logv, wv, hc, wc, sc) for _ in range(4)]
        np.asarray(outs[-1])
        best = min(best, (time.perf_counter() - t0) / 4)
    print(json.dumps({
        "pc": n4_pallas.PC, "P": P, "batch": B,
        "fit_pallas_ms_per_iter_batch": round(best / L * 1e3, 4),
    }))


if __name__ == "__main__":
    main()
