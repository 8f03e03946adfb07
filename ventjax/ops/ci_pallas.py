"""Pallas TPU kernel for the CI pairwise head phase (SURVEY.md §7 hard
part 2 names Pallas as the CI performance lever).

The head phase tests, for every defect voxel (center) against every defect
voxel (witness), whether the first `ns` balls already fail the >= 50%%
defect-fraction rule: fail_j <=> count(dmin2 <= r_j^2) < T_j, where dmin2
is the min-over-alias-combos squared scaled distance (ci_pairwise.py).

The XLA formulation materializes the [rows, K] dmin2 matrix and the
[rows, K, 32] broadcast compare blocks in HBM (XLA's fusion width budget);
this kernel keeps everything in VMEM: a (center-block x witness-block) grid
computes dmin2 for its tile and accumulates the [rows, ns] counts in place,
so HBM traffic is just coordinates in / counts out.  Exactness: identical
f32 expression per combo, tested bit-equal against the XLA head
(tests/test_ci_pallas.py); inbox checks are provably redundant because
scale >= 1 implies d2 <= r_last^2 bounds every |offset| by rmax.

Usage is automatic: calculate_ci_pairwise(..., use_pallas=True) routes the
head phase here on TPU and falls back to the XLA path elsewhere (tests run
the kernel in interpreter mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_kernel(ci_ref, cj_ref, ck_ref, wi_ref, wj_ref, wk_ref,
                 r2_ref, counts_ref, *, combos, scale, n_wblocks):
    """One (center-block, witness-block) grid cell: accumulate ball counts.

    ci/cj/ck: [ROWS, 1] i32 center coords; wi/wj/wk: [1, WB] i32 witness
    coords; r2: [1, NS] f32 squared ball radii; counts: [ROWS, NS] f32,
    accumulated across the witness grid dimension (TPU grids run
    sequentially, so in-place accumulation is safe).
    """
    jblk = pl.program_id(1)

    @pl.when(jblk == 0)
    def _():
        counts_ref[:, :] = jnp.zeros_like(counts_ref)

    s0, s1, s2 = scale
    inf = jnp.float32(np.inf)
    dmin2 = None
    for (p, q, s) in combos:
        oi = (wi_ref[:, :] - ci_ref[:, :]) + p
        oj = (wj_ref[:, :] - cj_ref[:, :]) + q
        ok_ = (wk_ref[:, :] - ck_ref[:, :]) + s
        fx = oi.astype(jnp.float32) * s0
        fy = oj.astype(jnp.float32) * s1
        fz = ok_.astype(jnp.float32) * s2
        d2 = fx * fx + fy * fy + fz * fz
        dmin2 = d2 if dmin2 is None else jnp.minimum(dmin2, d2)

    ns_pad = counts_ref.shape[1]
    # 8-radius sub-blocks with the radius on the sublane dim: the
    # [ROWS, 8, WB] compare intermediate tiles cleanly (f32 sublane 8,
    # lane WB) and stays in VMEM.
    for a in range(0, ns_pad, 8):
        r2blk = r2_ref[0:1, a:a + 8].reshape(1, 8, 1)
        blk = jnp.sum(
            (dmin2[:, None, :] <= r2blk).astype(jnp.float32), axis=2
        )
        counts_ref[:, a:a + 8] += blk


@functools.partial(
    jax.jit, static_argnames=("combos", "scale", "ns", "interpret")
)
def head_counts_pallas(
    ci: jnp.ndarray, cj: jnp.ndarray, ck: jnp.ndarray,
    wi: jnp.ndarray, wj: jnp.ndarray, wk: jnp.ndarray,
    r2_head: jnp.ndarray,
    combos: Tuple[Tuple[int, int, int], ...],
    scale: Tuple[float, float, float],
    ns: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[K, ns] f32 ball hit counts for the first ns balls."""
    K = ci.shape[0]
    Kw = wi.shape[0]
    ROWS = min(128, K)
    WB = min(512, Kw)
    assert K % ROWS == 0 and Kw % WB == 0, (K, Kw)
    ns_pad = 128  # lane-aligned; padded radii are +inf and sliced off
    assert ns <= ns_pad
    r2p = jnp.full((1, ns_pad), jnp.inf, jnp.float32).at[0, :ns].set(
        r2_head.astype(jnp.float32))

    grid = (K // ROWS, Kw // WB)
    cspec = pl.BlockSpec((ROWS, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, WB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, ns_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ROWS, ns_pad), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _head_kernel, combos=tuple(combos), scale=tuple(scale),
        n_wblocks=grid[1],
    )
    counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cspec, cspec, cspec, wspec, wspec, wspec, rspec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((K, ns_pad), jnp.float32),
        interpret=interpret,
    )(
        ci.reshape(K, 1), cj.reshape(K, 1), ck.reshape(K, 1),
        wi.reshape(1, Kw), wj.reshape(1, Kw), wk.reshape(1, Kw),
        r2p,
    )
    return counts[:, :ns]
