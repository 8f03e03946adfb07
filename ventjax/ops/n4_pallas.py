"""Pallas TPU kernels for N4's B-spline fit phase.

The XLA fit (ventjax/ops/n4.py) materializes the outer-product basis
operands bo^k = (bcv^k ⊗ bsv^k) as [P, ncp^2] arrays and re-reads them from
HBM on every while-loop iteration (~28 MB/lane/iter in bf16 at ncp=11) —
measured at ~1.5 ms/iter/batch16, the single largest slice of the fused
pipeline (benchmarks/n4_micro.py).  These kernels rebuild the cubic
B-spline basis *in VMEM from the int32 voxel coordinates* (the same
analytic cardinal form as ops/n4.py:_bspline_rows) and form the outer
product on the fly, so HBM traffic per iteration drops to the coordinate
and weight vectors (~1 MB/lane/iter) and the MXU contraction runs out of
VMEM:

- fit_moment_pallas: mom[c, d*ncp+e] = sum_p a_p br^k[p,c] bc^k[p,d]
  bs^k[p,e] — with (a = a_v, k = 3) this is the fit numerator `num`, with
  (a = wv, k = 2) the denominator `den`.
- fit_delta_pallas: delta[p] = sum_{c,d,e} phi[c,d*ncp+e] br[p,c] bc[p,d]
  bs[p,e] — the per-voxel field update, evaluated as a [16,128] @
  [128, PC] matmul against the VMEM outer product.

Mosaic-lowering note: the [FP, PC] outer-product rows (row f = column
d = f//ncp of bc times column e = f%ncp of bs) are produced by two static
one-hot selection matmuls over the [CP, PC] basis sets — flat 2-D
arithmetic only.  Row gathers do not lower in Mosaic, and evaluating the
splines directly at all FP rows costs ~8x the VPU work (measured: it
erased the kernel's win: 316 -> 147 vol/s).  Selection rows beyond ncp^2
are zero, which is exactly the padding the contraction needs.

Arithmetic is plain float32 (the XLA path quantizes bo to bf16; tests
assert both land inside the float64 oracle's tolerance).  Padded voxels
must carry a = 0 (the moment kernel) — delta at padded voxels is garbage
and is masked by wv outside, exactly like the XLA path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = 16     # padded control-point rows (ncp <= 11 for ITK-default N4)
FP = 128    # padded ncp^2 lanes
PC = 4096   # voxels per grid step (keeps the [FP, PC] temps in VMEM)


def _spline(x):
    """Cardinal cubic B-spline at |distance| x (ops/n4.py:_bspline_rows)."""
    near = (4.0 - 6.0 * x * x + 3.0 * x ** 3) / 6.0
    far = (2.0 - x) ** 3 / 6.0
    return jnp.where(x < 1.0, near, jnp.where(x < 2.0, far, 0.0))


def _pow(b, power: int):
    if power == 2:
        return b * b
    if power == 3:
        return b * b * b
    return b


def _basis_cp(t, power: int):
    """[CP, n] basis rows (row c = B(|t - c + 1|)^power) from [1, n] t."""
    c = jax.lax.broadcasted_iota(
        jnp.int32, (CP, t.shape[1]), 0
    ).astype(jnp.float32)
    return _pow(_spline(jnp.abs(t - c + 1.0)), power)


def _outer_fp(bc_k, bs_k, sd_ref, se_ref):
    """[FP, n] outer-product rows from [CP, n] powered basis sets.

    Row f needs bc_k[f // ncp] * bs_k[f % ncp]; the row replication is two
    static one-hot selection matmuls (sd/se are [FP, CP] constants) — a
    gather would not lower in Mosaic, and evaluating the splines directly
    at all FP rows costs ~8x the VPU work (measured: it erased the
    kernel's win)."""
    bd = jax.lax.dot_general(
        sd_ref[:, :], bc_k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    be = jax.lax.dot_general(
        se_ref[:, :], bs_k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return bd * be


@functools.lru_cache(maxsize=8)
def _selection_mats(ncp: int):
    """Static [FP, CP] one-hot row-selection matrices for d = f // ncp,
    e = f %% ncp (zero rows for f >= ncp^2)."""
    sd = np.zeros((FP, CP), np.float32)
    se = np.zeros((FP, CP), np.float32)
    for f in range(ncp * ncp):
        sd[f, f // ncp] = 1.0
        se[f, f % ncp] = 1.0
    return sd, se


def _scaled(ref, t_scale: float):
    return ref[:, :].astype(jnp.float32) * jnp.float32(t_scale)


def _moment_kernel(a_ref, hc_ref, wc_ref, sc_ref, sd_ref, se_ref, mom_ref,
                   *, t_scales, power):
    @pl.when(pl.program_id(0) == 0)
    def _():
        mom_ref[:, :] = jnp.zeros_like(mom_ref)

    th = _scaled(hc_ref, t_scales[0])
    tw = _scaled(wc_ref, t_scales[1])
    ts = _scaled(sc_ref, t_scales[2])
    ax = a_ref[:, :] * _basis_cp(th, power)           # [CP, PC]
    bc_k = _basis_cp(tw, power)
    bs_k = _basis_cp(ts, power)
    outer = _outer_fp(bc_k, bs_k, sd_ref, se_ref)     # [FP, PC]
    mom_ref[:, :] += jax.lax.dot_general(
        ax, outer, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("ncp", "t_scales", "power", "interpret")
)
def fit_moment_pallas(
    a: jnp.ndarray,
    hc: jnp.ndarray, wc: jnp.ndarray, sc: jnp.ndarray,
    ncp: int,
    t_scales: Tuple[float, float, float],
    power: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[CP, FP] moment matrix; slice [:ncp, :ncp*ncp] for the fit."""
    P = a.shape[0]
    assert P % PC == 0, P
    grid = (P // PC,)
    vspec = pl.BlockSpec((1, PC), lambda i: (0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((FP, CP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((CP, FP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sd, se = _selection_mats(ncp)
    kernel = functools.partial(
        _moment_kernel, t_scales=tuple(t_scales), power=power
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vspec, vspec, vspec, vspec, sspec, sspec],
        out_specs=mspec,
        out_shape=jax.ShapeDtypeStruct((CP, FP), jnp.float32),
        interpret=interpret,
    )(
        a.astype(jnp.float32).reshape(1, P),
        hc.reshape(1, P), wc.reshape(1, P), sc.reshape(1, P),
        jnp.asarray(sd), jnp.asarray(se),
    )


def _delta_kernel(phi_ref, hc_ref, wc_ref, sc_ref, sd_ref, se_ref, out_ref,
                  *, t_scales):
    th = _scaled(hc_ref, t_scales[0])
    tw = _scaled(wc_ref, t_scales[1])
    ts = _scaled(sc_ref, t_scales[2])
    br = _basis_cp(th, 1)                             # [CP, PC]
    outer = _outer_fp(
        _basis_cp(tw, 1), _basis_cp(ts, 1), sd_ref, se_ref
    )                                                 # [FP, PC]
    g = jax.lax.dot_general(
        phi_ref[:, :], outer, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [CP, PC]
    out_ref[:, :] = jnp.sum(br * g, axis=0, keepdims=True)   # [1, PC]


@functools.partial(
    jax.jit, static_argnames=("ncp", "t_scales", "interpret")
)
def fit_delta_pallas(
    phi: jnp.ndarray,
    hc: jnp.ndarray, wc: jnp.ndarray, sc: jnp.ndarray,
    ncp: int,
    t_scales: Tuple[float, float, float],
    interpret: bool = False,
) -> jnp.ndarray:
    """[P] field update delta = B phi at every compacted voxel.

    phi is the [CP, FP]-padded coefficient matrix (rows c, lanes d*ncp+e;
    padded entries zero).
    """
    P = hc.shape[0]
    assert P % PC == 0, P
    grid = (P // PC,)
    vspec = pl.BlockSpec((1, PC), lambda i: (0, i), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((CP, FP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # out is [1, P] with [1, PC] blocks — a block dim equal to the array
    # dim satisfies Mosaic's tiling rule where a sublane of 8 would not.
    ospec = pl.BlockSpec((1, PC), lambda i: (0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((FP, CP), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sd, se = _selection_mats(ncp)
    kernel = functools.partial(_delta_kernel, t_scales=tuple(t_scales))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pspec, vspec, vspec, vspec, sspec, sspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        interpret=interpret,
    )(
        phi.astype(jnp.float32),
        hc.reshape(1, P), wc.reshape(1, P), sc.reshape(1, P),
        jnp.asarray(sd), jnp.asarray(se),
    )
    return out.reshape(P)
