"""Randomized k-means VDP parameter sweep: device vs NumPy oracle.

The default-parameter parity test (tests/test_ops.py) pins k=4 on phantom
data; this sweep draws random k / defect_clusters / iteration budgets over
random gamma intensity fields.  Two contracts:

- float32 device (the production dtype): boundary voxels may flip cluster
  in f32 vs the f64 oracle, so the assertion is the driver fidelity budget
  |dVDP_km| < 0.1pp plus a bounded flip fraction — not bit equality.
- float64 device (via jax.enable_x64): the deterministic
  quantile init makes the runs exactly comparable; the defect array must
  match the oracle voxel-for-voxel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ventjax import oracle
from ventjax.ops import vdp_kmeans


def _draw(seed):
    rng = np.random.default_rng(3000 + seed)
    k = int(rng.integers(3, 7))
    params = dict(
        k=k,
        iters=int(rng.integers(10, 40)),
        defect_clusters=int(rng.integers(1, min(3, k))),
    )
    shape = (24, 24, 6)
    mask = (rng.random(shape) < 0.4).astype(np.float64)
    vals = rng.gamma(4.0, 100.0, shape) * mask
    return params, mask, vals


@pytest.mark.parametrize("seed", range(6))
def test_kmeans_random_params_f32_within_budget(seed):
    params, mask, vals = _draw(seed)
    km_dev, v_dev = vdp_kmeans(jnp.asarray(vals), jnp.asarray(mask), **params)
    km_or, v_or = oracle.vdp_kmeans(vals, mask, **params)
    assert abs(float(v_dev) - v_or) < 0.1, params  # driver budget, pp
    flips = np.sum(np.asarray(km_dev) != km_or)
    assert flips <= 0.002 * mask.sum(), (params, int(flips))


@pytest.mark.parametrize("seed", range(6))
def test_kmeans_random_params_f64_loop_equivalence(seed):
    """The device Lloyd's LOOP is exactly the oracle's: start both from the
    device's (f32-bitspace-quantized) initial centers and the f64 device run
    must reproduce the oracle voxel-for-voxel.  (Pure end-to-end f64
    equality can't hold: masked_kth_smallest_multi selects init quantiles
    through 32-bit order keys, and at k>=6 that ~1e-7 init perturbation can
    pick a different — equally valid — local optimum.)"""
    params, mask, vals = _draw(seed)
    with jax.enable_x64(True):
        from ventjax.ops.basic import sort_compact_masked
        from ventjax.ops.kmeans import _masked_quantiles

        flat = jnp.asarray(vals.reshape(-1), jnp.float64)
        flat_m = jnp.asarray(mask.reshape(-1) > 0)
        _, cv, n_m = sort_compact_masked(flat, flat_m, flat.shape[0])
        wv = (jnp.arange(flat.shape[0]) < n_m).astype(jnp.float64)
        init = np.asarray(_masked_quantiles(cv, wv, params["k"]))

        km_dev, v_dev = vdp_kmeans(
            jnp.asarray(vals, jnp.float64), jnp.asarray(mask, jnp.float64),
            **params)
        km_dev = np.asarray(km_dev)
        v_dev = float(v_dev)
    km_or, v_or = oracle.vdp_kmeans(vals, mask, init_centers=init, **params)
    assert v_dev == pytest.approx(v_or, abs=1e-9), params
    assert np.array_equal(km_dev, km_or), params
