"""K-means VDP [Kirby 2012] — jit-compiled Lloyd's iterations on device.

The reference imports sklearn.cluster.KMeans but leaves the computation
commented out (Vent_Analysis.py:19,259-261) with a declared-but-never-filled
metadata key 'VDP_km' (line 90).  This op implements it for real, with
deterministic quantile initialization so device and oracle
(ventjax.oracle.reference.vdp_kmeans) agree exactly.

Masked voxels are handled with weights instead of compaction so shapes stay
static under jit; the iteration count is fixed (centers converge long before
the default 30 iterations on 1-D intensity data).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _masked_quantiles(vals: jnp.ndarray, m: jnp.ndarray, k: int) -> jnp.ndarray:
    """np.quantile(vals[m>0], (arange(k)+0.5)/k) with static shapes
    (linear interpolation convention), via one shared-read multi-rank
    bitspace selection."""
    from ventjax.ops.basic import masked_kth_smallest_multi

    n = jnp.sum(m > 0)
    qs = (jnp.arange(k) + 0.5) / k
    pos = qs * (n - 1).astype(vals.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    f = (pos - lo).astype(vals.dtype)
    sel = masked_kth_smallest_multi(vals, m, jnp.concatenate([lo, hi]))
    return (1 - f) * sel[:k] + f * sel[k:]


def vdp_kmeans(
    n4: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 4,
    iters: int = 30,
    defect_clusters: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's k-means on masked intensities; lowest cluster(s) = defect.

    Returns (defect array 0/1 floats, VDP_km percent).
    """
    vals = n4.reshape(-1).astype(jnp.float64 if n4.dtype == jnp.float64 else jnp.float32)
    w = (mask.reshape(-1) > 0).astype(vals.dtype)
    centers0 = _masked_quantiles(vals, w, k)

    def body(carry):
        i, centers, _ = carry
        d = jnp.abs(vals[:, None] - centers[None, :])
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=vals.dtype) * w[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ vals
        new = jnp.where(counts > 0, sums / jnp.where(counts > 0, counts, 1.0),
                        centers)
        # Early stop when centers are exactly unchanged: further iterations
        # would be no-ops, so the result is identical to fixed-count Lloyd's.
        return i + 1, new, jnp.all(new == centers)

    _, centers, _ = jax.lax.while_loop(
        lambda c: (c[0] < iters) & ~c[2],
        body,
        (jnp.asarray(0), centers0, jnp.asarray(False)),
    )

    d = jnp.abs(vals[:, None] - centers[None, :])
    assign = jnp.argmin(d, axis=1)
    order = jnp.argsort(centers)
    rank = jnp.zeros(k, jnp.int32).at[order].set(jnp.arange(k, dtype=jnp.int32))
    defect_flat = (rank[assign] < defect_clusters).astype(n4.dtype) * w
    defect = defect_flat.reshape(n4.shape)
    vdp_km = 100.0 * jnp.sum(defect) / jnp.sum(mask)
    return defect, vdp_km
