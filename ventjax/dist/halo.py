"""Slice-axis (D) sharded CI via halo exchange — the stencil analog of
sequence parallelism (SURVEY.md §5 long-context).

For volumes whose slice axis is sharded over a mesh axis, each device
computes CI for the defect voxels of its local slab.  The pairwise engine
only needs *witness* defect voxels within the sphere reach, so each device
ppermutes boundary slabs of width ceil(r_last/scale_z)+1 with its neighbors
(one slab of slack covers the wrap-alias candidates, which shift dk by at
most 1) and runs the exact engine on (local centers, local+halo witnesses).
Results are bit-identical to the unsharded engine (tests/test_dist.py).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ventjax.ops.ci_pairwise import CIPairwiseGeometry, ci_pairwise_balls


def halo_width(geom: CIPairwiseGeometry) -> int:
    """Slabs of witness context needed on each side of a shard."""
    reach = int(np.floor(np.sqrt(geom.r2_last) / geom.scale[2]))
    return reach + 1  # +1: wrap-alias candidates shift dk by +-1


def make_sliced_ci_fn(
    geom: CIPairwiseGeometry,
    mesh: Mesh,
    axis_name: str = "space",
    max_defect_per_shard: int = 2048,
    witness_pad: int = 4096,
):
    """Build a jitted fn: defect [H,W,D] (D sharded) -> (ci_map, n_saturated,
    overflow) with the same semantics as calculate_ci_pairwise."""
    H, W, D = geom.shape
    n_shards = mesh.shape[axis_name]
    assert D % n_shards == 0, "slice axis must divide the mesh"
    dl = D // n_shards
    hz = halo_width(geom)
    assert hz <= dl, "halo wider than a shard; use fewer shards"
    M = geom.n_balls
    K = max_defect_per_shard
    SENT = jnp.int32(1 << 20)

    def body(defect_local):
        idx = jax.lax.axis_index(axis_name)
        n = jax.lax.axis_size(axis_name)
        d01 = (defect_local != 0).astype(jnp.float32)

        # halo below comes from the left neighbor's top slabs, halo above
        # from the right neighbor's bottom slabs; edge devices receive zeros.
        lo_halo = jax.lax.ppermute(
            d01[:, :, -hz:], axis_name,
            [(i, i + 1) for i in range(n - 1)],
        )
        hi_halo = jax.lax.ppermute(
            d01[:, :, :hz], axis_name,
            [(i + 1, i) for i in range(n - 1)],
        )
        ext = jnp.concatenate([lo_halo, d01, hi_halo], axis=2)

        # witnesses: all defect voxels in slab+halo, global coordinates.
        wflat = ext.reshape(-1) != 0
        nw = jnp.sum(wflat)
        (wc,) = jnp.nonzero(wflat, size=witness_pad, fill_value=0)
        wvalid = jnp.arange(witness_pad) < nw
        dl_ext = dl + 2 * hz
        wi = jnp.where(wvalid, (wc // (W * dl_ext)).astype(jnp.int32), SENT)
        wj = jnp.where(wvalid, ((wc // dl_ext) % W).astype(jnp.int32), -SENT)
        wk = jnp.where(
            wvalid,
            (wc % dl_ext).astype(jnp.int32) - hz + idx.astype(jnp.int32) * dl,
            SENT,
        )

        # centers: local-slab defect voxels.
        cflat = d01.reshape(-1) != 0
        nc = jnp.sum(cflat)
        (cc,) = jnp.nonzero(cflat, size=K, fill_value=0)
        cvalid = jnp.arange(K) < nc
        vi = jnp.where(cvalid, (cc // (W * dl)).astype(jnp.int32), SENT)
        vj = jnp.where(cvalid, ((cc // dl) % W).astype(jnp.int32), -SENT)
        vk = jnp.where(
            cvalid,
            (cc % dl).astype(jnp.int32) + idx.astype(jnp.int32) * dl,
            SENT,
        )

        jballs = ci_pairwise_balls((vi, vj, vk), (wi, wj, wk), geom)
        saturated = (jballs >= M - 1) & cvalid
        cv = jnp.asarray(geom.radii32)[jballs] * geom.min_vox
        ci_flat = jnp.zeros(H * W * dl, jnp.float32)
        scatter_idx = jnp.where(cvalid, cc, H * W * dl)
        ci_flat = ci_flat.at[scatter_idx].set(cv, mode="drop")
        overflow = (nc > K) | (nw > witness_pad)
        return (
            ci_flat.reshape(H, W, dl),
            jax.lax.psum(jnp.sum(saturated), axis_name),
            jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0,
        )

    spec = P(None, None, axis_name)
    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, P(), P()),
        check_vma=False,
    ))
