"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4 item 3)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ventjax.config import DEFAULT_CONFIG
from ventjax.dist import make_batch_mesh, shard_cohort_fn
from ventjax.io.phantom import make_cohort
from ventjax.pipeline import analyze_cohort
from ventjax.pipeline.analyze import build_geometry

CFG = DEFAULT_CONFIG.replace(
    ci_max_defect_voxels=256, ci_rmax=12, n4_fitting_levels=2, n4_max_iters=5
)
SHAPE = (32, 32, 8)
VOX = (1.5, 1.5, 10.0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharded_cohort_bit_identical_to_unsharded():
    geom = build_geometry(VOX, SHAPE, CFG)
    mesh = make_batch_mesh(8)
    cohort_fn = lambda h, m: analyze_cohort(h, m, geom, CFG)
    sharded = jax.jit(shard_cohort_fn(cohort_fn, mesh))
    hp, mask, _ = make_cohort(16, shape=SHAPE, vox=VOX, seed=0)
    rs = sharded(jnp.asarray(hp), jnp.asarray(mask))
    ru = jax.jit(cohort_fn)(jnp.asarray(hp), jnp.asarray(mask))
    assert np.array_equal(np.asarray(rs.ci_map), np.asarray(ru.ci_map))
    assert np.array_equal(np.asarray(rs.metrics.vdp), np.asarray(ru.metrics.vdp))
    # outputs actually sharded over the batch axis
    shard_devs = {s.device for s in rs.ci_map.addressable_shards}
    assert len(shard_devs) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_mesh_subset():
    mesh = make_batch_mesh(4)
    assert mesh.devices.shape == (4,)
    assert mesh.axis_names == ("batch",)


def test_spatial_sharded_pipeline_matches_unsharded():
    """The analysis pipeline under a ("batch","space") mesh with the volume
    H axis spatially sharded (sharding annotations; XLA inserts the
    collectives) matches the unsharded run (SURVEY §2.3 TP row)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ventjax.config import DEFAULT_CONFIG
    from ventjax.dist import make_batch_space_mesh, spatial_shard_fn
    from ventjax.io.phantom import make_cohort
    from ventjax.pipeline import analyze_cohort
    from ventjax.pipeline.analyze import build_geometry

    shape = (32, 32, 8)
    vox = (1.5, 1.5, 10.0)
    cfg = DEFAULT_CONFIG.replace(
        ci_max_defect_voxels=256, ci_rmax=12,
        n4_fitting_levels=2, n4_max_iters=10,
    )
    geom = build_geometry(vox, shape, cfg)
    hp, mask, _ = make_cohort(4, shape=shape, vox=vox, seed=12)
    hp = jnp.asarray(hp)
    mask = jnp.asarray(mask)

    fn = lambda h, m: analyze_cohort(h, m, geom, cfg)
    mesh = make_batch_space_mesh(2, 4)
    sharded = spatial_shard_fn(fn, mesh)
    res_s = sharded(hp, mask)
    res_u = jax.jit(fn)(hp, mask)
    np.testing.assert_allclose(
        np.asarray(res_s.metrics.vdp), np.asarray(res_u.metrics.vdp),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(res_s.ci_map), np.asarray(res_u.ci_map), atol=1e-6,
    )
    assert np.all(np.isfinite(np.asarray(res_s.metrics.vdp)))
