"""Pallas CI head kernel: bit-equality against the XLA head phase.

The kernel (ventjax/ops/ci_pallas.py) computes the same f32 expressions as
ci_pairwise's head blocks; counts are exact small-integer float sums, so
results must be BIT-equal, wrap and pad border modes alike.  On CPU the
kernel runs in interpreter mode; the TPU path is exercised by bench runs.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ventjax.ops.ci_pairwise import (
    build_ci_pairwise_geometry, calculate_ci_pairwise,
)


@pytest.mark.parametrize("border", ["wrap", "pad"])
def test_pallas_head_bit_equal(border):
    shape = (32, 32, 8)
    geom = build_ci_pairwise_geometry((1.5, 1.5, 10.0), shape, 12, border)
    rng = np.random.default_rng(3)
    defect = (rng.random(shape) > 0.97).astype(np.float32)
    # clustered blob to exercise non-trivial crossings
    defect[8:14, 8:14, 2:5] = 1.0
    d = jnp.asarray(defect)

    ci_x, sat_x, ovf_x = calculate_ci_pairwise(d, geom, 256, use_pallas=False)
    ci_p, sat_p, ovf_p = calculate_ci_pairwise(d, geom, 256, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ci_x), np.asarray(ci_p))
    assert int(sat_x) == int(sat_p)
    assert bool(ovf_x) == bool(ovf_p)


def test_pallas_head_empty_and_full():
    shape = (32, 32, 8)
    geom = build_ci_pairwise_geometry((1.5, 1.5, 10.0), shape, 12, "wrap")
    empty = jnp.zeros(shape, jnp.float32)
    ci_x, _, _ = calculate_ci_pairwise(empty, geom, 256, use_pallas=False)
    ci_p, _, _ = calculate_ci_pairwise(empty, geom, 256, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ci_x), np.asarray(ci_p))
    assert float(jnp.sum(ci_p)) == 0.0

    full = jnp.ones(shape, jnp.float32)
    # 8192 defect voxels at K=8192: saturation path
    ci_xf, sat_xf, _ = calculate_ci_pairwise(full, geom, 8192,
                                             use_pallas=False)
    ci_pf, sat_pf, _ = calculate_ci_pairwise(full, geom, 8192,
                                             use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ci_xf), np.asarray(ci_pf))
    assert int(sat_xf) == int(sat_pf)


def test_densify_rank_matches_scatter():
    import numpy as np
    import jax.numpy as jnp
    from ventjax.ops.ci_pallas import densify_rank_pallas

    rng = np.random.default_rng(11)
    V, K = 8192, 512
    d01 = (rng.random(V) < 0.03).astype(np.int32)   # ~246 defects < K
    cv = rng.random(K).astype(np.float32)
    n = int(d01.sum())

    rank = jnp.cumsum(jnp.asarray(d01)) - 1
    dense = np.asarray(densify_rank_pallas(
        rank, jnp.asarray(d01), jnp.asarray(cv), K, interpret=True))

    ref = np.zeros(V, np.float32)
    ref[np.nonzero(d01)[0]] = cv[:n]
    assert (dense == ref).all()


def test_densify_rank_overflow_drops():
    import numpy as np
    import jax.numpy as jnp
    from ventjax.ops.ci_pallas import densify_rank_pallas

    rng = np.random.default_rng(12)
    V, K = 4096, 64
    d01 = (rng.random(V) < 0.05).astype(np.int32)   # ~205 defects > K
    cv = rng.random(K).astype(np.float32)

    rank = jnp.cumsum(jnp.asarray(d01)) - 1
    dense = np.asarray(densify_rank_pallas(
        rank, jnp.asarray(d01), jnp.asarray(cv), K, interpret=True))

    idx = np.nonzero(d01)[0]
    ref = np.zeros(V, np.float32)
    ref[idx[:K]] = cv            # voxels past K stay 0 (mode="drop" parity)
    assert (dense == ref).all()


def test_rank_pallas_exact():
    import numpy as np
    import jax.numpy as jnp
    from ventjax.ops.ci_pallas import rank_pallas

    d = (np.random.default_rng(13).random(16384) < 0.1).astype(np.int32)
    r = np.asarray(rank_pallas(jnp.asarray(d), interpret=True))
    assert (r == np.cumsum(d) - 1).all()


def test_ci_pairwise_pallas_densify_end_to_end():
    """pallas_densify=True must produce the identical CI map."""
    import numpy as np
    import jax.numpy as jnp
    from ventjax.ops import ci_pairwise as cp

    rng = np.random.default_rng(14)
    shape = (64, 64, 8)
    d = np.zeros(shape, np.float32)
    d[20:28, 30:38, 2:5] = (rng.random((8, 8, 3)) < 0.7)
    geom = cp.build_ci_pairwise_geometry(
        (1.5, 1.5, 10.0), shape, border_mode="wrap")
    a = cp.calculate_ci_pairwise(
        jnp.asarray(d), geom, max_defect_voxels=256, pallas_densify=True)
    b = cp.calculate_ci_pairwise(
        jnp.asarray(d), geom, max_defect_voxels=256, pallas_densify=False)
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()
    assert int(a[1]) == int(b[1])
