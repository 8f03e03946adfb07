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
