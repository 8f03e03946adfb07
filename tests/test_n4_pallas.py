"""Pallas N4 fit kernels (ventjax/ops/n4_pallas.py) vs the XLA fit path.

Both paths quantize the MXU contraction operands to bf16 (f32
accumulation) — the same envelope the XLA fit has carried since the bf16
operand change — so the comparison is tolerance-based: both must stay
inside the float64 oracle's bf16 envelope (2e-3 rel on the corrected
image; the binding fidelity budget is downstream |dVDP| < 0.1pp, asserted
in tests/test_n4.py).  On CPU the kernels run in interpreter mode.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ventjax.io.phantom import make_cohort, make_phantom
from ventjax.ops.n4 import n4_bias_correction


def _rel(a, b, m):
    return (np.abs(a - b)[m] / (np.abs(b)[m] + 1e-6)).max()


def test_pallas_fit_matches_xla_and_oracle():
    ph = make_phantom(shape=(64, 64, 8), seed=7)
    img = jnp.asarray(np.asarray(ph.hp, np.float32))
    mask = jnp.asarray(np.asarray(ph.mask, np.float32))
    m = np.asarray(ph.mask) > 0

    out_x = np.asarray(n4_bias_correction(img, mask, use_pallas=False))
    out_p = np.asarray(n4_bias_correction(img, mask, use_pallas=True))
    assert _rel(out_p, out_x, m) < 2e-3  # bf16-vs-f32 fit envelope

    from ventjax.oracle.n4_oracle import n4_bias_correction_oracle

    oc = n4_bias_correction_oracle(
        np.asarray(ph.hp, np.float64), np.asarray(ph.mask)
    )
    oc = np.asarray(oc[0] if isinstance(oc, tuple) else oc)
    rel_p = _rel(out_p, oc, m)
    rel_x = _rel(out_x, oc, m)
    assert rel_p < 2e-3          # bf16-operand fit vs the f64 oracle
    assert rel_x < 2e-3


def test_pallas_fit_vmap_consistent():
    hp, mask, _ = make_cohort(2, shape=(64, 64, 8), vox=(1.5, 1.5, 10.0),
                              seed=0)
    hp = jnp.asarray(hp)
    mask = jnp.asarray(mask)
    f = lambda h, m: n4_bias_correction(h, m, use_pallas=True)
    batched = np.asarray(jax.jit(jax.vmap(f))(hp, mask))
    for i in range(2):
        single = np.asarray(f(hp[i], mask[i]))
        m = np.asarray(mask[i]) > 0
        # vmap reorders reductions (both fit paths show this); the result
        # must stay within the iteration's own convergence tolerance.
        assert _rel(batched[i], single, m) < 2e-3


def test_auto_mode_on_cpu_is_pure_xla():
    """use_pallas=None must not engage any kernel off-TPU: bitwise equal
    to use_pallas=False (guards the auto-gating in ops/n4.py)."""
    ph = make_phantom(shape=(64, 64, 8), seed=3)
    img = jnp.asarray(np.asarray(ph.hp, np.float32))
    mask = jnp.asarray(np.asarray(ph.mask, np.float32))
    auto = np.asarray(n4_bias_correction(img, mask))
    xla = np.asarray(n4_bias_correction(img, mask, use_pallas=False))
    assert (auto == xla).all()
