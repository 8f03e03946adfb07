"""Device/oracle N4 vs real SimpleITK golden outputs (when available).

SimpleITK cannot be installed in this environment, so the goldens are
generated offline with scripts/make_n4_goldens.py and checked in at
tests/goldens/n4_itk.npz.  Until that file exists these tests skip; the
written fidelity record is docs/N4_ITK_AUDIT.md.
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "n4_itk.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="ITK goldens not generated (needs SimpleITK offline; see "
    "scripts/make_n4_goldens.py and docs/N4_ITK_AUDIT.md)",
)


def _cases():
    data = np.load(GOLDEN)
    i = 0
    while f"g{i}_meta" in data:
        meta = data[f"g{i}_meta"]
        shape = tuple(int(x) for x in meta[:3])
        vox = tuple(float(x) for x in meta[3:6])
        seed = int(meta[6])
        yield shape, vox, seed, data[f"g{i}_corrected"]
        i += 1


def test_oracle_matches_itk_goldens():
    from ventjax.io.phantom import make_phantom
    from ventjax.oracle.n4_oracle import n4_bias_correction_oracle
    from ventjax.oracle.reference import vdp_mean_anchored as vdp_oracle

    for shape, vox, seed, itk_corrected in _cases():
        ph = make_phantom(shape=shape, vox=vox, seed=seed)
        ours = n4_bias_correction_oracle(ph.hp, ph.mask)
        m = ph.mask > 0
        corr = np.corrcoef(ours[m], itk_corrected[m])[0, 1]
        assert corr > 0.999, (shape, vox, corr)
        _, vdp_itk = vdp_oracle(itk_corrected, ph.mask)
        _, vdp_ours = vdp_oracle(ours, ph.mask)
        assert abs(vdp_itk - vdp_ours) < 0.1, (shape, vox)


def test_device_matches_itk_goldens():
    import jax.numpy as jnp

    from ventjax.io.phantom import make_phantom
    from ventjax.ops.n4 import n4_bias_correction
    from ventjax.oracle.reference import vdp_mean_anchored as vdp_oracle

    for shape, vox, seed, itk_corrected in _cases():
        ph = make_phantom(shape=shape, vox=vox, seed=seed)
        ours = np.asarray(n4_bias_correction(
            jnp.asarray(ph.hp.astype(np.float32)), jnp.asarray(ph.mask)
        ))
        m = ph.mask > 0
        corr = np.corrcoef(ours[m], itk_corrected[m])[0, 1]
        assert corr > 0.999, (shape, vox, corr)
        _, vdp_itk = vdp_oracle(itk_corrected, ph.mask)
        _, vdp_ours = vdp_oracle(ours.astype(np.float64), ph.mask)
        assert abs(vdp_itk - vdp_ours) < 0.1, (shape, vox)
