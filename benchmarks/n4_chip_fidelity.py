"""On-chip N4 fidelity check vs the float64 oracle.

The CPU test suite runs the Pallas kernels in interpreter mode, which
CANNOT see MXU input quantization: a plain f32 dot_general in a kernel
runs the MXU's bf16 single-pass path on real hardware.  Measured history
(2026-08, v5e): with plain-bf16 expectation/histogram dots the chip came
back at 1.4-1.9e-2 rel vs the oracle — 10x outside the 2e-3 envelope —
while CPU interpret showed 9e-4.  The double-bf16 split (hi/lo component
dots, ventjax/ops/n4_pallas.py) restores 3.5-4.5e-4 on chip, better than
the XLA path's 0.5-1.5e-3.

Run this on real hardware after ANY kernel-precision change:

    python benchmarks/n4_chip_fidelity.py

Passes iff every seed is inside the 2e-3 envelope for both engines.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENVELOPE = 2e-3


def main() -> int:
    import jax.numpy as jnp

    from ventjax.utils.profiling import enable_compile_cache

    enable_compile_cache()  # fidelity checks re-run often; skip recompiles

    from ventjax.io.phantom import make_phantom
    from ventjax.ops.n4 import n4_bias_correction
    from ventjax.oracle.n4_oracle import n4_bias_correction_oracle

    ok = True
    for seed in (7, 11, 23):
        ph = make_phantom(shape=(128, 128, 16), seed=seed)
        img = jnp.asarray(np.asarray(ph.hp, np.float32))
        mask = jnp.asarray(np.asarray(ph.mask, np.float32))
        oc = n4_bias_correction_oracle(
            np.asarray(ph.hp, np.float64), np.asarray(ph.mask))
        oc = np.asarray(oc[0] if isinstance(oc, tuple) else oc)
        m = np.asarray(ph.mask) > 0
        for tag, up in (("pallas", None), ("xla", False)):
            out = np.asarray(n4_bias_correction(
                img, mask, mask_pad=49152, use_pallas=up))
            rel = (np.abs(out - oc)[m] / (np.abs(oc)[m] + 1e-6)).max()
            status = "OK" if rel < ENVELOPE else "FAIL"
            ok &= rel < ENVELOPE
            print(f"seed {seed} {tag}: rel = {rel:.2e}  {status}",
                  flush=True)

    # Random NON-DEFAULT parameter sets ON CHIP (--params N): the CPU
    # param sweep (tests/test_n4_param_sweep.py) passes; prove the same
    # parameter surface on real hardware (oversized params auto-fall back
    # from the Pallas fit to the XLA fit — both paths end up covered).
    n_par = int(sys.argv[sys.argv.index("--params") + 1]) \
        if "--params" in sys.argv else 0
    for pseed in range(n_par):
        rng = np.random.default_rng(2000 + pseed)
        params = dict(
            fitting_levels=int(rng.integers(1, 4)),
            max_iters=int(rng.integers(5, 15)),
            convergence_threshold=float(rng.choice([0.001, 0.0005, 0.01])),
            bins=int(rng.choice([64, 128, 200, 256])),
            fwhm=float(rng.uniform(0.1, 0.3)),
            wiener_noise=float(rng.choice([0.01, 0.05])),
            control_points=int(rng.choice([4, 5])),
        )
        ph = make_phantom(shape=(64, 64, 8), seed=pseed)
        img = jnp.asarray(np.asarray(ph.hp, np.float32))
        mask = jnp.asarray(np.asarray(ph.mask, np.float32))
        oc = n4_bias_correction_oracle(
            np.asarray(ph.hp, np.float64), np.asarray(ph.mask), **params)
        oc = np.asarray(oc[0] if isinstance(oc, tuple) else oc)
        m = np.asarray(ph.mask) > 0
        out = np.asarray(n4_bias_correction(img, mask, mask_pad=16384,
                                            **params))
        rel = (np.abs(out - oc)[m] / (np.abs(oc)[m] + 1e-6)).max()
        status = "OK" if rel < 1e-2 else "FAIL"  # CPU-sweep budget
        ok &= rel < 1e-2
        print(f"params {pseed} {params}: rel = {rel:.2e}  {status}",
              flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
