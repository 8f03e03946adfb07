"""On-chip CI fidelity check vs the reference-exact oracle.

Companion to n4_chip_fidelity.py: the CPU test suite proves the pairwise
CI engine voxel-exact (to f32 radii rounding) against the oracle, but on
CPU — and the N4 kernels taught us real-chip arithmetic can silently
diverge (MXU bf16 input quantization of f32 dots, invisible to interpret
mode).  The CI engines use VPU compares/sums only (no value-carrying
dots), so they SHOULD be exact on chip; this script proves it, for both
the XLA head and the Pallas head kernel, at small and large defect pads.

    python benchmarks/ci_chip_fidelity.py

Passes iff every configuration matches the oracle map to < 2e-5 mm with
identical nonzero support.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (128, 128, 16)
VOX = (1.5, 1.5, 10.0)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ventjax.utils.profiling import enable_compile_cache

    enable_compile_cache()  # fidelity checks re-run often; skip recompiles

    from ventjax.io.phantom import make_phantom
    from ventjax.ops.ci_pairwise import (
        build_ci_pairwise_geometry, calculate_ci_pairwise)
    from ventjax.oracle.ci_oracle import calculate_ci_oracle

    geom = build_ci_pairwise_geometry(VOX, SHAPE, border_mode="wrap")
    ok = True
    for seed in (7, 23):
        ph = make_phantom(shape=SHAPE, seed=seed)
        # mean-anchored-style defect from the phantom's planted truth
        defect = np.asarray(ph.true_defect, np.float32)
        want = calculate_ci_oracle(defect, vox=VOX, rmax=50)
        n_def = int((defect != 0).sum())
        for tag, kwargs in (
            ("xla-head K=2048", dict(max_defect_voxels=2048,
                                     use_pallas=False)),
            ("pallas-head K=2048", dict(max_defect_voxels=2048,
                                        use_pallas=True)),
            ("pallas-densify", dict(max_defect_voxels=2048,
                                    pallas_densify=True)),
        ):
            fn = jax.jit(lambda d, kw=kwargs: calculate_ci_pairwise(
                d, geom, **kw))
            ci, nsat, ovf = fn(jnp.asarray(defect))
            ci = np.asarray(ci)
            support = bool(np.array_equal(ci != 0, want != 0))
            err = float(np.abs(ci - want).max())
            good = support and err < 2e-5 and not bool(ovf)
            ok &= good
            print(f"seed {seed} {tag}: n_def={n_def} support={support} "
                  f"max|d|={err:.2e} {'OK' if good else 'FAIL'}",
                  flush=True)

    # Random clinical geometries (same draw as tests/test_ci_geometry_sweep)
    # ON CHIP: the geometry-dependent f32 radius tables and alias combos
    # must survive real-hardware arithmetic, not just the CPU backend.
    n_geo = int(sys.argv[sys.argv.index("--geometries") + 1]) \
        if "--geometries" in sys.argv else 0
    for gseed in range(n_geo):
        rng = np.random.default_rng(1000 + gseed)
        vox = (round(float(rng.uniform(0.8, 4.0)), 3),
               round(float(rng.uniform(0.8, 4.0)), 3),
               round(float(rng.uniform(5.0, 15.0)), 3))
        shape = (16, 16, 4)
        defect = (rng.random(shape) < 0.04).astype(np.float32)
        if defect.sum() == 0:
            defect[8, 8, 2] = 1.0
        g = build_ci_pairwise_geometry(vox, shape, 12, "wrap")
        fn = jax.jit(lambda d, gg=g: calculate_ci_pairwise(d, gg, 512))
        ci, _, ovf = fn(jnp.asarray(defect))
        ci = np.asarray(ci)
        want = calculate_ci_oracle(defect, vox=vox, rmax=12, saturate=True)
        err = float(np.abs(ci - want).max())
        good = err < 2e-5 and not bool(np.asarray(ovf))
        ok &= good
        print(f"geometry {gseed} vox={vox}: max|d|={err:.2e} "
              f"{'OK' if good else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
