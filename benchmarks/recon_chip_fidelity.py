"""On-chip TWIX-recon fidelity check vs the float64 np.fft oracle.

Companion to n4_chip_fidelity.py / ci_chip_fidelity.py: the recon is a
centered DFT expressed as MXU matmuls on split real/imag planes
(ops/fft_recon.py — this TPU backend has no complex support at all),
and the MXU's default single-pass path quantizes f32 operands to bf16
(the class of bug the N4 kernels hit, invisible to the CPU suite).  The
recon einsums run at precision=HIGHEST; this script proves that holds
on the real chip against the reference recipe
(Vent_Analysis.py:537-540) computed in float64 on host.

    python benchmarks/recon_chip_fidelity.py

Passes iff single-coil and RSS multi-coil recons match the float64
oracle to < 1e-5 relative at every size tried (measured 2026-08:
~1.2e-7; a silent bf16 dot shows up at ~1e-2).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1e-5


def _oracle_single(k: np.ndarray) -> np.ndarray:
    return np.transpose(
        np.fft.fftshift(np.fft.fft2(np.fft.fftshift(
            k.astype(np.complex128), axes=(0, 1)), axes=(0, 1)),
            axes=(0, 1)),
        (1, 0, 2))[:, ::-1, :]


def main() -> int:
    import jax

    from ventjax.utils.profiling import enable_compile_cache

    enable_compile_cache()  # fidelity checks re-run often; skip recompiles

    from ventjax.ops.fft_recon import (
        recon_2d_multislice, recon_2d_multislice_rss,
    )

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(17)
    ok = True
    for (h, w, s) in [(16, 12, 2), (128, 128, 16), (128, 100, 3)]:
        k = (rng.normal(size=(h, w, s))
             + 1j * rng.normal(size=(h, w, s))).astype(np.complex64)
        err = (np.abs(recon_2d_multislice(k) - _oracle_single(k)).max()
               / np.abs(_oracle_single(k)).max())
        good = err < TOL
        ok &= good
        print(f"single {h}x{w}x{s}: rel err {err:.3e} "
              f"{'OK' if good else 'FAIL'}")
    kmc = (rng.normal(size=(4, 128, 128, 16))
           + 1j * rng.normal(size=(4, 128, 128, 16))).astype(np.complex64)
    want = np.sqrt(sum(np.abs(_oracle_single(kmc[c])) ** 2
                       for c in range(kmc.shape[0])))
    err = np.abs(recon_2d_multislice_rss(kmc) - want).max() / want.max()
    good = err < TOL
    ok &= good
    print(f"rss 4x128x128x16: rel err {err:.3e} {'OK' if good else 'FAIL'}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
