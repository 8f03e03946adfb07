"""On-chip fidelity check for the round-5 compact export pack.

Runs the cohort runner's compact-pack program AND the plain full-result
pipeline on the real device, rebuilds the dense channels host-side
(pipeline.cohort._rebuild_compact_pack), and asserts:

  - defect channel bit-equal,
  - CI channel bit-equal,
  - n4 bit-equal at EVERY masked voxel,
  - out-of-mask n4 within 1e-4 relative (host f64 lattice eval vs the
    device's Precision.HIGH bf16_3x einsum — wider than the CPU test's
    1e-5 bound because the device field itself is bf16-pass arithmetic;
    measured worst 2.4e-5 on this chip, 2026-08-20).

Exit 0 + one JSON line iff all hold.  Run after any change touching the
export pack, N4's lattice return, or the compaction (docs/PERF.md
measurement discipline).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VENTJAX_CACHE_DIR",
                      os.path.expanduser("~/.cache/ventjax/xla"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ventjax  # noqa: F401
    from ventjax.config import DEFAULT_CONFIG
    from ventjax.io.phantom import make_cohort
    from ventjax.pipeline.analyze import analyze_cohort, build_geometry
    from ventjax.pipeline.cohort import (
        _GeometryRunner, _densify_ci, _rebuild_compact_pack,
    )

    shape, vox = (128, 128, 16), (1.5, 1.5, 10.0)
    B = 4
    cfg = DEFAULT_CONFIG.replace(ci_max_defect_voxels=4096)
    hp, mask, _ = make_cohort(B, shape=shape, vox=vox, seed=9)

    # P must COVER the mask (the driver guarantees this pre-dispatch and
    # falls back to the dense pack when the cap is hit — dispatch() decides
    # compact only when pads[1] >= max_mask); a first version of this check
    # used P=32768 < the ~47k-voxel phantom masks and "found" 14k differing
    # voxels that were just the uncovered tail.
    runner = _GeometryRunner(shape, vox, cfg, mesh=None, batch_size=B)
    from ventjax.pipeline.cohort import _decode_host_pack

    pack = runner._fn(4096, 65536, compact=True)(
        jnp.asarray(hp), jnp.asarray(mask))
    host = _decode_host_pack(jax.tree_util.tree_map(np.asarray, pack),
                             runner.blob_schema(4096, 65536))

    cfgP = cfg.replace(n4_mask_pad=65536)
    geom = build_geometry(vox, shape, cfgP)
    res = jax.jit(lambda h, m: analyze_cohort(h, m, geom, cfgP))(
        jnp.asarray(hp), jnp.asarray(mask))
    res = jax.tree_util.tree_map(np.asarray, res)

    worst_off = 0.0
    for lane in range(B):
        lp = jax.tree_util.tree_map(lambda x: x[lane], host)
        rb = _rebuild_compact_pack(lp, hp[lane], mask[lane], cfgP)
        assert np.array_equal(_densify_ci(rb), res.ci_map[lane]), \
            f"lane {lane}: CI channel not bit-equal"
        assert np.array_equal(rb["defect"].astype(np.float32),
                              res.defect[lane]), \
            f"lane {lane}: defect channel not bit-equal"
        mf = mask[lane].reshape(-1) > 0
        got = rb["n4"].reshape(-1)
        want = res.n4[lane].reshape(-1)
        assert np.array_equal(got[mf], want[mf]), \
            f"lane {lane}: masked n4 not bit-equal " \
            f"({(got[mf] != want[mf]).sum()} of {mf.sum()} differ)"
        rel = float((np.abs(got[~mf] - want[~mf])
                     / np.maximum(np.abs(want[~mf]), 1e-6)).max())
        worst_off = max(worst_off, rel)
    assert worst_off < 1e-4, f"off-mask n4 rel dev {worst_off}"
    print(json.dumps({
        "check": "compact_pack_chip", "ok": True, "lanes": B,
        "worst_offmask_rel": worst_off,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
