"""Honest auto-mask evaluation: in-family vs out-of-family Dice + QC gate.

Evaluates the SHIPPED segmentation checkpoint (ventjax/models/seg_ckpt) on:
  - held-out draws of its own training generator (make_random_phantom) —
    the number the round-4 claims were based on;
  - the independently coded out-of-family generator (io/phantom_oof) —
    the number those claims were NOT based on (round-5 VERDICT item 4);
and reports, per family: Dice distribution, and how often the inference-
time QC gate (models.segmentation.mask_qc) flags the prediction — split by
whether the prediction was actually bad (Dice < 0.7), i.e. the gate's
catch rate and false-alarm rate.

Usage: python scripts/eval_automask_oof.py [--n 20] [--json out.json]
Results table lives in docs/AUTOMASK.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def dice(a, b) -> float:
    import numpy as np

    a = np.asarray(a) > 0
    b = np.asarray(b) > 0
    denom = a.sum() + b.sum()
    return float(2.0 * (a & b).sum() / denom) if denom else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--json", default=None)
    ap.add_argument("--shape", type=int, nargs=3, default=[128, 128, 16])
    args = ap.parse_args()
    shape = tuple(args.shape)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ventjax.io.phantom import make_random_phantom
    from ventjax.io.phantom_oof import make_oof_phantom
    from ventjax.models.segmentation import (
        SegUNet, default_checkpoint_path, load_checkpoint, mask_qc,
        predict_mask,
    )

    state = load_checkpoint(default_checkpoint_path())
    model = SegUNet(base=16)

    def eval_case(proton, true_mask, vox):
        pred = np.asarray(predict_mask(
            model, state.params, jnp.asarray(np.asarray(proton, np.float32))))
        qc = mask_qc(pred, vox)
        return dice(pred, true_mask), bool(qc["suspect"])

    out = {}
    for family, gen in (
        ("in_family", lambda s: (lambda ph: (ph.proton, ph.mask, ph.vox))(
            make_random_phantom(10_000 + s, shape=shape))),
        ("out_of_family", lambda s: make_oof_phantom(s, shape=shape)),
    ):
        dices, flags = [], []
        for s in range(args.n):
            proton, m, vox = gen(s)
            d, suspect = eval_case(proton, m, vox)
            dices.append(d)
            flags.append(suspect)
        dices = np.asarray(dices)
        flags = np.asarray(flags)
        bad = dices < 0.7
        out[family] = {
            "n": args.n,
            "dice_mean": round(float(dices.mean()), 3),
            "dice_min": round(float(dices.min()), 3),
            "dice_p50": round(float(np.median(dices)), 3),
            "frac_dice_ge_0.9": round(float((dices >= 0.9).mean()), 3),
            "frac_dice_lt_0.7": round(float(bad.mean()), 3),
            "qc_flag_rate": round(float(flags.mean()), 3),
            "qc_catch_rate_on_bad": (
                round(float(flags[bad].mean()), 3) if bad.any() else None),
            "qc_false_alarm_on_good": (
                round(float(flags[~bad].mean()), 3) if (~bad).any()
                else None),
        }
        print(json.dumps({family: out[family]}), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
