"""Validated --auto-mask capability (round-2 VERDICT item 5).

The shipped checkpoint (ventjax/models/seg_ckpt, trained by
`python -m ventjax train-seg` on the domain-randomized phantom generator)
must generalize across the randomization — geometry, contrast, noise,
bias, partial-volume edges, unseen shapes — at Dice >= 0.9 on held-out
seeds, and an --auto-mask analysis must land near the hand-mask analysis
of the same study.  Reference context: automatic proton segmentation is
the reference's roadmap item (README.md:22-30).
"""
import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ventjax.io.phantom import make_random_phantom
from ventjax.models.segmentation import (
    SegUNet,
    default_checkpoint_path,
    load_checkpoint,
    predict_mask,
)

CKPT = default_checkpoint_path()
pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT),
    reason="shipped seg checkpoint missing (run scripts/train_seg_artifact)",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = SegUNet(base=16)
    state = load_checkpoint(CKPT)
    return model, state.params


def _dice(pred, true):
    inter = float((pred * true).sum())
    return 2 * inter / max(float(pred.sum() + true.sum()), 1.0)


def test_heldout_dice_across_randomization(model_and_params):
    """Held-out seeds (disjoint from training), random shapes/slice counts
    included: every study >= 0.9 Dice, mean >= 0.93."""
    model, params = model_and_params
    scores = []
    for seed in range(10_000, 10_024):
        ph = make_random_phantom(seed)  # random H/W/D too
        pred = np.asarray(predict_mask(
            model, params, jnp.asarray(ph.proton)
        ))
        scores.append(_dice(pred, ph.mask))
    scores = np.asarray(scores)
    assert scores.min() >= 0.9, scores.round(3).tolist()
    assert scores.mean() >= 0.93, scores.mean()


def test_automask_analysis_close_to_hand_mask(tmp_path, model_and_params,
                                              capsys):
    """End-to-end: --auto-mask metrics within tolerance of the hand-mask
    run on the same study (the VERDICT's acceptance shape)."""
    from ventjax.cli import main
    from ventjax.io.phantom import make_phantom
    from ventjax.io.synthetic import write_study

    # The fixed-generator phantom: plants real defects (the randomized
    # generator is defect-free by design) and its proton contrast is inside
    # the randomized training distribution.
    ph = make_phantom(shape=(128, 128, 16), vox=(1.5, 1.5, 10.0), seed=77)
    root = str(tmp_path / "study")
    write_study(root, phantom=ph)

    def run(extra, out):
        rc = main(["analyze", "--xenon", f"{root}/xenon.dcm",
                   "--out", out, "--max-defect", "16384"] + extra)
        assert rc == 0
        return json.loads(capsys.readouterr().out)

    mh = run(["--mask", f"{root}/mask"], str(tmp_path / "hand"))
    ma = run(["--proton", f"{root}/proton.dcm", "--auto-mask"],
             str(tmp_path / "auto"))
    assert abs(mh["VDP"] - ma["VDP"]) < 2.0, (mh["VDP"], ma["VDP"])
    assert abs(mh["LungVolume"] - ma["LungVolume"]) \
        / max(mh["LungVolume"], 1e-9) < 0.12


def test_mask_qc_passes_healthy_flags_corrupt(model_and_params):
    """The inference-time QC gate (round-5 VERDICT item 4): healthy
    predictions on in-family protons pass; the prediction on a deliberately
    corrupted proton (pure noise — no anatomy to segment) is flagged
    suspect; hand-built pathological masks are flagged too."""
    from ventjax.models.segmentation import mask_qc

    model, params = model_and_params
    vox = (1.5, 1.5, 10.0)
    ph = make_random_phantom(10_050, shape=(128, 128, 16))
    pred = np.asarray(predict_mask(model, params, jnp.asarray(ph.proton)))
    qc = mask_qc(pred, ph.vox)
    assert not qc["suspect"], qc["reasons"]

    rng = np.random.default_rng(5)
    noise_proton = rng.normal(500.0, 200.0, (128, 128, 16)).astype(np.float32)
    pred_bad = np.asarray(predict_mask(model, params,
                                       jnp.asarray(noise_proton)))
    qc_bad = mask_qc(pred_bad, vox)
    assert qc_bad["suspect"], (
        "a mask predicted from pure noise passed every plausibility check: "
        f"{qc_bad['stats']}")

    # direct pathological shapes
    speckle = (rng.random((128, 128, 16)) < 0.05).astype(np.float32)
    assert mask_qc(speckle, vox)["suspect"]
    empty = np.zeros((128, 128, 16), np.float32)
    assert mask_qc(empty, vox)["suspect"]
    one_sided = np.zeros((128, 128, 16), np.float32)
    one_sided[30:90, 8:40, 4:12] = 1.0  # plausible volume, all on one side
    assert mask_qc(one_sided, vox)["suspect"]
    clipped = np.zeros((128, 128, 16), np.float32)
    clipped[:, :30, :] = 1.0  # slab glued to the in-plane FOV edge
    assert mask_qc(clipped, vox)["suspect"]


def test_mask_qc_surfaces_in_cli_metadata(tmp_path, capsys):
    """--auto-mask attaches automask_suspect/automask_qc to the exported
    metadata (warn, never fail)."""
    from ventjax.cli import main
    from ventjax.io.phantom import make_phantom
    from ventjax.io.synthetic import write_study

    ph = make_phantom(shape=(128, 128, 16), vox=(1.5, 1.5, 10.0), seed=78)
    root = str(tmp_path / "study")
    write_study(root, phantom=ph)
    rc = main(["analyze", "--xenon", f"{root}/xenon.dcm",
               "--proton", f"{root}/proton.dcm", "--auto-mask",
               "--out", str(tmp_path / "out"), "--max-defect", "16384"])
    assert rc == 0
    md = json.loads(capsys.readouterr().out)
    assert "automask_suspect" in md
    assert md["automask_suspect"] in (False, True)
    assert isinstance(md.get("automask_qc", ""), str)
