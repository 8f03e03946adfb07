"""Report layer: montage, screenshot, exports, filename grammar."""
import json
import os

import numpy as np
import pytest

from ventjax.io import dicom as dcm, nifti
from ventjax.io.phantom import make_phantom
from ventjax.report import export as rexport
from ventjax.report.montage import color_binary, make_montage, montage, montage_row
from ventjax.report.screenshot import screenshot


def test_montage_grid():
    vol = np.arange(2 * 3 * 6, dtype=float).reshape(2, 3, 6)
    m = montage(vol, grid_shape=(2, 3))
    assert m.shape == (4, 9)
    assert np.array_equal(m[:2, :3], vol[:, :, 0])
    assert np.array_equal(m[2:, 6:], vol[:, :, 5])


def test_montage_row_abs():
    vol = -np.ones((2, 2, 3))
    assert montage_row(vol).min() == 1.0


def test_make_montage_normalizes():
    vol = np.random.default_rng(0).random((4, 4, 5)) * 100
    m = make_montage(vol, n_cols=3)
    assert m.shape == (8, 12)
    assert 0 <= m.min() and m.max() == 1.0


def test_color_binary_red_overlay():
    a = np.ones((4, 4))
    b = np.zeros((4, 4))
    b[1, 1] = 1
    out = color_binary(a, b)
    assert tuple(out[1, 1]) == (255.0, 0.0, 0.0)


def test_filename_grammar():
    md = {"StudyDate": "20240301"}
    assert rexport.study_filename(
        "mepo", md, mepo_id="0039", visit=1, treatment="preAlb"
    ) == "Mepo0039_240301_visit1_preAlb"
    assert rexport.study_filename(
        "genxe", md, genxe_id="0012", treatment="postAlbuterol"
    ) == "Xe-0012_240301_postAlb"
    assert rexport.study_filename(
        "clinical", md, clinical_id="AB", visit=2, treatment="Albuterol"
    ) == "Clinical_AB_240301_visit2_Albuterol"


def test_export_nifti_channel_order(tmp_path):
    ph = make_phantom(shape=(16, 16, 4), seed=0)
    path = rexport.export_nifti(
        str(tmp_path), "t", ph.hp, ph.mask, proton=ph.proton,
        n4=ph.hp, defect=ph.true_defect, ci=None,
    )
    data, _ = nifti.load(path)
    assert data.shape == (16, 16, 4, 6)
    # fixed channel order [proton, HPvent, mask, N4, defect, CI]
    assert np.allclose(data[..., 0], ph.proton)
    assert np.allclose(data[..., 1], ph.hp)
    assert np.allclose(data[..., 2], ph.mask)
    assert np.allclose(data[..., 4], ph.true_defect)
    assert data[..., 5].sum() == 0


def test_export_dicom_multiframe(tmp_path):
    """forPACS=False: one multi-frame RGB DICOM (Vent_Analysis.py:392-404)."""
    ph = make_phantom(shape=(16, 16, 4), seed=0)
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    ds.SOPInstanceUID = dcm.generate_uid()
    path = rexport.export_dicom(
        ds, ph.hp, ph.true_defect, str(tmp_path),
        optional_text="t", for_pacs=False, vdp=5.0, patient_name="P",
    )
    back = dcm.read_file(path)
    arr = back.pixel_array
    assert arr.shape == (4, 16, 16, 3)  # slices first for DICOM export
    assert int(back.NumberOfFrames) == 4
    assert back.SOPInstanceUID == back.SeriesInstanceUID  # same fresh UID


def test_export_dicom_per_slice(tmp_path):
    ph = make_phantom(shape=(16, 16, 4), seed=0)
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    ds.SOPInstanceUID = dcm.generate_uid()
    out = rexport.export_dicom(
        ds, ph.hp, ph.true_defect, str(tmp_path),
        optional_text="t", for_pacs=True, vdp=5.0,
    )
    files = sorted(os.listdir(out))
    assert files == [f"dicom_{i}.dcm" for i in range(4)]
    d0 = dcm.read_file(os.path.join(out, "dicom_0.dcm"))
    arr = d0.pixel_array
    assert arr.shape == (16, 16, 3)
    # defect voxels painted pure red
    dv = np.argwhere(ph.true_defect[:, :, 0] == 1)
    if len(dv):
        r, c = dv[0]
        assert tuple(arr[r, c]) == (255, 0, 0)
    assert d0.SeriesDescription == "t - VDP: 5.0"
    # fresh per-slice SOP UIDs
    d1 = dcm.read_file(os.path.join(out, "dicom_1.dcm"))
    assert d0.SOPInstanceUID != d1.SOPInstanceUID
    assert d0.SeriesInstanceUID == d1.SeriesInstanceUID


def test_screenshot_writes_png(tmp_path):
    ph = make_phantom(shape=(32, 32, 4), seed=1)
    from ventjax.oracle import calculate_border
    path = screenshot(
        str(tmp_path / "s.png"),
        hp=ph.hp, mask=ph.mask, mask_border=calculate_border(ph.mask),
        n4=ph.hp, defect=ph.true_defect, ci_map=ph.true_defect * 12.0,
        proton=ph.proton,
        metadata={"PatientName": "X", "VDP": 5.2, "LungVolume": 0.1,
                  "DefectVolume": 0.01, "CI": 12.0},
        version="test",
    )
    from PIL import Image
    img = Image.open(path)
    assert img.size[0] > 0 and img.size[1] > 0


def test_screenshot_index0_only_mask_actionable_error(tmp_path):
    """A mask whose signal lives only at index 0 on an axis can never be
    kept by the reference's cropToData (index-0 quirk, Vent_Analysis.py:
    433-440); the montage fails with an actionable ValueError instead of
    an IndexError deep inside the crop (round-4 ADVICE)."""
    import pytest

    ph = make_phantom(shape=(32, 32, 4), seed=1)
    mask = np.zeros_like(ph.mask)
    mask[0, 10:20, 1:3] = 1.0  # rows: only index 0
    from ventjax.oracle import calculate_border
    with pytest.raises(ValueError, match="row 0"):
        screenshot(
            str(tmp_path / "s.png"), hp=ph.hp, mask=mask,
            mask_border=calculate_border(mask), n4=ph.hp,
            defect=ph.true_defect, ci_map=None, proton=None,
            metadata={}, version="test",
        )


def test_pickle_roundtrip(tmp_path):
    state = {"a": np.arange(5), "b": "hello", "bad": lambda x: x}
    p = rexport.save_pickle(state, str(tmp_path / "s.pkl"))
    back = rexport.load_pickle(p)
    assert "bad" not in back  # non-picklable skipped like the reference
    assert np.array_equal(back["a"], state["a"])


def test_signal_histogram(tmp_path, rng):
    """The "show histogram?" roadmap item (reference README.md:26): a valid
    PNG whose x-normalization uses the exact floor-index percentile of the
    linear-binning method."""
    from ventjax.report.histogram import signal_histogram

    sig = rng.gamma(4.0, 200.0, (48, 40, 6))
    mask = np.zeros_like(sig)
    mask[10:38, 8:32, 1:5] = 1
    p = str(tmp_path / "hist.png")
    out = signal_histogram(p, sig, mask, vdp_lb=7.3)
    assert out == p and os.path.getsize(p) > 5000
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    with pytest.raises(ValueError, match="empty mask"):
        signal_histogram(str(tmp_path / "e.png"), sig, np.zeros_like(sig))


def test_signal_histogram_pil_fallback(tmp_path, rng, monkeypatch):
    """Without matplotlib (not a declared runtime dep) the histogram must
    still render — via the PIL fallback — instead of crashing the export
    tail of an analyze run (review finding)."""
    import builtins

    from ventjax.report.histogram import signal_histogram

    real_import = builtins.__import__

    def no_mpl(name, *a, **k):
        if name == "matplotlib" or name.startswith("matplotlib."):
            raise ImportError("matplotlib disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_mpl)
    sig = rng.gamma(4.0, 200.0, (48, 40, 6))
    mask = np.zeros_like(sig)
    mask[10:38, 8:32, 1:5] = 1
    p = str(tmp_path / "hist_pil.png")
    out = signal_histogram(p, sig, mask, vdp_lb=7.3)
    assert out == p and os.path.getsize(p) > 2000
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_compat_export_histogram(tmp_path):
    from ventjax.compat import Vent_Analysis
    from ventjax.io.phantom import make_phantom

    ph = make_phantom(shape=(64, 64, 8), seed=4)
    v = Vent_Analysis(xenon_array=ph.hp, mask_array=ph.mask)
    v.vox = [1.5, 1.5, 10.0]
    v.calculate_VDP()
    p = v.exportHistogram(str(tmp_path / "h.png"))
    assert os.path.getsize(p) > 5000
