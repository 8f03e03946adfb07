"""Compat facade: the reference's public API end to end on disk studies."""
import json
import os
import pickle

import numpy as np
import pytest

from ventjax.compat import Vent_Analysis, extract_attributes
from ventjax.compat import ci_module
from ventjax.io.synthetic import write_study
from ventjax.oracle.ci_oracle import calculate_ci_oracle


@pytest.fixture(scope="module")
def study(tmp_path_factory):
    root = tmp_path_factory.mktemp("compat_study")
    ph = write_study(str(root), shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=6)
    return str(root), ph


@pytest.fixture(scope="module")
def analyzed(study):
    root, ph = study
    v = Vent_Analysis(
        xenon_path=os.path.join(root, "xenon.dcm"),
        mask_path=os.path.join(root, "mask"),
        proton_path=os.path.join(root, "proton.dcm"),
    )
    v.calculate_VDP()
    v.calculate_CI()
    return v, ph


def test_constructor_and_header(analyzed):
    v, ph = analyzed
    assert v.vox == [1.5, 1.5, 10.0]
    assert v.HPvent.shape == ph.hp.shape
    assert np.array_equal(v.mask, ph.mask)
    assert str(v.metadata["PatientName"]) == "VENTJAX^PHANTOM"
    want_lv = np.sum(ph.mask == 1) * np.prod(np.divide(v.vox, 10)) / 1000
    assert v.metadata["LungVolume"] == pytest.approx(want_lv)
    # roadmap "more header info into metadata" (reference README.md:25):
    # acquisition context lands in metadata when the header carries it
    assert v.metadata["Manufacturer"] == "SIEMENS"
    assert v.metadata["ProtocolName"] == "fl_gre_vent"
    assert float(v.metadata["RepetitionTime"]) == 15.0
    assert float(v.metadata["FlipAngle"]) == 10.0
    # ...and stays absent (not '') when the header lacks it — only the 23
    # reference keys get the ''-on-missing behavior
    vv = Vent_Analysis(xenon_array=np.zeros((4, 4, 2)),
                       mask_array=np.ones((4, 4, 2)))
    assert "Manufacturer" not in vv.metadata
    assert vv.metadata["PatientName"] == ""


def test_calculate_vdp_fills_state(analyzed):
    v, ph = analyzed
    for key in ("SNR", "VDP", "VDP_lb", "VDP_km", "DefectVolume"):
        assert isinstance(v.metadata[key], float)
    planted = 100 * ph.true_defect.sum() / ph.mask.sum()
    assert v.metadata["VDP"] == pytest.approx(planted, abs=3.0)
    assert v.N4HPvent.shape == ph.hp.shape
    assert set(np.unique(v.defectArray)).issubset({0.0, 1.0})
    assert v.defectArrayLB.max() <= 6


def test_calculate_ci_matches_oracle(analyzed):
    v, _ = analyzed
    want = calculate_ci_oracle(v.defectArray, vox=v.vox, rmax=50, saturate=True)
    assert np.abs(v.CIarray - want).max() < 2e-5
    cvlist = np.sort(want[v.defectArray > 0])
    assert float(v.metadata["CI"]) == pytest.approx(
        cvlist[int(0.95 * len(cvlist))], abs=2e-5
    )


def test_ci_module_compat_surface():
    defect = np.zeros((24, 20, 4))
    defect[4:9, 5:10, 1:3] = 1
    got = ci_module.calculate_CI(defect, vox=[1.5, 1.5, 10.0], Rmax=50)
    want = calculate_ci_oracle(defect, vox=[1.5, 1.5, 10.0], rmax=50)
    assert np.abs(got - want).max() < 2e-5
    # helpers
    assert ci_module.multi_which(defect).shape[1] == 3
    px = ci_module.getSpherePix(np.asarray([1.5, 1.5, 10.0]), 50)
    assert px.shape == (78659, 4)
    assert ci_module.px2vec(2, 3, 4, (10, 10, 4)) == 2 + 2 * 10 + 3 * 100
    assert ci_module.vec2px(ci_module.px2vec(2, 3, 4, (10, 10, 4)),
                            (10, 10, 4)) == (2, 3, 4)


def test_edit_mask_method(study):
    """editMask (the reference's roadmap item, README.md:28) edits the mask
    in place and recomputes LungVolume + border."""
    root, ph = study
    v = Vent_Analysis(
        xenon_path=os.path.join(root, "xenon.dcm"),
        mask_path=os.path.join(root, "mask"),
    )
    from ventjax.ops import morphology as mo

    before_lv = v.metadata["LungVolume"]
    want = np.asarray(mo.edit_mask(ph.mask.astype(np.float32), "dilate:1"))
    got = v.editMask("dilate:1")
    assert np.array_equal(got, want)
    assert np.array_equal(v.mask, want)
    assert v.metadata["LungVolume"] > before_lv
    want_lv = np.sum(v.mask == 1) * np.prod(np.divide(v.vox, 10)) / 1000
    assert v.metadata["LungVolume"] == pytest.approx(want_lv)
    assert np.array_equal(v.mask_border, v.calculateBorder(v.mask))
    v.calculate_VDP()  # analysis still runs on the edited mask
    assert 0 <= float(v.metadata["VDP"]) <= 100


def test_edit_mask_without_vox():
    """Array-ctor studies never set vox (it stays the '' sentinel);
    editMask must edit the mask and skip the LungVolume recompute rather
    than crash on np.divide('', 10) (review finding)."""
    v = Vent_Analysis(xenon_array=np.zeros((8, 8, 2)),
                      mask_array=np.ones((8, 8, 2)))
    got = v.editMask("erode:1")
    assert got.shape == (8, 8, 2)
    assert v.metadata["LungVolume"] == ""  # untouched sentinel


def test_ci_module_calculate_cv_matches_map():
    """calculate_CV (the reference's per-voxel entry point, CI.py:87-105)
    must reproduce the engine-computed CI map voxel-for-voxel when driven
    exactly the way the reference's thread pool drives it, including the
    min(vox) mm scaling applied by the caller (CI.py:142)."""
    vox = [1.5, 1.5, 10.0]
    defect = np.zeros((24, 20, 4))
    defect[4:9, 5:10, 1:3] = 1
    defect[15:18, 2:5, 0] = 1  # second cluster touching a border
    sphere_px = ci_module.getSpherePix(np.asarray(vox), 50)
    def_list = ci_module.multi_which(defect)
    def_vec = ci_module.px2vec(
        def_list[:, 0], def_list[:, 1], def_list[:, 2], defect.shape)
    built = np.zeros_like(defect, dtype=np.float64)
    for k in range(def_list.shape[0]):
        cv = ci_module.calculate_CV(defect.shape, def_list[k], def_vec,
                                    sphere_px)
        built[int(cv[0]), int(cv[1]), int(cv[2])] = cv[3] * np.min(vox)
    want = ci_module.calculate_CI(defect, vox=vox, Rmax=50)
    assert np.abs(built - want).max() < 2e-5

    # a volume that contains the full Rmax sphere and is all defect: every
    # prefix stays 100% defect, so the reference raises ValueError
    # (CI.py:101-104) — the volume must be big enough that border aliasing
    # never drains the fraction (sphere reach: +-50 in-plane, +-8 slices
    # at vox [1.5,1.5,10])
    solid_shape = (120, 120, 20)
    center = np.array([60, 60, 10])
    slist = np.argwhere(np.ones(solid_shape))
    svec = ci_module.px2vec(slist[:, 0], slist[:, 1], slist[:, 2],
                            solid_shape)
    with pytest.raises(ValueError):
        ci_module.calculate_CV(solid_shape, center, svec, sphere_px)


def test_exports_and_pickle_roundtrip(analyzed, tmp_path):
    v, _ = analyzed
    out = str(tmp_path)
    v.metadata["analysisUser"] = "tester"
    nii = v.exportNifti(out, "t")
    assert os.path.exists(nii)
    jpath = v.dicom_to_json(v.ds, os.path.join(out, "h.json"))
    assert "PatientName" in json.load(open(jpath))
    v.screenShot(os.path.join(out, "s.png"))
    assert os.path.exists(os.path.join(out, "s.png"))
    dpath = v.exportDICOM(v.ds, out, optional_text="t", forPACS=True)
    assert len(os.listdir(dpath)) == v.HPvent.shape[2]
    ppath = v.pickleMe(os.path.join(out, "v.pkl"))
    v2 = Vent_Analysis(pickle_path=ppath)
    assert v2.metadata["VDP"] == v.metadata["VDP"]
    assert np.array_equal(v2.defectArray, v.defectArray)
    assert v2.version == v.version


def test_snr_signature_quirk(analyzed):
    """calculate_SNR(A, mask) binds mask to FOVbuffer, which is overwritten
    to 20 — same result as calling with no second arg (reference line 343)."""
    v, _ = analyzed
    a = v.HPvent
    assert v.calculate_SNR(a, v.mask) == v.calculate_SNR(a)


def test_snr_manual_noise_raises(analyzed):
    """manualNoise=True is the reference's commented-out dead branch
    (Vent_Analysis.py:352-355 would NameError on unbound `noise`); the
    facade raises a documented NotImplementedError instead of silently
    computing auto-noise (round-4 VERDICT weak #5)."""
    v, _ = analyzed
    with pytest.raises(NotImplementedError, match="manualNoise"):
        v.calculate_SNR(v.HPvent, manualNoise=True)


def test_extract_attributes():
    d = {"a": 1, "b": {"c": 2, "d": {"e": 3}}}
    assert extract_attributes(d) == {"a": 1, "b_c": 2, "b_d_e": 3}


def test_process_raw_twix(tmp_path, rng):
    from ventjax.io.twix import write_synthetic_twix
    k = (rng.normal(size=(16, 12, 2))
         + 1j * rng.normal(size=(16, 12, 2))).astype(np.complex64)
    p = str(tmp_path / "m.dat")
    write_synthetic_twix(p, k, protocol_name="vent_gre")
    v = Vent_Analysis(xenon_array=np.zeros((4, 4, 2)),
                      mask_array=np.ones((4, 4, 2)))
    v.vox = [1.0, 1.0, 1.0]
    img = v.process_RAW(p)
    assert img.shape == (12, 16, 2)
    assert v.metadata["TWIXprotocolName"] == "vent_gre"
    # roadmap "more header info into metadata" (reference README.md:25)
    assert v.metadata["TWIXRepetitionTime"] == 15.0
    assert v.metadata["TWIXFlipAngle"] == 10.0
    assert v.metadata["TWIXSequenceFileName"] == "%SiemensSeq%\\fl_gre"
    want = np.transpose(
        np.fft.fftshift(np.fft.fft2(np.fft.fftshift(
            k.astype(np.complex128), axes=(0, 1)), axes=(0, 1)), axes=(0, 1)),
        (1, 0, 2))[:, ::-1, :]
    assert np.abs(img - want).max() / np.abs(want).max() < 1e-5


def test_pane_images_updateimages_parity(study):
    """The GUI's updateImages panes as arrays (Vent_Analysis.py:722-759):
    populated panes after VDP+CI, black 3x3 placeholders before."""
    root, _ = study
    v = Vent_Analysis(xenon_path=f"{root}/xenon.dcm",
                      mask_path=f"{root}/mask")
    panes = v.pane_images()
    assert panes["raw"].shape[2] == 3 and panes["raw"].shape[0] > 3
    assert panes["n4"].shape == (3, 3, 3)      # not computed yet
    assert panes["ci"].shape == (3, 3, 3)

    v.config = v.config.replace(ci_max_defect_voxels=1024)
    v.calculate_VDP()
    v.calculate_CI()
    panes = v.pane_images()
    H, W, D = np.asarray(v.HPvent).shape
    for key in ("raw", "n4", "defect", "ci"):
        assert panes[key].shape == (H, W * D, 3), key
    # defect overlay paints pure red where defect is set
    defect_m = v.array3D_to_montage2D(v.defectArray) > 0
    assert np.all(panes["defect"][defect_m, 1] == 0)
    assert np.all(panes["defect"][defect_m, 0] > 0)
