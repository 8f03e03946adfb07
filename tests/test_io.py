"""I/O codecs: DICOM read/write, NIfTI, TWIX, synthetic studies."""
import os

import numpy as np
import pytest

from ventjax.io import dicom as dcm
from ventjax.io import nifti
from ventjax.io.phantom import make_phantom
from ventjax.io.synthetic import write_mask_folder, write_multiframe, write_study
from ventjax.io.twix import read_twix, write_synthetic_twix


@pytest.fixture(scope="module")
def study(tmp_path_factory):
    root = tmp_path_factory.mktemp("study")
    ph = write_study(str(root), shape=(32, 32, 4), vox=(1.5, 1.5, 10.0), seed=3)
    return str(root), ph


def test_multiframe_roundtrip(study):
    root, ph = study
    ds, vol = dcm.open_single_dicom(os.path.join(root, "xenon.dcm"))
    assert vol.shape == ph.hp.shape
    assert np.array_equal(vol, np.clip(ph.hp, 0, 65535).astype(np.uint16))
    # the voxel-size discovery path of pullDICOMHeader
    pm = ds[(0x5200, 0x9230)][0]["PixelMeasuresSequence"][0]
    assert list(pm.PixelSpacing) == [1.5, 1.5]
    assert float(ds.SpacingBetweenSlices) == 10.0
    assert str(ds.PatientName) == "VENTJAX^PHANTOM"


def test_mask_folder_roundtrip(study):
    root, ph = study
    ds, mask = dcm.open_dicom_folder(os.path.join(root, "mask"))
    assert np.array_equal(mask, ph.mask)
    # reference returns the LAST slice's dataset
    assert int(ds.InstanceNumber) == ph.mask.shape[2]


def test_dicom_to_dict_skips_pixels(study):
    root, _ = study
    ds, _ = dcm.open_single_dicom(os.path.join(root, "xenon.dcm"))
    d = dcm.dicom_to_dict(ds, include_private=True)
    assert "PixelData" not in d
    assert isinstance(d["PerFrameFunctionalGroupsSequence"], list)


def test_rgb_dicom_roundtrip(tmp_path):
    rgb = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.Rows, ds.Columns = 16, 16
    ds.SamplesPerPixel = 3
    ds.PhotometricInterpretation = "RGB"
    ds.BitsAllocated = ds.BitsStored = 8
    ds.HighBit = 7
    ds.PixelRepresentation = 0
    ds.add((0x7FE0, 0x0010), "OB", rgb.tobytes())
    p = str(tmp_path / "rgb.dcm")
    ds.save_as(p)
    back = dcm.read_file(p)
    assert np.array_equal(back.pixel_array, rgb)


def test_nifti_roundtrip(tmp_path, rng):
    arr = rng.random((8, 8, 4, 6)).astype(np.float32)
    p = str(tmp_path / "a.nii")
    nifti.save(p, arr)
    back, affine = nifti.load(p)
    assert np.array_equal(back, arr)
    assert np.array_equal(affine, np.eye(4))


def test_nifti_fuzz_corrupt_headers(tmp_path, rng):
    """Mutated NIfTI headers must raise ValueError with a reason, never
    crash in struct/frombuffer or return garbage-shaped arrays."""
    import struct

    arr = rng.random((6, 5, 3)).astype(np.float32)
    p = str(tmp_path / "good.nii")
    nifti.save(p, arr)
    blob = bytearray(open(p, "rb").read())

    def mutated(name, off, fmt, value):
        b = bytearray(blob)
        struct.pack_into(fmt, b, off, value)
        pt = str(tmp_path / f"{name}.nii")
        open(pt, "wb").write(bytes(b))
        return pt

    cases = [
        mutated("sizeof", 0, "<i", 347),          # wrong sizeof_hdr
        mutated("ndim0", 40, "<h", 0),            # dim[0] out of range
        mutated("ndim9", 40, "<h", 9),
        mutated("negaxis", 42, "<h", -6),         # negative axis length
        mutated("dtype", 70, "<h", 99),           # unknown datatype code
        mutated("voxoff", 108, "<f", 1e9),        # data range past EOF
        mutated("voxneg", 108, "<f", 4.0),        # data inside the header
    ]
    # bad magic
    b = bytearray(blob)
    b[344:348] = b"zzz\x00"
    pm = str(tmp_path / "magic.nii")
    open(pm, "wb").write(bytes(b))
    cases.append(pm)
    # truncations: inside the header and inside the payload
    for cut in (100, 348, len(blob) - 5):
        pt = str(tmp_path / f"cut{cut}.nii")
        open(pt, "wb").write(bytes(blob[:cut]))
        cases.append(pt)

    for path in cases:
        with pytest.raises(ValueError):
            nifti.load(path)


def test_nifti_save_validates_shape(tmp_path, rng):
    with pytest.raises(ValueError, match="7 dimensions"):
        nifti.save(str(tmp_path / "d8.nii"), np.zeros((1,) * 8))
    with pytest.raises(ValueError, match="int16"):
        nifti.save(str(tmp_path / "big.nii"), np.zeros((40000, 1)))


def test_twix_roundtrip_and_fields(tmp_path, rng):
    k = (rng.normal(size=(16, 12, 2))
         + 1j * rng.normal(size=(16, 12, 2))).astype(np.complex64)
    p = str(tmp_path / "raw.dat")
    write_synthetic_twix(p, k, protocol_name="vent_gre",
                         scan_datetime="2024-03-01 10:15:00")
    tw = read_twix(p)
    assert tw.protocol_name == "vent_gre"
    assert tw.scan_datetime == "2024-03-01 10:15:00"
    assert np.allclose(tw.kspace(), k)
    # roadmap "more header info" (reference README.md:25): acquisition
    # params from the ASCCONV/XProtocol block, TR/TE converted us -> ms
    hp = tw.header_params
    assert hp["SequenceFileName"] == "%SiemensSeq%\\fl_gre"
    assert hp["SoftwareVersions"] == "syngo MR E11"
    assert hp["RepetitionTime"] == 15.0 and hp["EchoTime"] == 0.675
    assert hp["FlipAngle"] == 10.0
    assert abs(hp["NominalB0"] - 2.89362) < 1e-9
    assert hp["Frequency"] == 34091550


def test_twix_header_params_override_and_absent(tmp_path, rng):
    k = np.ones((4, 4, 1), np.complex64)
    p = str(tmp_path / "raw.dat")
    write_synthetic_twix(p, k, header_params={"TR_us": 4500, "FlipAngle": 7})
    hp = read_twix(p).header_params
    assert hp["RepetitionTime"] == 4.5 and hp["FlipAngle"] == 7.0
    from ventjax.io.twix import parse_header_params
    assert parse_header_params("no params here") == {}
    # empty ASCCONV value falls back to the populated XProtocol entry
    both = ('tSequenceFileName = ""\n'
            '<ParamString."SequenceFileName"> { "%SiemensSeq%\\\\gre" }\n')
    assert parse_header_params(both)["SequenceFileName"] == "%SiemensSeq%\\\\gre"


def test_twix_vb_roundtrip_and_fields(tmp_path, rng):
    """VB-era single-measurement layout (128-byte sMDH, channel id in the
    MDH) — mapvbvd parses both eras (reference Vent_Analysis.py:532)."""
    from ventjax.io.twix import write_synthetic_twix_vb

    k = (rng.normal(size=(16, 12, 3))
         + 1j * rng.normal(size=(16, 12, 3))).astype(np.complex64)
    p = str(tmp_path / "vb.dat")
    write_synthetic_twix_vb(p, k, protocol_name="vb_gre_vent",
                            scan_datetime="2013-06-01 09:30:00")
    tw = read_twix(p)
    assert tw.protocol_name == "vb_gre_vent"
    assert tw.scan_datetime == "2013-06-01 09:30:00"
    assert tw.n_channels == 1
    assert np.allclose(tw.kspace(), k)
    assert tw.header_params["RepetitionTime"] == 15.0  # VB header block too


def test_twix_vb_multichannel(tmp_path, rng):
    from ventjax.io.twix import write_synthetic_twix_vb

    k = (rng.normal(size=(3, 8, 6, 2))
         + 1j * rng.normal(size=(3, 8, 6, 2))).astype(np.complex64)
    p = str(tmp_path / "vb_mc.dat")
    write_synthetic_twix_vb(p, k)
    tw = read_twix(p)
    assert tw.n_channels == 3
    with pytest.raises(ValueError):
        tw.kspace()  # multi-coil must be explicit, same as VD/VE
    assert np.allclose(tw.kspace_multicoil(), k)


def test_twix_garbage_rejected(tmp_path):
    p = str(tmp_path / "junk.dat")
    with open(p, "wb") as f:
        f.write(b"\xff" * 6)
    with pytest.raises(ValueError):
        read_twix(p)
