"""JPEG-family encapsulated DICOM decode tests (Pillow-handled syntaxes).

The reference's pinned stack (pydicom 2.3.0 + Pillow 10.0.0,
reference requirements.txt:4-5) decodes JPEG Baseline (.50), 8-bit JPEG
Extended (.51), and JPEG 2000 (.90/.91) through pydicom's Pillow pixel-data
handler, so real scanner exports in those syntaxes load under the reference
(Vent_Analysis.py:176,192) and must load here.  Encoding lives in this test
file only (PIL encoders + PS3.5 A.4 fragment framing); the codec under test
decodes.  JPEG Lossless (.57/.70) is undecodable by BOTH stacks without
plugins — the boundary tests pin that rejection stays clean and header-only
reads still work.
"""
import struct

import numpy as np
import pytest

from ventjax.io import dicom as dcm

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402
import io as _io  # noqa: E402


# ---------------------------------------------------------------------------
# In-test encoders + encapsulated-file writer
# ---------------------------------------------------------------------------

def jpeg_encode(frame: np.ndarray, quality: int = 95) -> bytes:
    """8-bit JPEG Baseline stream for a [H,W] gray or [H,W,3] RGB frame."""
    mode = "RGB" if frame.ndim == 3 else "L"
    b = _io.BytesIO()
    Image.fromarray(frame.astype(np.uint8), mode).save(
        b, "JPEG", quality=quality)
    return b.getvalue()


def j2k_encode(frame: np.ndarray) -> bytes:
    """Lossless JPEG 2000 codestream for an 8- or 16-bit gray frame.

    This PIL build's J2K encoder requires a real file handle (fileno), so
    encode through a temp file.
    """
    import os
    import tempfile

    im = Image.fromarray(frame)  # uint16 -> "I;16", uint8 -> "L"
    f = tempfile.NamedTemporaryFile(suffix=".j2k", delete=False)
    try:
        f.close()
        im.save(f.name, "JPEG2000", irreversible=False)
        with open(f.name, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(f.name)


def write_encap_file(path, ts, frags, *, rows, cols, nframes, samples=1,
                     bits=8, bot=None, extra=None) -> None:
    """Part-10 file with encapsulated PixelData of transfer syntax ``ts``.

    ``frags`` is the fragment list (already split/padded by the caller);
    ``bot`` is the Basic Offset Table payload (b"" = empty item).
    """
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.Rows, ds.Columns = rows, cols
    ds.NumberOfFrames = nframes
    ds.SamplesPerPixel = samples
    ds.PhotometricInterpretation = (
        "YBR_FULL_422" if samples == 3 else "MONOCHROME2")
    ds.BitsAllocated = ds.BitsStored = bits
    ds.HighBit = bits - 1
    ds.PixelRepresentation = 0
    for k, v in (extra or {}).items():
        setattr(ds, k, v)

    meta = dcm.Dataset()
    meta.add((0x0002, 0x0001), "OB", b"\x00\x01")
    meta.MediaStorageSOPClassUID = ds.SOPClassUID
    meta.MediaStorageSOPInstanceUID = ds.SOPInstanceUID
    meta.TransferSyntaxUID = ts
    meta.ImplementationClassUID = dcm.generate_uid()

    pix = bytearray()
    pix += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
    pix += struct.pack("<I", 0xFFFFFFFF)
    bot = b"" if bot is None else bot
    pix += struct.pack("<HHI", 0xFFFE, 0xE000, len(bot)) + bot
    for frag in frags:
        if len(frag) % 2:
            frag = frag + b"\x00"  # PS3.5: even-length fragments
        pix += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
    pix += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)

    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        f.write(dcm._encode_dataset(meta, skip_meta=False))
        f.write(dcm._encode_dataset(ds, skip_meta=True))
        f.write(bytes(pix))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def smooth16(rng, shape, top=3000):
    """Smooth-ish uint16 frames (compressible, clinically plausible)."""
    a = rng.integers(0, top, shape).astype(np.float64)
    k = np.ones((1, 5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view  # noqa: F401
    # cheap blur: two passes of neighbor averaging per axis
    for ax in (1, 2):
        a = (a + np.roll(a, 1, ax) + np.roll(a, -1, ax)) / 3.0
    return a.astype(np.uint16)


# ---------------------------------------------------------------------------
# JPEG 2000 Lossless (.90): bit-exact round-trips
# ---------------------------------------------------------------------------

def test_j2k_lossless_16bit_multiframe_exact(tmp_path, rng):
    frames = smooth16(rng, (4, 32, 40))
    path = str(tmp_path / "j2k16.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS,
                     [j2k_encode(f) for f in frames],
                     rows=32, cols=40, nframes=4, bits=16)
    ds = dcm.read_file(path)
    arr = ds.pixel_array
    assert arr.dtype == np.uint16 and arr.shape == (4, 32, 40)
    np.testing.assert_array_equal(arr, frames)


def test_j2k_lossless_8bit_single_frame(tmp_path, rng):
    frame = rng.integers(0, 255, (16, 24)).astype(np.uint8)
    path = str(tmp_path / "j2k8.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS, [j2k_encode(frame)],
                     rows=16, cols=24, nframes=1, bits=8)
    arr = dcm.read_file(path).pixel_array
    assert arr.shape == (16, 24) and arr.dtype == np.uint8
    np.testing.assert_array_equal(arr, frame)


def test_j2k_flows_through_open_single_dicom(tmp_path, rng):
    """open_single_dicom transpose semantics hold for compressed files."""
    frames = smooth16(rng, (3, 20, 28))
    path = str(tmp_path / "vol.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS,
                     [j2k_encode(f) for f in frames],
                     rows=20, cols=28, nframes=3, bits=16)
    _, vol = dcm.open_single_dicom(path)
    assert vol.shape == (20, 28, 3)
    np.testing.assert_array_equal(vol, np.transpose(frames, (1, 2, 0)))


def test_j2k_transcodes_on_resave(tmp_path, rng):
    """save_as re-encodes to native Explicit VR LE, pixel-identical."""
    frames = smooth16(rng, (2, 16, 16))
    path = str(tmp_path / "in.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS,
                     [j2k_encode(f) for f in frames],
                     rows=16, cols=16, nframes=2, bits=16)
    ds = dcm.read_file(path)
    out = str(tmp_path / "out.dcm")
    ds.save_as(out)
    ds2 = dcm.read_file(out)
    assert not isinstance(ds2.get("PixelData"), dcm.EncapsulatedPixelData)
    np.testing.assert_array_equal(ds2.pixel_array, frames)


# ---------------------------------------------------------------------------
# JPEG Baseline (.50): lossy — plumbing must match PIL's own decode exactly
# ---------------------------------------------------------------------------

def test_jpeg_baseline_gray_multiframe(tmp_path, rng):
    frames = (smooth16(rng, (3, 24, 24), top=250) & 0xFF).astype(np.uint8)
    streams = [jpeg_encode(f) for f in frames]
    path = str(tmp_path / "jpg.dcm")
    write_encap_file(path, dcm.JPEG_BASELINE, streams,
                     rows=24, cols=24, nframes=3, bits=8)
    arr = dcm.read_file(path).pixel_array
    assert arr.shape == (3, 24, 24) and arr.dtype == np.uint8
    want = np.stack([np.asarray(Image.open(_io.BytesIO(s))) for s in streams])
    np.testing.assert_array_equal(arr, want)       # exact vs PIL's decode
    assert np.abs(arr.astype(int) - frames.astype(int)).max() <= 24  # lossy


def test_jpeg_baseline_rgb_single_frame(tmp_path, rng):
    frame = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    stream = jpeg_encode(frame, quality=90)
    path = str(tmp_path / "rgb.dcm")
    write_encap_file(path, dcm.JPEG_BASELINE, [stream],
                     rows=16, cols=16, nframes=1, samples=3, bits=8)
    arr = dcm.read_file(path).pixel_array
    assert arr.shape == (16, 16, 3)
    np.testing.assert_array_equal(
        arr, np.asarray(Image.open(_io.BytesIO(stream))))


# ---------------------------------------------------------------------------
# Fragment -> frame mapping (PS3.5 A.4)
# ---------------------------------------------------------------------------

def test_single_frame_split_across_fragments(tmp_path, rng):
    frame = smooth16(rng, (1, 32, 32))[0]
    stream = j2k_encode(frame)
    cut = (len(stream) // 2) & ~1  # even split point keeps bytes intact
    path = str(tmp_path / "split.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS,
                     [stream[:cut], stream[cut:]],
                     rows=32, cols=32, nframes=1, bits=16)
    np.testing.assert_array_equal(dcm.read_file(path).pixel_array, frame)


def test_multiframe_bot_grouping(tmp_path, rng):
    """2 frames x 2 fragments each, grouped by the Basic Offset Table."""
    frames = smooth16(rng, (2, 24, 24))
    frags, bounds = [], []
    pos = 0
    for f in frames:
        s = j2k_encode(f)
        if len(s) % 2:
            s += b"\x00"  # pad so the split fragments stay even-length
        cut = (len(s) // 2) & ~1
        bounds.append(pos)
        frags += [s[:cut], s[cut:]]
        pos += (8 + cut) + (8 + len(s) - cut)
    bot = struct.pack("<2I", *bounds)
    path = str(tmp_path / "bot.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS, frags,
                     rows=24, cols=24, nframes=2, bits=16, bot=bot)
    np.testing.assert_array_equal(dcm.read_file(path).pixel_array, frames)


def test_fragment_frame_mismatch_fails_cleanly(tmp_path, rng):
    frames = smooth16(rng, (2, 16, 16))
    s0, s1 = j2k_encode(frames[0]), j2k_encode(frames[1])
    cut = (len(s1) // 2) & ~1
    path = str(tmp_path / "bad.dcm")
    # 3 fragments, 2 frames, no BOT -> ambiguous
    write_encap_file(path, dcm.JPEG2000_LOSSLESS, [s0, s1[:cut], s1[cut:]],
                     rows=16, cols=16, nframes=2, bits=16)
    with pytest.raises(ValueError, match="cannot map 3"):
        dcm.read_file(path).pixel_array


def test_misaligned_bot_fails_cleanly(tmp_path, rng):
    frames = smooth16(rng, (2, 16, 16))
    frags = [j2k_encode(f) for f in frames]
    bot = struct.pack("<2I", 0, 7)  # 7 is not a fragment start
    path = str(tmp_path / "badbot.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS, frags + [b"\x00\x00"],
                     rows=16, cols=16, nframes=2, bits=16, bot=bot)
    with pytest.raises(ValueError, match="Offset Table"):
        dcm.read_file(path).pixel_array


def test_corrupt_stream_fails_cleanly(tmp_path, rng):
    path = str(tmp_path / "garbage.dcm")
    write_encap_file(path, dcm.JPEG_BASELINE, [b"\xff\xd8notajpeg\x00"],
                     rows=8, cols=8, nframes=1, bits=8)
    with pytest.raises(ValueError, match="Pillow could not decode"):
        dcm.read_file(path).pixel_array


def test_header_size_mismatch_fails_cleanly(tmp_path, rng):
    frame = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    path = str(tmp_path / "wrongsize.dcm")
    write_encap_file(path, dcm.JPEG_BASELINE, [jpeg_encode(frame)],
                     rows=32, cols=32, nframes=1, bits=8)  # header lies
    with pytest.raises(ValueError, match="header claims"):
        dcm.read_file(path).pixel_array


# ---------------------------------------------------------------------------
# Undecodable JPEG family: header reads work, pixel_array rejects cleanly
# ---------------------------------------------------------------------------

JPEG_LOSSLESS_SV1 = "1.2.840.10008.1.2.4.70"


def test_jpeg_lossless_header_reads_pixels_reject(tmp_path, rng):
    path = str(tmp_path / "ll.dcm")
    write_encap_file(path, JPEG_LOSSLESS_SV1, [b"\xff\xd8\x00\x00"],
                     rows=8, cols=8, nframes=1, bits=16,
                     extra={"PatientID": "P123"})
    ds = dcm.read_file(path)          # header-only read must succeed
    assert ds.PatientID == "P123"
    with pytest.raises(ValueError, match="unsupported transfer"):
        ds.pixel_array


# ---------------------------------------------------------------------------
# Ingest + native-scanner fallback
# ---------------------------------------------------------------------------

def test_jpeg_mask_folder_ingest(tmp_path, rng):
    """A folder of per-slice J2K-lossless mask DICOMs ingests bit-exact
    (reference openDICOMfolder path, Vent_Analysis.py:184-196)."""
    masks = (rng.random((16, 16, 3)) > 0.5).astype(np.uint16) * 1000
    folder = tmp_path / "maskdir"
    folder.mkdir()
    for k in range(3):
        write_encap_file(str(folder / f"slice_{k:03d}.dcm"),
                         dcm.JPEG2000_LOSSLESS,
                         [j2k_encode(masks[:, :, k].copy())],
                         rows=16, cols=16, nframes=1, bits=16)
    _, got = dcm.open_dicom_folder(str(folder))
    np.testing.assert_array_equal(got, masks)


def test_native_scanner_falls_back_on_jpeg(tmp_path, rng):
    """The C++ fast path returns None for JPEG syntaxes (it only decodes
    what it implements), so cohort ingest falls back to this codec."""
    from ventjax.io import native

    if not native.available():
        pytest.skip("native library unavailable")
    frame = smooth16(rng, (1, 16, 16))[0]
    path = str(tmp_path / "j2k.dcm")
    write_encap_file(path, dcm.JPEG2000_LOSSLESS, [j2k_encode(frame)],
                     rows=16, cols=16, nframes=1, bits=16)
    assert native.decode_pixels(path) is None
    np.testing.assert_array_equal(dcm.read_file(path).pixel_array, frame)


# ---------------------------------------------------------------------------
# Fuzz: mutated JPEG-family files fail cleanly (same contract as the
# native/RLE fuzz suites — parse or raise, never hang, crash, or mis-shape)
# ---------------------------------------------------------------------------

def test_jpeg_fuzz_mutations_fail_cleanly(tmp_path, rng):
    frames = smooth16(rng, (2, 16, 16))
    good_j2k = tmp_path / "g1.dcm"
    write_encap_file(str(good_j2k), dcm.JPEG2000_LOSSLESS,
                     [j2k_encode(f) for f in frames],
                     rows=16, cols=16, nframes=2, bits=16)
    good_jpg = tmp_path / "g2.dcm"
    g8 = (frames & 0xFF).astype(np.uint8)
    write_encap_file(str(good_jpg), dcm.JPEG_BASELINE,
                     [jpeg_encode(f) for f in g8],
                     rows=16, cols=16, nframes=2, bits=8)

    import struct as _struct
    bad = tmp_path / "bad.dcm"
    n_ok = 0
    for blob in (good_j2k.read_bytes(), good_jpg.read_bytes()):
        for trial in range(150):
            b = bytearray(blob)
            kind = trial % 3
            if kind == 0:
                for _ in range(int(rng.integers(1, 9))):
                    b[int(rng.integers(0, len(b)))] = int(rng.integers(256))
            elif kind == 1:
                b = b[:int(rng.integers(1, len(b)))]
            else:
                at = int(rng.integers(0, len(b)))
                b[at:at] = bytes(rng.integers(
                    0, 256, int(rng.integers(1, 48)), dtype=np.uint8))
            bad.write_bytes(bytes(b))
            try:
                ds = dcm.read_file(str(bad))
                if "PixelData" in ds:
                    arr = ds.pixel_array
                    # a successful decode must still honor the header shape
                    assert arr.shape[-2:] == (16, 16) or arr.shape == (16, 16)
                    n_ok += 1
            except (ValueError, _struct.error, KeyError, EOFError,
                    TypeError, MemoryError, OverflowError, AttributeError):
                # AttributeError = a mutation stripped a header element the
                # decode needs (Rows/Columns/...) — pydicom raises the same
                pass  # clean rejection
    # flips inside compressed payload bytes often still decode (lossy
    # streams tolerate bit damage) — make sure the corpus exercised both
    # outcomes rather than rejecting everything
    assert n_ok > 5


# ---------------------------------------------------------------------------
# Mixed-transfer-syntax cohort: same phantom encoded three ways must produce
# identical metrics lane-for-lane (plain LE, RLE Lossless, JPEG 2000
# lossless are all bit-preserving encodings of the same study)
# ---------------------------------------------------------------------------

def test_cohort_mixed_transfer_syntaxes_identical_metrics(tmp_path):
    from test_io_rle import write_rle_file

    from ventjax.io.phantom import make_phantom
    from ventjax.io.synthetic import write_mask_folder, write_multiframe
    from ventjax.pipeline.cohort import run_cohort

    ph = make_phantom(shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=6)
    frames16 = np.clip(
        np.transpose(ph.hp, (2, 0, 1)), 0, 65535).astype(np.uint16)
    mask16 = (np.asarray(ph.mask) > 0).astype(np.uint16)

    # subject A: plain Explicit VR LE (the baseline encoding)
    a = tmp_path / "a"; a.mkdir()
    write_multiframe(str(a / "xenon.dcm"), ph.hp, ph.vox)
    write_mask_folder(str(a / "mask"), ph.mask, ph.vox)

    # subject B: RLE Lossless mask slices (native scanner decodes these)
    b = tmp_path / "b"; b.mkdir(); (b / "mask").mkdir()
    for k in range(8):
        write_rle_file(str(b / "mask" / f"s{k:03d}.dcm"),
                       mask16[None, :, :, k].copy())

    # subject C: JPEG 2000 lossless xenon AND mask (Python-codec fallback)
    c = tmp_path / "c"; c.mkdir(); (c / "mask").mkdir()
    write_encap_file(str(c / "xenon.dcm"), dcm.JPEG2000_LOSSLESS,
                     [j2k_encode(f.copy()) for f in frames16],
                     rows=64, cols=64, nframes=8, bits=16,
                     extra={"SpacingBetweenSlices": 10.0,
                            "PixelSpacing": dcm.MultiValue([1.5, 1.5]),
                            "SliceThickness": 10.0})
    for k in range(8):
        write_encap_file(str(c / "mask" / f"s{k:03d}.dcm"),
                         dcm.JPEG2000_LOSSLESS,
                         [j2k_encode(mask16[:, :, k].copy())],
                         rows=64, cols=64, nframes=1, bits=16)

    manifest = [
        {"id": "plain", "xenon": str(a / "xenon.dcm"), "mask": str(a / "mask")},
        {"id": "rle", "xenon": str(a / "xenon.dcm"), "mask": str(b / "mask")},
        {"id": "j2k", "xenon": str(c / "xenon.dcm"), "mask": str(c / "mask")},
    ]
    results = run_cohort(manifest, str(tmp_path / "out"), batch_size=2)
    by_id = {r["id"]: r for r in results}
    assert set(by_id) == {"plain", "rle", "j2k"}
    for rid, r in by_id.items():
        assert r.get("valid", True), (rid, r)
    for key in ("VDP", "VDP_lb", "SNR", "CI", "LungVolume"):
        vals = [by_id[i].get(key) for i in ("plain", "rle", "j2k")]
        assert vals[0] == vals[1] == vals[2], (key, vals)
