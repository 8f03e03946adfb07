"""RLE Lossless (1.2.840.10008.1.2.5) DICOM decode tests.

The reference's pinned pydicom 2.3.0 decodes RLE Lossless natively through
``pixel_array`` (reference Vent_Analysis.py:176,192, requirements.txt:5), so
real scanner exports in RLE must load here too.  The ENCODER lives in this
test file only (PS3.5 Annex G PackBits + segment/fragment framing): it
round-trips random and structured volumes through the codec's decoder, and
the fuzz cases mutate the framing to prove corrupt files fail cleanly
instead of crashing or silently mis-decoding.
"""
import struct

import numpy as np
import pytest

from ventjax.io import dicom as dcm


# ---------------------------------------------------------------------------
# In-test encoder (PS3.5 Annex G)
# ---------------------------------------------------------------------------

def rle_encode_segment(data: bytes) -> bytes:
    """PackBits: replicate runs of >=2 as (257-run, byte); literals as
    (len-1, bytes).  Max run/literal length 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and data[j] == data[j + 1])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    if len(out) % 2:
        out.append(0x80)  # even padding with the no-op control byte
    return bytes(out)


def rle_encode_frame(frame: np.ndarray, bits: int) -> bytes:
    """One fragment: 64-byte header (#segments + offsets) then the MSB-first
    byte-plane segments of a [rows, cols] (or [rows, cols, samples]) frame."""
    if frame.ndim == 2:
        frame = frame[:, :, None]
    samples = frame.shape[2]
    bpp = bits // 8
    flat = frame.reshape(-1, samples)
    segs = []
    for s in range(samples):
        vals = flat[:, s].astype(np.uint32)
        for b in range(bpp):  # MSB first
            plane = ((vals >> (8 * (bpp - 1 - b))) & 0xFF).astype(np.uint8)
            segs.append(rle_encode_segment(plane.tobytes()))
    header = [len(segs)]
    off = 64
    for sdata in segs:
        header.append(off)
        off += len(sdata)
    header += [0] * (16 - len(header))
    return struct.pack("<16I", *header) + b"".join(segs)


def write_rle_file(path, frames: np.ndarray, bits=16, signed=False,
                   samples=1, mangle=None, extra=None) -> None:
    """Part-10 RLE Lossless file: Explicit VR LE dataset + encapsulated
    PixelData (empty Basic Offset Table, one fragment per frame).
    ``mangle(fragments) -> fragments`` lets fuzz tests corrupt the framing."""
    F, H, W = frames.shape[:3]
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.Rows, ds.Columns = H, W
    ds.NumberOfFrames = F
    ds.SamplesPerPixel = samples
    ds.PhotometricInterpretation = "RGB" if samples == 3 else "MONOCHROME2"
    ds.BitsAllocated = ds.BitsStored = bits
    ds.HighBit = bits - 1
    ds.PixelRepresentation = 1 if signed else 0
    for k, v in (extra or {}).items():
        setattr(ds, k, v)

    meta = dcm.Dataset()
    meta.add((0x0002, 0x0001), "OB", b"\x00\x01")
    meta.MediaStorageSOPClassUID = ds.SOPClassUID
    meta.MediaStorageSOPInstanceUID = ds.SOPInstanceUID
    meta.TransferSyntaxUID = dcm.RLE_LOSSLESS
    meta.ImplementationClassUID = dcm.generate_uid()

    frags = [rle_encode_frame(frames[f], bits) for f in range(F)]
    if mangle is not None:
        frags = mangle(frags)
    pix = bytearray()
    pix += struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
    pix += struct.pack("<I", 0xFFFFFFFF)
    pix += struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty offset table
    for frag in frags:
        pix += struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
    pix += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)

    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        f.write(dcm._encode_dataset(meta, skip_meta=False))
        f.write(dcm._encode_dataset(ds, skip_meta=True))
        f.write(bytes(pix))


# ---------------------------------------------------------------------------
# Round-trips
# ---------------------------------------------------------------------------

def test_packbits_segment_roundtrip_edge_patterns():
    cases = [
        b"",  # empty decodes to empty
        b"\x00" * 5000,  # long replicate runs (cross the 128 limit)
        bytes(range(256)) * 8,  # pure literals crossing the 128 limit
        b"ABABAB" + b"\xff" * 300 + b"xyz",  # mixed
        np.random.default_rng(0).integers(0, 4, 10000, dtype=np.uint8)
        .tobytes(),  # short runs and literals interleaved
    ]
    for original in cases:
        enc = rle_encode_segment(original)
        assert len(enc) % 2 == 0
        dec = dcm._rle_decode_segment(enc, len(original))
        assert dec == original


@pytest.mark.parametrize("bits,signed", [(16, False), (16, True), (8, False)])
def test_rle_multiframe_roundtrip(tmp_path, bits, signed, rng):
    lo, hi = (-(2 ** (bits - 1)), 2 ** (bits - 1)) if signed else (0, 2 ** bits)
    # structured + noisy: constant bands (long runs) and speckle (literals)
    frames = rng.integers(lo, hi, (6, 32, 24)).astype(
        {8: np.int8 if signed else np.uint8,
         16: np.int16 if signed else np.uint16}[bits]
    )
    frames[:, :8] = lo
    frames[:, 8:12] = hi - 1
    p = str(tmp_path / "rle.dcm")
    write_rle_file(p, frames, bits=bits, signed=signed)
    ds = dcm.read_file(p)
    assert ds.get("TransferSyntaxUID") == dcm.RLE_LOSSLESS
    assert np.array_equal(ds.pixel_array, frames)


def test_rle_single_frame_and_rgb(tmp_path, rng):
    one = rng.integers(0, 65536, (1, 16, 16)).astype(np.uint16)
    p = str(tmp_path / "one.dcm")
    write_rle_file(p, one)
    assert np.array_equal(dcm.read_file(p).pixel_array, one[0])

    rgb = rng.integers(0, 256, (1, 16, 16, 3)).astype(np.uint8)
    p2 = str(tmp_path / "rgb.dcm")
    write_rle_file(p2, rgb, bits=8, samples=3)
    assert np.array_equal(dcm.read_file(p2).pixel_array, rgb[0])


def test_rle_study_flows_through_ingest_and_resave(tmp_path, rng):
    """open_single_dicom on an RLE multiframe mirrors the reference's
    pydicom path (Vent_Analysis.py:176-179); re-saving transcodes to
    native Explicit VR LE."""
    vol = rng.integers(0, 4096, (8, 40, 32)).astype(np.uint16)
    p = str(tmp_path / "xe_rle.dcm")
    write_rle_file(p, vol)
    ds, arr = dcm.open_single_dicom(p)
    assert np.array_equal(arr, np.transpose(vol, (1, 2, 0)))
    # resave: decoded pixels, native syntax, loadable without RLE support
    p2 = str(tmp_path / "native.dcm")
    ds.save_as(p2)
    back = dcm.read_file(p2)
    assert back.get("TransferSyntaxUID") == dcm.EXPLICIT_VR_LE
    assert np.array_equal(back.pixel_array, vol)


def test_rle_mask_folder_ingest(tmp_path, rng):
    """Folder-of-slices ingest (reference Vent_Analysis.py:184-196) where
    every slice file is RLE-compressed; both the Python codec and the
    native C++ scanner (dicomscan.cpp decode_rle) decode it."""
    mask = (rng.random((24, 20, 5)) > 0.5).astype(np.uint16)
    folder = tmp_path / "mask"
    folder.mkdir()
    for k in range(mask.shape[2]):
        write_rle_file(str(folder / f"slice{k:03d}.dcm"), mask[None, :, :, k])
    _, arr = dcm.open_dicom_folder(str(folder))
    assert np.array_equal(arr, mask)

    from ventjax.io import native
    if native.available():
        got = native.decode_pixels(str(folder / "slice000.dcm"))
        assert got is not None
        assert np.array_equal(got[0], mask[:, :, 0])


@pytest.mark.parametrize("bits,signed,samples", [
    (16, False, 1), (16, True, 1), (8, False, 1), (8, False, 3)])
def test_rle_native_scanner_matches_python(tmp_path, rng, bits, signed,
                                           samples):
    """The native scanner's RLE path (dicomscan.cpp packbits/decode_rle)
    must agree byte-for-byte with the Python codec on multi-frame files."""
    from ventjax.io import native
    if not native.available():
        pytest.skip("native scanner unavailable")
    lo, hi = (-(2 ** (bits - 1)), 2 ** (bits - 1)) if signed else (0, 2 ** bits)
    shape = (4, 24, 16) if samples == 1 else (4, 24, 16, 3)
    frames = rng.integers(lo, hi, shape).astype(
        {8: np.int8 if signed else np.uint8,
         16: np.int16 if signed else np.uint16}[bits])
    frames[:, :6] = lo  # long runs
    p = str(tmp_path / "par.dcm")
    write_rle_file(p, frames, bits=bits, signed=signed, samples=samples)
    got = native.decode_pixels(p)
    assert got is not None
    assert np.array_equal(got[0], dcm.read_file(p).pixel_array)


def test_rle_native_scanner_rejects_corrupt_fragments(tmp_path, rng):
    """Every fuzz mangle that the Python codec rejects must make the native
    scanner return None (rc != 0), never crash or mis-decode."""
    from ventjax.io import native
    if not native.available():
        pytest.skip("native scanner unavailable")
    frames = rng.integers(0, 65536, (3, 16, 16)).astype(np.uint16)
    mangles = {
        "segcount": lambda fr: [struct.pack("<I", 7) + fr[0][4:]] + fr[1:],
        "offsets": lambda fr: [fr[0][:4] + struct.pack("<II", 64, 10 ** 6)
                               + fr[0][12:]] + fr[1:],
        "monotonic": lambda fr: [fr[0][:4] + struct.pack("<II", 70, 64)
                                 + fr[0][12:]] + fr[1:],
        "truncated": lambda fr: [fr[0][:len(fr[0]) // 2]] + fr[1:],
        "tinyfrag": lambda fr: [fr[0][:32]] + fr[1:],
        "fragcount": lambda fr: fr[:-1],
    }
    for name, mangle in mangles.items():
        p = str(tmp_path / f"{name}.dcm")
        write_rle_file(p, frames, mangle=mangle)
        assert native.decode_pixels(p) is None, name


# ---------------------------------------------------------------------------
# Fuzz: corrupt framing must fail cleanly (ValueError), never mis-decode
# ---------------------------------------------------------------------------

def _expect_clean_failure(tmp_path, name, frames, mangle):
    p = str(tmp_path / name)
    write_rle_file(p, frames, mangle=mangle)
    ds = dcm.read_file(p)  # header parse itself must survive
    with pytest.raises(ValueError):
        ds.pixel_array


def test_rle_fuzz_corrupt_fragments(tmp_path, rng):
    frames = rng.integers(0, 65536, (3, 16, 16)).astype(np.uint16)

    _expect_clean_failure(  # wrong segment count in the header
        tmp_path, "segcount.dcm", frames,
        lambda fr: [struct.pack("<I", 7) + fr[0][4:]] + fr[1:])
    _expect_clean_failure(  # offsets out of range
        tmp_path, "offsets.dcm", frames,
        lambda fr: [fr[0][:4] + struct.pack("<II", 64, 10 ** 6)
                    + fr[0][12:]] + fr[1:])
    _expect_clean_failure(  # non-monotonic offsets
        tmp_path, "monotonic.dcm", frames,
        lambda fr: [fr[0][:4] + struct.pack("<II", 70, 64)
                    + fr[0][12:]] + fr[1:])
    _expect_clean_failure(  # truncated segment data (decode runs short)
        tmp_path, "truncated.dcm", frames,
        lambda fr: [fr[0][:len(fr[0]) // 2]] + fr[1:])
    _expect_clean_failure(  # fragment shorter than its 64-byte header
        tmp_path, "tinyfrag.dcm", frames,
        lambda fr: [fr[0][:32]] + fr[1:])
    _expect_clean_failure(  # fragment/frame count mismatch
        tmp_path, "fragcount.dcm", frames, lambda fr: fr[:-1])


def test_rle_fuzz_random_garbage_segments(tmp_path, rng):
    """Random bytes in place of encoded segments: decode must either raise
    ValueError or produce exactly rows*cols pixels — never crash."""
    frames = rng.integers(0, 65536, (1, 8, 8)).astype(np.uint16)
    for seed in range(20):
        g = np.random.default_rng(seed)
        garbage = g.integers(0, 256, g.integers(2, 200), dtype=np.uint8)
        garbage = garbage.tobytes()
        if len(garbage) % 2:
            garbage += b"\x80"

        def mangle(fr, garbage=garbage):
            return [struct.pack("<16I", 2, 64, 64 + len(garbage),
                                *([0] * 13)) + garbage + garbage]

        p = str(tmp_path / f"garbage{seed}.dcm")
        write_rle_file(p, frames, mangle=mangle)
        ds = dcm.read_file(p)
        try:
            arr = ds.pixel_array
        except ValueError:
            continue
        assert arr.shape == (8, 8)


def test_truncated_rle_file_fails_cleanly(tmp_path, rng):
    frames = rng.integers(0, 65536, (2, 16, 16)).astype(np.uint16)
    p = str(tmp_path / "whole.dcm")
    write_rle_file(p, frames)
    blob = open(p, "rb").read()
    for cut in (len(blob) - 7, len(blob) - 100, len(blob) // 2):
        pt = str(tmp_path / f"cut{cut}.dcm")
        with open(pt, "wb") as f:
            f.write(blob[:cut])
        with pytest.raises(Exception):
            dcm.read_file(pt).pixel_array


# ---------------------------------------------------------------------------
# Codec WRITE path (write_file / save_as transfer_syntax=RLE_LOSSLESS)
# ---------------------------------------------------------------------------

def _native_ds(frames: np.ndarray, bits=16, signed=False, samples=1):
    """Dataset with raw (uncompressed) PixelData for the write-path tests."""
    F, H, W = frames.shape[:3]
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    ds.SOPInstanceUID = dcm.generate_uid()
    ds.Rows, ds.Columns = H, W
    ds.NumberOfFrames = F
    ds.SamplesPerPixel = samples
    ds.PhotometricInterpretation = "RGB" if samples == 3 else "MONOCHROME2"
    ds.BitsAllocated = ds.BitsStored = bits
    ds.HighBit = bits - 1
    ds.PixelRepresentation = 1 if signed else 0
    ds.add((0x7FE0, 0x0010), "OW" if bits > 8 else "OB",
           np.ascontiguousarray(frames).tobytes())
    return ds


def test_codec_encoder_segment_matches_decoder(rng):
    """The production encoder (dicom._rle_encode_segment) round-trips the
    same adversarial byte patterns the in-test encoder is checked on —
    including 128-crossing runs and run/literal interleave."""
    cases = [
        b"",
        b"\x00" * 5000,
        bytes(range(256)) * 8,
        b"\xab" * 129, b"\xab" * 130, b"\xab" * 256 + b"\x01",
        b"ABABAB" + b"\xff" * 300 + b"xyz",
        rng.integers(0, 4, 10000, dtype=np.uint8).tobytes(),
        rng.integers(0, 256, 7777, dtype=np.uint8).tobytes(),
    ]
    for original in cases:
        enc = dcm._rle_encode_segment(original)
        assert len(enc) % 2 == 0
        if original:
            assert dcm._rle_decode_segment(enc, len(original)) == original


@pytest.mark.parametrize("bits,signed", [
    (8, False), (16, False), (16, True), (32, False)])
def test_write_file_rle_roundtrip(tmp_path, bits, signed, rng):
    dt = {(8, False): np.uint8, (16, False): np.uint16,
          (16, True): np.int16, (32, False): np.uint32}[(bits, signed)]
    info = np.iinfo(dt)
    frames = rng.integers(info.min, int(info.max) + 1, (5, 32, 24)).astype(dt)
    frames[:, :8] = info.min  # long runs
    ds = _native_ds(frames, bits=bits, signed=signed)
    p = str(tmp_path / "w.dcm")
    ds.save_as(p, transfer_syntax=dcm.RLE_LOSSLESS)
    back = dcm.read_file(p)
    assert back.get("TransferSyntaxUID") == dcm.RLE_LOSSLESS
    assert np.array_equal(back.pixel_array, frames)


def test_write_file_rle_rgb_and_native_scanner(tmp_path, rng):
    rgb = rng.integers(0, 256, (3, 16, 20, 3)).astype(np.uint8)
    ds = _native_ds(rgb.reshape(3, 16, 20 * 3), bits=8)
    ds.Rows, ds.Columns = 16, 20
    ds.SamplesPerPixel = 3
    ds.PhotometricInterpretation = "RGB"
    ds.PlanarConfiguration = 0
    p = str(tmp_path / "rgb.dcm")
    ds.save_as(p, transfer_syntax=dcm.RLE_LOSSLESS)
    back = dcm.read_file(p)
    assert np.array_equal(back.pixel_array, rgb)

    from ventjax.io import native
    if native.available():
        got = native.decode_pixels(p)
        assert got is not None
        assert np.array_equal(got[0], rgb)


def test_write_file_rle_transcodes_encapsulated_input(tmp_path, rng):
    """RLE in -> RLE out re-encodes (our fragments, same pixels); RLE in ->
    default save transcodes to Explicit VR LE (existing behavior)."""
    frames = rng.integers(0, 4096, (4, 24, 16)).astype(np.uint16)
    p0 = str(tmp_path / "src.dcm")
    write_rle_file(p0, frames)  # in-test encoder
    src = dcm.read_file(p0)
    p1 = str(tmp_path / "re.dcm")
    src.save_as(p1, transfer_syntax=dcm.RLE_LOSSLESS)
    assert np.array_equal(dcm.read_file(p1).pixel_array, frames)


def test_write_file_rle_validation(tmp_path, rng):
    ds = dcm.Dataset()
    ds.SOPClassUID = dcm.MR_STORAGE
    with pytest.raises(ValueError, match="PixelData"):
        dcm.write_file(str(tmp_path / "no.dcm"), ds,
                       transfer_syntax=dcm.RLE_LOSSLESS)
    with pytest.raises(ValueError, match="transfer syntax|supports"):
        dcm.write_file(str(tmp_path / "ts.dcm"), ds,
                       transfer_syntax=dcm.JPEG_BASELINE)


def test_export_dicom_compressed_pacs(tmp_path, rng):
    """export_dicom(transfer_syntax=RLE_LOSSLESS): per-slice PACS overlays
    decode to exactly the uncompressed export's pixels and are smaller on
    the background-dominated RGB overlays."""
    import os

    from ventjax.report.export import export_dicom

    H, W, D = 48, 40, 4
    # smooth intensity -> long byte runs, so the compressed files are
    # guaranteed smaller (pure noise can expand slightly under RLE)
    n4 = np.broadcast_to(
        np.linspace(0, 1, H, dtype=np.float32)[:, None, None], (H, W, D)
    ).copy()
    defect = np.zeros((H, W, D), np.float32)
    defect[10:20, 10:20, :] = 1.0
    ds = _native_ds(rng.integers(0, 4096, (D, H, W)).astype(np.uint16))

    raw_dir = export_dicom(ds, n4, defect, str(tmp_path / "raw"),
                           vdp=5.0, for_pacs=True)
    rle_dir = export_dicom(ds, n4, defect, str(tmp_path / "rle"),
                           vdp=5.0, for_pacs=True,
                           transfer_syntax=dcm.RLE_LOSSLESS)
    for i in range(D):
        a = dcm.read_file(os.path.join(raw_dir, f"dicom_{i}.dcm"))
        b = dcm.read_file(os.path.join(rle_dir, f"dicom_{i}.dcm"))
        assert b.get("TransferSyntaxUID") == dcm.RLE_LOSSLESS
        assert np.array_equal(a.pixel_array, b.pixel_array)
        assert (os.path.getsize(os.path.join(rle_dir, f"dicom_{i}.dcm"))
                < os.path.getsize(os.path.join(raw_dir, f"dicom_{i}.dcm")))
