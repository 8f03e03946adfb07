"""Export layer: NIfTI / JSON / defect-overlay DICOM / pickle artifacts.

Host-side parity with the reference L4 layer (SURVEY.md §1):
- export_nifti: 6-channel float32 4-D array in the reference's fixed channel
  order [proton, HPvent, mask, N4HPvent, defectArray, CIarray] with identity
  affine (Vent_Analysis.py:273-313);
- dicom_to_json: full-header dump minus Pixel Data (Vent_Analysis.py:374-379);
- export_dicom: grayscale N4 with defect voxels painted pure red, either as
  one RGB DICOM per slice with fresh SOP/Series UIDs (forPACS=True) or as a
  single multi-frame RGB DICOM (Vent_Analysis.py:381-428);
- pickle round-trip of the study state dict (Vent_Analysis.py:542-559), the
  reference's checkpoint/resume mechanism.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pickle
import warnings
from typing import Dict, Optional

import numpy as np

from ventjax.io import dicom as dcm
from ventjax.io import nifti
from ventjax.oracle.reference import build_4d_array, normalize


def export_nifti(
    filepath: str,
    file_name: str,
    hp: np.ndarray,
    mask: np.ndarray,
    proton=None,
    n4=None,
    defect=None,
    ci=None,
) -> str:
    data = build_4d_array(hp, mask, proton=proton, n4=n4, defect=defect, ci=ci)
    savepath = os.path.join(filepath, file_name + "_dataArray.nii")
    nifti.save(savepath, data, affine=np.eye(4))
    return savepath


def dicom_to_json(ds: dcm.Dataset, json_path: str,
                  include_private: bool = True) -> str:
    with open(json_path, "w") as f:
        json.dump(dcm.dicom_to_dict(ds, include_private), f, indent=4)
    return json_path


def _defect_rgb(n4: np.ndarray, defect: np.ndarray) -> np.ndarray:
    """uint8 RGB stack: normalized |N4| gray, defect voxels pure red
    (Vent_Analysis.py:387-391)."""
    bw = (normalize(np.abs(n4)) * 255).astype(np.uint8)
    rgb = np.zeros((*n4.shape, 3), np.uint8)
    rgb[..., 0] = bw * (defect == 0) + 255 * (defect == 1)
    rgb[..., 1] = bw * (defect == 0)
    rgb[..., 2] = bw * (defect == 0)
    return rgb


def export_dicom(
    ds: dcm.Dataset,
    n4: np.ndarray,
    defect: np.ndarray,
    save_dir: str,
    optional_text: str = "",
    for_pacs: bool = True,
    vdp: Optional[float] = None,
    patient_name: str = "",
    transfer_syntax: str = dcm.EXPLICIT_VR_LE,
) -> str:
    """Write the defect-overlay DICOM(s); returns the output path.

    transfer_syntax=dcm.RLE_LOSSLESS writes compressed overlays — real
    scanner overlays are background-dominated, so RLE typically shrinks
    them severalfold (pure-noise synthetic images can expand slightly;
    RLE is lossless either way).  Any PACS that accepts the reference's
    exports accepts this standard syntax too.
    """
    rgb = _defect_rgb(n4, defect)
    ds = ds.copy()
    desc_vdp = np.round(vdp, 1) if vdp is not None else ""
    ds.SeriesDescription = f"{optional_text} - VDP: {desc_vdp}"
    ds.SamplesPerPixel = 3
    ds.PhotometricInterpretation = "RGB"
    ds.PlanarConfiguration = 0
    ds.BitsAllocated = 8
    ds.BitsStored = 8
    ds.HighBit = 7
    ds.PixelRepresentation = 0
    if not for_pacs:
        frames = np.transpose(rgb, (2, 0, 1, 3))  # slices first for export
        ds.Rows, ds.Columns = rgb.shape[0], rgb.shape[1]
        ds.NumberOfFrames = rgb.shape[2]
        uid = dcm.generate_uid()
        ds.SOPInstanceUID = uid
        ds.SeriesInstanceUID = uid
        ds.add((0x7FE0, 0x0010), "OB", frames.tobytes())
        save_path = os.path.join(save_dir, f"{patient_name}_defectDICOM.dcm")
        ds.save_as(save_path, transfer_syntax=transfer_syntax)
        return save_path
    ds.SeriesInstanceUID = dcm.generate_uid()
    dicom_path = os.path.join(save_dir, "defectDICOMS")
    os.makedirs(dicom_path, exist_ok=True)
    ds.NumberOfFrames = 1
    for i in range(rgb.shape[2]):
        frame = rgb[:, :, i, :]
        ds.Rows, ds.Columns = frame.shape[0], frame.shape[1]
        ds.add((0x7FE0, 0x0010), "OB", frame.tobytes())
        ds.InstanceNumber = i + 1
        ds.SliceLocation = float(i)
        ds.SOPInstanceUID = dcm.generate_uid()
        ds.save_as(os.path.join(dicom_path, f"dicom_{i}.dcm"),
                   transfer_syntax=transfer_syntax)
    return dicom_path


ARTIFACT_VERSION = 1
_MANIFEST_KEY = "__ventjax_artifact__"


def _json_safe(x):
    """Best-effort JSON conversion for manifest values (DICOM header values,
    numpy scalars, nested metadata dicts); anything else becomes str(x)."""
    if x is None or isinstance(x, (str, bool)):
        return x
    if isinstance(x, (int, np.integer)):
        return int(x)
    if isinstance(x, (float, np.floating)):
        return float(x)
    if isinstance(x, (list, tuple)):
        return [_json_safe(v) for v in x]
    if isinstance(x, dict):
        return {str(k): _json_safe(v) for k, v in x.items()}
    return str(x)


def save_npz(state: Dict, npz_path: str) -> str:
    """Versioned, dependency-free study artifact (SURVEY.md §5 checkpoint
    plan: "a versioned study artifact (NPZ per subject ...)").

    Unlike the pickle — which mirrors the reference's checkpoint format
    (Vent_Analysis.py:542-553) and executes arbitrary opcodes on load —
    the NPZ is a plain `np.savez_compressed` file: every ndarray attribute
    as a named compressed array plus one JSON manifest string holding the
    metadata dict, scalar attributes, and the VentConfig.  It loads with
    `np.load(path, allow_pickle=False)` anywhere NumPy exists, with no
    ventjax (or pydicom) import required.

    Non-array, non-scalar objects (the DICOM `ds`, a parsed twix object)
    are recorded by type name under the manifest's "skipped" key — the NPZ
    is the portable *analysis* artifact; raw-input state stays with the
    pickle path.
    """
    import dataclasses

    arrays: Dict[str, np.ndarray] = {}
    scalars: Dict = {}
    dicts: Dict = {}
    skipped: Dict[str, str] = {}
    config = None
    for key, value in state.items():
        if key == _MANIFEST_KEY:
            continue
        if isinstance(value, (np.integer, np.floating, np.bool_)):
            scalars[key] = _json_safe(value)
        elif isinstance(value, np.ndarray) or (
            hasattr(value, "__array__") and not isinstance(value, dict)
        ):
            arr = np.asarray(value)
            if arr.dtype == object:  # not loadable without allow_pickle
                skipped[key] = f"object-dtype array {arr.shape}"
            else:
                arrays[key] = arr
        elif (key == "config" and dataclasses.is_dataclass(value)
              and not isinstance(value, type)):
            # Only the VentConfig slot is a dataclass the manifest knows how
            # to restore; OTHER dataclasses (a parsed TwixScan in raw_twix,
            # say) carry ndarray fields that would crash json.dumps — they
            # are recorded as skipped like any opaque object.
            config = dataclasses.asdict(value)
        elif isinstance(value, dict):
            dicts[key] = _json_safe(value)
        elif value is None or isinstance(value, (str, bool, int, float)):
            scalars[key] = value
        elif isinstance(value, (list, tuple)):
            scalars[key] = _json_safe(value)
        else:
            skipped[key] = type(value).__name__
    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "scalars": scalars,
        "dicts": dicts,
        "config": config,
        "skipped": skipped,
    }
    # np.savez_compressed appends ".npz" to suffix-less paths; normalize
    # first so the returned path always names the file actually written.
    if not npz_path.endswith(".npz"):
        npz_path += ".npz"
    np.savez_compressed(
        npz_path, **arrays,
        **{_MANIFEST_KEY: np.asarray(json.dumps(manifest))},
    )
    return npz_path


def load_npz(npz_path: str) -> Dict:
    """Load a save_npz artifact back into a state dict (the unPickleMe
    shape): arrays by name, scalars/dicts from the manifest, and the
    VentConfig reconstructed when its fields still match this version.

    Artifacts written by a NEWER ventjax (higher artifact_version) raise a
    clear ValueError instead of silently dropping whatever the newer format
    added.  Corrupt/truncated files raise ValueError too — np.load's
    internals otherwise leak zipfile.BadZipFile, zlib.error, and even
    tokenize.TokenError (its .npy header parser) on mutated bytes."""
    import tokenize
    import zipfile
    import zlib

    with open(npz_path, "rb") as f:
        if f.read(2) != b"PK":
            # Not a zip container at all: np.load would fall through to its
            # pickle loader and emit a misleading "pickled data" error.
            raise ValueError(f"{npz_path} is not an NPZ file (no zip magic)")
    try:
        with np.load(npz_path, allow_pickle=False) as z:
            if _MANIFEST_KEY not in z.files:
                raise ValueError(
                    f"{npz_path} is not a ventjax study artifact "
                    f"(missing {_MANIFEST_KEY} manifest)")
            manifest = json.loads(str(z[_MANIFEST_KEY]))
            version = manifest.get("artifact_version")
            if not isinstance(version, int) or version > ARTIFACT_VERSION:
                raise ValueError(
                    f"{npz_path} has artifact_version {version!r}; this "
                    f"ventjax reads up to {ARTIFACT_VERSION}. Upgrade "
                    f"ventjax to load it.")
            state: Dict = {k: z[k] for k in z.files if k != _MANIFEST_KEY}
    except (zipfile.BadZipFile, zlib.error, tokenize.TokenError) as e:
        raise ValueError(
            f"{npz_path} is corrupt or not an NPZ file: {e}") from e
    state.update(manifest.get("scalars", {}))
    state.update(manifest.get("dicts", {}))
    cfg = manifest.get("config")
    if cfg is not None:
        from ventjax.config import VentConfig

        # Field drift across versions: unknown keys are dropped (with a
        # warning) and missing ones take current defaults, so downstream
        # consumers (exportHistogram/screenShot) always see a VentConfig,
        # never a raw dict that would AttributeError far from the load site.
        known = {f.name for f in dataclasses.fields(VentConfig)}
        dropped = sorted(set(cfg) - known)
        if dropped:
            warnings.warn(
                f"{npz_path}: artifact config keys {dropped} are unknown to "
                f"this ventjax version; loading with current defaults",
                stacklevel=2)
        state["config"] = VentConfig(
            **{k: tuple(v) if isinstance(v, list) else v
               for k, v in cfg.items() if k in known})
    return state


def save_pickle(state: Dict, pickle_path: str) -> str:
    """Pickle every picklable entry of a study state dict
    (the reference's checkpoint format, Vent_Analysis.py:542-553)."""
    out = {}
    for key, value in state.items():
        try:
            pickle.dumps(value)
            out[key] = value
        except (pickle.PicklingError, AttributeError, TypeError):
            # the reference's exact skip set (Vent_Analysis.py:548-549);
            # anything else propagates there too
            continue
    with open(pickle_path, "wb") as f:
        pickle.dump(out, f)
    return pickle_path


# Modules the reference environment has but this one does not.  A pickle
# written by the actual reference class (Vent_Analysis.py:542-553 pickles
# self.__dict__ wholesale) embeds pydicom Dataset objects under its 'ds'
# key; loading that here without detection would die inside pickle with an
# opaque ModuleNotFoundError.
_FOREIGN_MODULES = ("pydicom", "mapVbVd", "mapvbvd", "SimpleITK", "PyQt5",
                    "pyqtgraph", "nibabel")


class ReferencePickleError(RuntimeError):
    """A pickle written by the reference app embeds objects from modules
    unavailable here (pydicom etc.)."""


class ForeignStub:
    """Placeholder for an unpicklable foreign object (strip_foreign=True).

    Captures whatever state pickle hands it so nothing crashes; repr names
    the original class so users can see what was dropped."""

    _foreign_class = "?"

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__["_foreign_state"] = state

    def append(self, *a, **k):  # pydicom pickles some list-like containers
        pass

    def extend(self, *a, **k):
        pass

    def __setitem__(self, *a, **k):  # dict-like containers (SETITEMS opcode)
        pass

    def update(self, *a, **k):
        pass

    def __repr__(self):
        return f"<ForeignStub of {self._foreign_class}>"


class _DetectingUnpickler(pickle.Unpickler):
    def __init__(self, f, strip_foreign: bool):
        super().__init__(f)
        self._strip = strip_foreign
        self.foreign_classes: list = []

    def find_class(self, module, name):
        if module.split(".")[0] in _FOREIGN_MODULES:
            qual = f"{module}.{name}"
            self.foreign_classes.append(qual)
            if not self._strip:
                raise ReferencePickleError(
                    f"{qual} inside this pickle: it was written by the "
                    "reference Vent_Analysis app, which embeds raw "
                    f"{module.split('.')[0]} objects in its state "
                    "(Vent_Analysis.py pickleMe). Options: (1) load with "
                    "load_pickle(path, strip_foreign=True) to replace them "
                    "with placeholders (all array/metric state is kept), or "
                    "(2) in an environment with the reference installed, "
                    "re-save after deleting the 'ds' attribute."
                )
            stub = type(f"ForeignStub_{name}", (ForeignStub,),
                        {"_foreign_class": qual})
            return stub
        return super().find_class(module, name)


def load_pickle(pickle_path: str, strip_foreign: bool = False) -> Dict:
    """Load a study-state pickle (ours or the reference app's).

    Reference-written pickles embed pydicom objects; by default loading one
    raises ReferencePickleError with the conversion options instead of an
    opaque ModuleNotFoundError.  strip_foreign=True substitutes ForeignStub
    placeholders and returns the rest of the state."""
    with open(pickle_path, "rb") as f:
        u = _DetectingUnpickler(f, strip_foreign)
        return u.load()


def study_filename(irb: str, metadata: Dict, **fields) -> str:
    """The GUI's export filename grammar (Vent_Analysis.py:961-984).

    irb in {'genxe', 'mepo', 'clinical'}; fields supply the study-specific
    ids/flags (genxe_id, treatment, mepo_id, visit, clinical_id, ...).
    """
    date = str(metadata.get("StudyDate", ""))[2:]
    irb = irb.lower()
    if irb == "genxe":
        name = f"Xe-{fields.get('genxe_id', '0000')}_{date}"
        t = fields.get("treatment", "")
        suffix = {"preAlbuterol": "_preAlb", "postAlbuterol": "_postAlb",
                  "preSildenafil": "_preSil", "postSildenafil": "_postSil"}
        name += suffix.get(t, "")
        return name
    if irb == "mepo":
        name = f"Mepo{fields.get('mepo_id', '0000')}_{date}"
        visit = fields.get("visit")
        if visit:
            name += f"_visit{visit}"
        t = fields.get("treatment", "")
        if t in ("preAlb", "postAlb"):
            name += f"_{t}"
        return name
    if irb == "clinical":
        name = (f"Clinical_{fields.get('clinical_id', '')}_{date}"
                f"_visit{fields.get('visit', 0)}")
        t = fields.get("treatment", "")
        if t == "Albuterol":
            name += "_Albuterol"
        elif t == "baseline":
            name += "_baseline"
        # neither radio selected -> no suffix (Vent_Analysis.py:982-984)
        return name
    raise ValueError(f"unknown IRB study type {irb!r}")
