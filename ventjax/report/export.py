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

import json
import os
import pickle
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


def save_pickle(state: Dict, pickle_path: str) -> str:
    """Pickle every picklable entry of a study state dict
    (the reference's checkpoint format, Vent_Analysis.py:542-553)."""
    out = {}
    for key, value in state.items():
        try:
            pickle.dumps(value)
            out[key] = value
        except Exception:
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
