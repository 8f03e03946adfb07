"""API-surface parity: every public symbol of the reference is present.

The reference's public surface (its class methods, the CI module functions,
extract_attributes, and get_parula_colormap — enumerated from
Vent_Analysis.py / CI.py / parula_colormap.py) is pinned here by name and,
where the value is behavioral, by default argument.  A user migrating from
the reference (docs/MIGRATION.md) must find every symbol they call.
"""
import inspect

from ventjax.compat import Vent_Analysis, ci_module, extract_attributes
from ventjax.report.parula import get_parula_colormap

# Vent_Analysis.py:58-600 — method name -> {param: behavioral default}
CLASS_METHODS = {
    "openSingleDICOM": {},
    "openDICOMfolder": {},
    "pullDICOMHeader": {},
    "calculateBorder": {},
    "normalize": {},
    "calculate_VDP": {"thresh": 0.6},
    "calculate_CI": {},
    "exportNifti": {},
    "build4DdataArray": {},
    "N4_bias_correction": {},
    "calculate_SNR": {"FOVbuffer": 20, "manualNoise": False},
    "dicom_to_dict": {"include_private": False},
    "dicom_to_json": {"include_private": True},
    "exportDICOM": {"optional_text": "", "forPACS": True},
    "cropToData": {"border": 0, "borderSlices": False},
    "screenShot": {"normalize95": False},
    "process_RAW": {},
    "pickleMe": {},
    "unPickleMe": {},
    "__repr__": {},
    # GUI-scope helpers the reference defines in __main__ (lines 628-645)
    "array3D_to_montage2D": {},
    "colorBinary": {},
}

# CI.py:10-145
CI_FUNCTIONS = {
    "multi_which": {},
    "getSpherePix": {},
    "px2vec": {},
    "vec2px": {},
    "getRadiiIndices": {},
    "calculate_CV": {},
    # vox default is a tuple here (the reference uses a mutable [1,1,1]
    # list default, CI.py:107 — same value, safer spelling)
    "calculate_CI": {"vox": (1, 1, 1), "Rmax": 50},
}


def _check(owner, table, where):
    for name, defaults in table.items():
        fn = getattr(owner, name, None)
        assert callable(fn), f"{where}.{name} missing"
        sig = inspect.signature(fn)
        for param, want in defaults.items():
            assert param in sig.parameters, (where, name, param)
            got = sig.parameters[param].default
            assert got == want, (where, name, param, got, want)


def test_class_surface():
    _check(Vent_Analysis, CLASS_METHODS, "Vent_Analysis")
    # ctor dispatch params (Vent_Analysis.py:58-66)
    sig = inspect.signature(Vent_Analysis.__init__)
    for p in ("xenon_path", "mask_path", "proton_path", "xenon_array",
              "mask_array", "proton_array", "pickle_dict", "pickle_path"):
        assert p in sig.parameters, p
        assert sig.parameters[p].default is None, p


def test_ci_module_surface():
    _check(ci_module, CI_FUNCTIONS, "CI")


def test_module_level_symbols():
    assert callable(extract_attributes)          # Vent_Analysis.py:579
    sig = inspect.signature(extract_attributes)
    assert sig.parameters["sep"].default == "_"
    assert callable(get_parula_colormap)         # parula_colormap.py:5
