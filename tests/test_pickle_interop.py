"""Reference-pickle interop detection (round-2 VERDICT item 7).

The actual reference class pickles ``self.__dict__`` wholesale
(reference Vent_Analysis.py:542-553), which embeds pydicom ``Dataset`` /
``FileDataset`` objects under its ``ds`` key.  pydicom does not exist in
this environment, so such a pickle cannot fully unpickle — the load must
produce a clear actionable error (or, with strip_foreign=True, placeholders
plus the intact array/metric state), never an opaque ModuleNotFoundError.

The reference pickle is constructed here via a stub module registered as
``pydicom.dataset`` so pickling records the same global references a real
reference-written pickle carries.
"""
import pickle
import sys
import types

import numpy as np
import pytest

from ventjax.report.export import (
    ForeignStub,
    ReferencePickleError,
    load_pickle,
    save_pickle,
)


def _write_referencelike_pickle(path):
    """Build a pickle whose byte stream references pydicom.dataset.FileDataset,
    exactly like one written by the reference app on a machine with pydicom."""
    mod = types.ModuleType("pydicom.dataset")

    class FileDataset:
        def __init__(self):
            self.PatientName = "REF^SUBJECT"
            self.Rows = 128

    FileDataset.__module__ = "pydicom.dataset"
    FileDataset.__qualname__ = "FileDataset"
    mod.FileDataset = FileDataset
    pkg = types.ModuleType("pydicom")
    pkg.dataset = mod
    sys.modules["pydicom"] = pkg
    sys.modules["pydicom.dataset"] = mod
    try:
        state = {
            "version": "250133_RPT",
            "ds": FileDataset(),
            "HPvent": np.arange(12.0).reshape(3, 4),
            "mask": np.ones((3, 4)),
            "metadata": {"PatientName": "REF^SUBJECT", "VDP": 7.5},
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)
    finally:
        del sys.modules["pydicom"]
        del sys.modules["pydicom.dataset"]


def test_reference_pickle_raises_actionable_error(tmp_path):
    p = str(tmp_path / "ref.pkl")
    _write_referencelike_pickle(p)
    assert "pydicom" not in sys.modules  # the stub must be gone
    with pytest.raises(ReferencePickleError) as ei:
        load_pickle(p)
    msg = str(ei.value)
    assert "pydicom" in msg
    assert "strip_foreign" in msg  # the documented conversion path


def test_reference_pickle_strip_foreign_recovers_state(tmp_path):
    p = str(tmp_path / "ref.pkl")
    _write_referencelike_pickle(p)
    state = load_pickle(p, strip_foreign=True)
    assert isinstance(state["ds"], ForeignStub)
    assert "pydicom.dataset.FileDataset" in repr(state["ds"])
    np.testing.assert_array_equal(
        state["HPvent"], np.arange(12.0).reshape(3, 4))
    assert state["metadata"]["VDP"] == 7.5
    assert state["version"] == "250133_RPT"


def test_reference_pickle_via_compat_ctor(tmp_path):
    """The compat ctor resume path surfaces the same actionable error."""
    from ventjax.compat.vent_analysis import Vent_Analysis

    p = str(tmp_path / "ref.pkl")
    _write_referencelike_pickle(p)
    with pytest.raises(ReferencePickleError):
        Vent_Analysis(pickle_path=p)


def test_own_pickles_unaffected(tmp_path):
    p = str(tmp_path / "own.pkl")
    save_pickle({"a": np.zeros(3), "b": 2}, p)
    state = load_pickle(p)
    assert state["b"] == 2
