"""GUI controller: the reference event loop's behavior, headless.

Covers every event branch of the reference's PySimpleGUI loop
(Vent_Analysis.py:784-1013) through ventjax.gui.controller: load / VDP /
CI / TWIX / pickle / clear-cache / export (validations, filename grammar,
archive color logic), plus the pane and data-label feeds the view renders.
The tkinter view itself is import-smoked; opening a window needs a display
this VM does not have.
"""
import os

import numpy as np
import pytest

from ventjax.config import DEFAULT_CONFIG
from ventjax.gui.controller import DONE, IDLE, GuiState, VentController
from ventjax.io.synthetic import write_study

FAST_CFG = DEFAULT_CONFIG.replace(ci_max_defect_voxels=1024)


@pytest.fixture(scope="module")
def study_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gui_study")
    write_study(str(root), shape=(64, 64, 8), vox=(1.5, 1.5, 10.0), seed=6)
    return str(root)


@pytest.fixture()
def ctl(study_root, tmp_path):
    state = GuiState(
        dicom_path=f"{study_root}/xenon.dcm",
        mask_path=f"{study_root}/mask",
        proton_path=f"{study_root}/proton.dcm",
        export_path=str(tmp_path / "out"),
    )
    return VentController(state, config=FAST_CFG)


def test_initial_state_blank_panes():
    c = VentController()
    assert c.buttons == {b: IDLE for b in c.buttons}
    panes = c.pane_images()
    assert set(panes) == {"twix", "proton", "raw", "n4", "defect", "ci"}
    for p in panes.values():
        assert p.shape == (3, 3, 3) and not p.any()
    assert c.data_summary() == {}


def test_load_error_status_matches_reference():
    c = VentController(GuiState(dicom_path="/nope.dcm", mask_path="/nope"))
    assert not c.load_from_paths()
    assert c.status.color == "red"
    assert c.status.text.startswith(
        "ERROR: Uhh you messed something up.")
    assert c.buttons["initialize"] == IDLE and c.study is None


def test_full_flow_load_vdp_ci(ctl):
    assert ctl.load_from_paths()
    assert (ctl.status.text, ctl.status.color) == (
        "Vent_Analysis loaded", "green")
    assert ctl.buttons["initialize"] == DONE

    summary = ctl.data_summary()
    assert summary["subject"] == "Subject: VENTJAX^PHANTOM"
    assert summary["vox"] == "DICOM voxel Size: [1.5, 1.5, 10.0] [mm]"
    assert summary["ventarrayshape"] == "Ventilation Array Shape: (64, 64, 8)"

    # VDP not yet run: defect/ci panes fall back to the 3x3 placeholder
    panes = ctl.pane_images()
    assert panes["proton"].shape[0] > 3 and panes["raw"].shape[0] > 3
    assert panes["n4"].shape == (3, 3, 3)

    assert ctl.calculate_vdp()
    assert (ctl.status.text, ctl.status.color) == ("VDP Calculated", "green")
    assert ctl.buttons["calcvdp"] == DONE
    vdp = float(ctl.study.metadata["VDP"])
    assert 0 < vdp < 50
    assert ctl.pane_images()["defect"].shape[0] > 3

    assert ctl.calculate_ci()
    assert ctl.status.text == "CI Calculated successfully"
    assert ctl.buttons["calcci"] == DONE
    assert ctl.pane_images()["ci"].shape[0] > 3
    assert "CI:" in ctl.data_summary()["ci"]


def test_calc_before_load_is_red_not_crash():
    c = VentController()
    assert not c.calculate_vdp()
    assert c.status.color == "red" and "VDP" in c.status.text
    assert not c.calculate_ci()
    assert c.status.color == "red"


def test_export_validations_and_grammar(ctl, tmp_path):
    ctl.load_from_paths()
    ctl.calculate_vdp()

    # user missing -> reference's exact nag, nothing written
    assert not ctl.export(today="250101")
    assert ctl.status.text.startswith("Don't forget to enter your Name")
    assert not os.path.exists(ctl.state.export_path)

    ctl.state.user = "RPT"
    assert not ctl.export(today="250101")
    assert ctl.status.text.startswith("Don't forget to select an IRB!")

    ctl.select_irb("mepo")
    ctl.state.mepo_id = "0039"
    ctl.state.mepo_visit = "2"
    ctl.state.mepo_treatment = "preAlb"
    ctl.state.de, ctl.state.fev1, ctl.state.fvc = "1000", "85", "90"
    ctl.state.notes = "gui test"
    assert ctl.export(today="250101")
    # archive box checked (default) but no archive path -> orange
    assert ctl.status.color == "orange"
    assert "Exported but not Archived" in ctl.status.text
    assert ctl.buttons["export"] == DONE

    base = "Mepo0039_240301_visit2_preAlb"  # StudyDate 20240301 -> 240301
    exp_dir = os.path.join(ctl.state.export_path, "VentAnalysis_RPT_250101")
    files = set(os.listdir(exp_dir))
    assert {f"{base}.json", f"{base}.pkl", f"{base}.png",
            f"{base}_dataArray.nii", "defectDICOMS"} <= files
    md = ctl.study.metadata
    assert md["fileName"] == base and md["IRB"] == "mepo"
    assert md["visit"] == 2 and md["treatment"] == "preAlb"
    assert (md["DE"], md["FEV1"], md["FVC"]) == ("1000", "85", "90")
    assert md["notes"] == "gui test" and md["analysisUser"] == "RPT"

    # with a real archive dir -> green + archived pickle copy
    arch = tmp_path / "archive"
    arch.mkdir()
    ctl.state.archive_path = str(arch)
    assert ctl.export(today="250101")
    assert ctl.status.color == "green"
    assert "Exported and Archived" in ctl.status.text
    assert (arch / f"{base}.pkl").exists()


def test_export_filename_genxe_and_clinical(ctl):
    ctl.load_from_paths()
    ctl.select_irb("genxe")
    ctl.state.genxe_id = "0123"
    ctl.state.genxe_treatment = "postSildenafil"
    assert ctl.export_filename() == "Xe-0123_240301_postSil"

    ctl.select_irb("clinical")
    ctl.state.clinical_id = "AB"
    ctl.state.clinical_visit = "3"
    ctl.state.clinical_treatment = "Albuterol"
    assert ctl.export_filename() == "Clinical_AB_240301_visit3_Albuterol"
    ctl.state.clinical_treatment = "baseline"
    assert ctl.export_filename() == "Clinical_AB_240301_visit3_baseline"
    # neither radio selected: the reference appends no suffix
    # (Vent_Analysis.py:982-984)
    ctl.state.clinical_treatment = ""
    assert ctl.export_filename() == "Clinical_AB_240301_visit3"


def test_import_twix_pane_and_labels(ctl, tmp_path):
    from ventjax.io.twix import write_synthetic_twix

    rng = np.random.default_rng(1)
    k = (rng.normal(size=(32, 32, 4)) +
         1j * rng.normal(size=(32, 32, 4))).astype(np.complex64)
    dat = str(tmp_path / "meas.dat")
    write_synthetic_twix(dat, k, protocol_name="vent_gre")
    ctl.load_from_paths()
    ctl.state.twix_path = dat
    assert ctl.import_twix()
    assert ctl.status.text == "TWIX Processed successfully"
    assert ctl.buttons["runtwix"] == DONE
    assert ctl.pane_images()["twix"].shape[0] > 3
    assert "vent_gre" in ctl.data_summary()["twixprotocol"]

    ctl.state.twix_path = "/no/such.dat"
    assert not ctl.import_twix()
    assert ctl.status.color == "red" and "TWIX" in ctl.status.text


def test_edit_metadata_and_clear_cache(ctl):
    ctl.load_from_paths()
    ctl.edit_metadata("PatientName", "EDITED^NAME")
    assert ctl.data_summary()["subject"] == "Subject: EDITED^NAME"

    ctl.select_irb("mepo")
    ctl.state.notes = "scratch"
    ctl.clear_cache()
    assert ctl.study is None and ctl.state.irb is None
    assert ctl.state.notes == ""
    assert all(v == IDLE for v in ctl.buttons.values())
    assert ctl.status.color == "blue"
    assert ctl.irb_panel_visible == {
        "genxe": False, "mepo": False, "clinical": False}


def test_pickle_round_trip_through_controller(ctl, tmp_path):
    ctl.load_from_paths()
    ctl.calculate_vdp()
    pkl = str(tmp_path / "study.pkl")
    ctl.study.pickleMe(pkl)

    c2 = VentController(config=FAST_CFG)
    assert c2.load_pickle(pkl)
    assert c2.status.text == "Vent_Analysis pickle loaded"
    assert c2.buttons["initialize"] == DONE
    np.testing.assert_allclose(
        float(c2.study.metadata["VDP"]), float(ctl.study.metadata["VDP"]))

    assert not c2.load_pickle("/no/such.pkl")
    assert c2.status.color == "red"


def test_irb_selection_controls_panels():
    c = VentController()
    with pytest.raises(ValueError):
        c.select_irb("bogus")
    c.select_irb("genxe")
    assert c.irb_panel_visible == {
        "genxe": True, "mepo": False, "clinical": False}


def test_view_module_imports_headless():
    """The tkinter view must import (and refuse cleanly) without a display."""
    import ventjax.gui.app as app

    assert hasattr(app, "VentApp") and hasattr(app, "launch")
    if not os.environ.get("DISPLAY"):
        with pytest.raises(app.GuiUnavailableError):
            app.launch()


def test_cli_gui_subcommand_headless(monkeypatch, capsys):
    from ventjax.cli import main

    monkeypatch.delenv("DISPLAY", raising=False)
    rc = main(["gui", "--xenon", "/x.dcm", "--mask", "/m"])
    assert rc == 2
    assert "no display" in capsys.readouterr().err


def test_status_observer_sees_in_progress_blue():
    """The view paints in-progress statuses via controller.on_status; the
    observer must see the transient blue 'Calculating VDP...' that the
    final green/red status overwrites (app.py _paint_status wiring)."""
    seen = []
    c = VentController()
    c.on_status = lambda s: seen.append((s.text, s.color))
    c.calculate_vdp()  # no study loaded -> red failure, after the blue
    assert seen[0] == ("Calculating VDP...", "blue")
    assert seen[-1][1] == "red"
