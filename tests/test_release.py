"""Release hygiene (round-5 VERDICT item 7).

- `pip install .` into a fresh venv (system-site-packages so the baked-in
  jax/numpy stack is visible; --no-deps and --no-build-isolation keep the
  test offline) followed by `ventjax doctor` and an import smoke test from
  a foreign cwd — catches packaging rot: missing package-data (the seg
  checkpoint), console-script breakage, imports that only work from the
  repo root.
- every ```python example block in docs/API.md executes — documentation
  imports can't silently rot.
- the CLI table in docs/API.md names only subcommands the parser has.
"""
import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_version_importable():
    import ventjax

    assert re.fullmatch(r"\d+\.\d+\.\d+", ventjax.__version__)
    # pyproject and package version must agree
    pyproject = (REPO / "pyproject.toml").read_text()
    assert f'version = "{ventjax.__version__}"' in pyproject


def test_api_md_python_examples_execute():
    """Every fenced ```python block in docs/API.md runs (they are import
    surfaces; an API rename breaks this test, not a user)."""
    text = (REPO / "docs" / "API.md").read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    assert blocks, "API.md lost its example blocks"
    for block in blocks:
        exec(compile(block, "docs/API.md", "exec"), {})  # noqa: S102


def test_api_md_cli_table_matches_parser():
    from ventjax.cli import build_parser

    text = (REPO / "docs" / "API.md").read_text()
    m = re.search(r"## CLI.*?\n\n(.*?)\n\n", text, re.DOTALL)
    assert m, "API.md lost its CLI table"
    documented = set(re.findall(r"^\| `([a-z-]+)`", m.group(1), re.M))
    assert documented, "CLI table rows not parsed"
    parser = build_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._actions[-1]))
               and hasattr(a, "choices") and a.choices)
    real = set(sub.choices)
    missing = documented - real
    assert not missing, f"API.md documents unknown subcommands: {missing}"


@pytest.mark.slow
def test_pip_install_and_doctor_smoke(tmp_path):
    """Fresh-venv install + `ventjax doctor` from a foreign cwd."""
    venv = tmp_path / "venv"
    r = subprocess.run(
        [sys.executable, "-m", "venv", "--system-site-packages", str(venv)],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"venv creation unavailable: {r.stderr[-200:]}")
    py = venv / "bin" / "python"
    # When the running interpreter is ITSELF a venv (as in this image's
    # /opt/venv), --system-site-packages exposes the BASE python, not our
    # parent's site-packages where jax/setuptools live — link them in.
    import site

    sp_dirs = list(venv.glob("lib/python*/site-packages"))
    assert sp_dirs, "venv has no site-packages dir"
    (sp_dirs[0] / "_parent_env.pth").write_text(
        "\n".join(p for p in site.getsitepackages() if os.path.isdir(p)))
    r = subprocess.run(
        [str(py), "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", str(REPO)],
        capture_output=True, text=True, timeout=600)
    if r.returncode != 0 and "No module named pip" in (r.stderr or ""):
        pytest.skip("venv has no pip")
    assert r.returncode == 0, r.stderr[-2000:]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    # Import + package-data smoke from a cwd far away from the repo.
    code = (
        "import os, ventjax, ventjax.compat, ventjax.pipeline;"
        "from ventjax.models.segmentation import default_checkpoint_path;"
        "p = default_checkpoint_path();"
        "assert os.path.isdir(p), f'seg checkpoint not packaged: {p}';"
        "assert 'site-packages' in ventjax.__file__, ventjax.__file__;"
        "print(ventjax.__version__)"
    )
    r = subprocess.run([str(py), "-c", code], capture_output=True, text=True,
                       cwd=str(tmp_path), env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    doctor = venv / "bin" / "ventjax"
    r = subprocess.run([str(doctor), "doctor"], capture_output=True,
                       text=True, cwd=str(tmp_path), env=env, timeout=900)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
