"""Packaging contract (round-4, VERDICT r3 ask #4): the engine installs
as a distribution — `pip install -e .` (PEP 660) where the toolchain
supports it, `setup.py develop` as the offline fallback — and
`import validr_spark` + the `validr-spark` console script work from a
clean cwd.  Reference analog: validr ships setup.py/MANIFEST.in
(/root/reference/setup.py); here pyproject.toml is canonical.

Creates a throwaway venv (--system-site-packages so pyspark/numpy stay
visible) — ~15 s, no Spark session.
"""
import os
import subprocess
import sys
import venv

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def venv_python(tmp_path_factory):
    vdir = tmp_path_factory.mktemp("pkgvenv")
    venv.EnvBuilder(system_site_packages=True, with_pip=True,
                    symlinks=True).create(vdir)
    py = os.path.join(vdir, "bin", "python")
    # PEP 660 editable first; fall back to the legacy develop path when
    # setuptools lacks a vendored bdist_wheel (offline CI, no `wheel`)
    r = subprocess.run(
        [py, "-m", "pip", "install", "-e", REPO,
         "--no-build-isolation", "--no-deps", "-q"],
        capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        r2 = subprocess.run([py, os.path.join(REPO, "setup.py"),
                             "develop", "--no-deps"],
                            capture_output=True, text=True, cwd=REPO)
        assert r2.returncode == 0, (
            f"pip -e failed:\n{r.stderr[-2000:]}\n"
            f"setup.py develop failed:\n{r2.stderr[-2000:]}")
    return py


def test_editable_install_imports_from_clean_cwd(venv_python, tmp_path):
    out = subprocess.run(
        [venv_python, "-c",
         "import validr_spark; from validr_spark import T, modelclass, "
         "SparkCompiler; print(validr_spark.__file__)"],
        capture_output=True, text=True, cwd=tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "validr_spark" in out.stdout


def test_console_script_installed(venv_python, tmp_path):
    script = os.path.join(os.path.dirname(venv_python), "validr-spark")
    assert os.path.exists(script)
    out = subprocess.run([script, "--help"], capture_output=True,
                         text=True, cwd=tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "validate" in out.stdout


def test_pyproject_metadata_complete():
    try:
        import tomllib
    except ImportError:  # pragma: no cover - py<3.11
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "validr-spark"
    deps = " ".join(proj["dependencies"])
    for d in ("pyspark", "numpy", "pandas", "pyarrow"):
        assert d in deps
    # typed-package marker ships with the dist
    assert os.path.exists(os.path.join(REPO, "validr_spark", "py.typed"))
    # dist version and runtime __version__ stay in lockstep
    import validr_spark

    assert validr_spark.__version__ == proj["version"]
