"""The --py-files artifact (lshse.zip) must stay fresh and importable.

The north rule ships the engine to executors via
``spark-submit --py-files lshse.zip`` (README quick-start;
run_pipeline.py `package`). A stale zip is the classic silent failure:
the driver imports the working tree while executors import last week's
code. These tests pin the committed artifact to the source tree and
prove the zip alone is importable (zipimport — exactly how a Spark
executor resolves --py-files), with no Spark session involved.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "large_scale_hypertextual_search_engine_spark"
ZIP = os.path.join(ROOT, "lshse.zip")  # .gitignored build artifact


def _run_package_cmd():
    """Invoke run_pipeline.py's `package` entry in-process."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_pipeline_for_test", os.path.join(ROOT, "run_pipeline.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class _Args:
        pass

    mod.cmd_package(_Args())


@pytest.fixture(scope="module")
def built_zip():
    """Build lshse.zip fresh from the current tree (it is .gitignored,
    so a clean checkout has none — the `package` command is the only
    producer and is what this module is testing)."""
    _run_package_cmd()
    return ZIP


def _tree_files() -> dict[str, bytes]:
    out = {}
    for dirpath, _, files in os.walk(os.path.join(ROOT, PKG)):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, ROOT)] = f.read()
    return out


def test_zip_matches_tree_exactly(built_zip):
    """`package` puts every package .py in the zip with identical
    bytes and nothing else — no module silently left behind on the
    driver while executors import the zip."""
    tree = _tree_files()
    assert len(tree) > 40  # sanity: the walk found the real package
    with zipfile.ZipFile(built_zip) as z:
        names = set(z.namelist())
        assert names == set(tree), (
            f"missing={sorted(set(tree) - names)[:5]} extra={sorted(names - set(tree))[:5]}"
        )
        for name, want in tree.items():
            assert z.read(name) == want, f"stale content in zip: {name}"


def test_zip_importable_via_zipimport(built_zip):
    """A bare interpreter with ONLY the zip on sys.path imports the
    package and its heaviest modules — the executor-side --py-files
    contract."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        f"import {PKG}\n"
        f"import {PKG}.operators.index_build as ib\n"
        f"import {PKG}.operators.wand as w\n"
        f"import {PKG}.functions.varbyte as vb\n"
        f"import {PKG}.plans.lineage as ln\n"
        f"assert {PKG}.__file__.startswith(sys.argv[1]), {PKG}.__file__\n"
        "print('ok')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, built_zip],
        capture_output=True,
        text=True,
        cwd="/tmp",
        env={**os.environ, "PYTHONPATH": ""},
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"


def test_package_command_is_deterministic(built_zip):
    """Two rebuilds over the same tree -> identical member set and
    per-member CRCs (no duplicate names, no walk-order surprises)."""

    def _crcs():
        with zipfile.ZipFile(ZIP) as z:
            infos = z.infolist()
            names = [i.filename for i in infos]
            assert sorted(names) == sorted(set(names))
            return {i.filename: i.CRC for i in infos}

    first = _crcs()
    _run_package_cmd()
    assert _crcs() == first
