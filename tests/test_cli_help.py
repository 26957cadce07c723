"""`--help` must render for every repo-root CLI.

Regression for a real crash: argparse expands ``%`` conversions inside help
strings, so a literal ``%`` (e.g. "Measured +2%") must be escaped as ``%%`` —
otherwise ``--help`` raises ValueError instead of printing usage. The CLIs
parse args inside their ``__main__`` blocks, so each is executed via runpy
with ``--help``; parse_args raises SystemExit(0) before any real work runs
(imports are shared with the test process, so this stays fast).
"""

import pathlib
import runpy
import sys

import pytest

pytestmark = pytest.mark.quick

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

REPO_CLIS = [
    "train.py",
    "clean.py",
    "serve.py",
    "eval_noisy_performance.py",
    "purge_ckpts.py",
    "weight_converter.py",
    "select_speakers.py",
    "bench.py",
]


@pytest.mark.parametrize("cli", REPO_CLIS)
def test_help_renders(cli, monkeypatch, capsys):
    path = REPO_ROOT / cli
    monkeypatch.setattr(sys, "argv", [cli, "--help"])
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(str(path), run_name="__main__")
    assert exc.value.code in (0, None)
    out = capsys.readouterr().out
    assert "usage" in out.lower()
