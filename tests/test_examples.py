"""Smoke tests for the examples/ tutorials (tiny sizes, random backbone).

Keeps the user-facing scripts from rotting; the full-size recipes are in
their module docstrings.
"""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(script: str, argv: list[str], monkeypatch):
    monkeypatch.setattr(
        sys, "argv", [script] + argv
    )
    runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")


def test_registration_tutorial(monkeypatch, capsys):
    _run(
        "feature_extraction_and_registration.py",
        ["--size", "32", "--niter", "8"],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "OK" in out


@pytest.mark.slow
def test_fewshot_tutorial(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(os.getcwd())  # the script os.chdir's into workdir
    _run(
        "fewshot_segmentation.py",
        ["--size", "32", "--crop", "16", "--epochs", "1",
         "--workdir", str(tmp_path)],
        monkeypatch,
    )
    assert "OK" in capsys.readouterr().out


@pytest.mark.slow
def test_synthgen_pretraining_tutorial(tmp_path, monkeypatch, capsys):
    _run(
        "synthgen_and_pretraining.py",
        ["--size", "32", "--n-vols", "3", "--iters", "2",
         "--workdir", str(tmp_path)],
        monkeypatch,
    )
    assert "OK" in capsys.readouterr().out
