"""The examples/ scripts stay runnable (small arguments)."""

import os
import runpy
import sys

import pytest

EX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(EX, name), run_name="__main__")
    finally:
        sys.argv = old


def test_cantilever_example(capsys):
    _run("cantilever.py", ["8", "3", "3"])
    out = capsys.readouterr().out
    assert "tip deflection" in out and "von Mises" in out


def test_homogenize_voxels_example(capsys, tmp_path):
    _run("homogenize_voxels.py", ["4"])
    out = capsys.readouterr().out
    assert "effective C^h" in out
