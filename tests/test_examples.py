"""The adopter walkthroughs must keep working (VERDICT r05 item 7):
run both examples/ scripts in-process at sf0.001.  They are the first
thing a real adopter hits — a broken quickstart is a broken product
regardless of inventory coverage."""

from __future__ import annotations

import os
import runpy
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(script: str) -> None:
    path = os.path.abspath(os.path.join(_EXAMPLES, script))
    # run as __main__ so the `if __name__ == "__main__": main()` guard
    # fires; the script's get_spark() getOrCreates onto the session the
    # test fixture already started, so no second JVM is launched
    runpy.run_path(path, run_name="__main__")


@pytest.mark.usefixtures("spark")
def test_quickstart_runs_end_to_end(capsys):
    _run("quickstart.py")
    out = capsys.readouterr().out
    assert "reverse(" in out  # geocode section actually produced hits
    assert "documents:" in out  # curation section ran


@pytest.mark.usefixtures("spark")
def test_training_pipeline_runs_end_to_end(capsys):
    _run("training_pipeline.py")
    out = capsys.readouterr().out
    assert "curated corpus:" in out
    assert "pipeline: 500 raw" in out
