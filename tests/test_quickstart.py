"""Smoke-run examples/quickstart.py — the first thing a new user executes.

Runs as a subprocess with --cpu (the script configures its own platform),
so a drift between the example and the public API fails CI instead of the
user's first five minutes.
"""

import pathlib
import subprocess
import sys
import pytest


@pytest.mark.slow
def test_quickstart_runs_all_sections():
    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "examples" / "quickstart.py"), "--cpu"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # every numbered section printed its result line
    assert "single env final board:" in r.stdout
    assert "vector env: mean reward/step" in r.stdout
    assert "engine: 100x1024 steps" in r.stdout
    assert "train:" in r.stdout
