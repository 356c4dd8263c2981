"""scripts/compare_metrics.py — the bit-exact determinism comparator the
RESULTS.md probes cite.  Pure host-side JSON handling: fast lane.

Pins the exit-code contract (0 = identical, 1 = any divergence, 2 =
usage / no common rows) and the hyper-vs-device-math CLASSIFICATION —
including the round-5 KL-clip controller fields (clip_mult / clip_eps),
whose omission from HYPER_FIELDS would misreport a clip A/B as a
device-math determinism failure (review finding, fixed same commit).
"""

import json
import pathlib
import subprocess
import sys

SCRIPT = str(
    pathlib.Path(__file__).resolve().parent.parent
    / "scripts" / "compare_metrics.py"
)

BASE_ROW = {
    "config": "base", "update": 1, "ent_mult": 1.0, "lr": 3e-4,
    "entropy_coef": 0.01, "clip_mult": 1.0, "clip_eps": 0.2,
    "loss": 1.25, "entropy": 2.5, "approx_kl": 0.001,
}


def _write(path, rows):
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return str(path)


def _run(*paths):
    return subprocess.run(
        [sys.executable, SCRIPT, *paths], capture_output=True, text=True
    )


def test_identical_streams_exit_zero(tmp_path):
    a = _write(tmp_path / "a.jsonl", [BASE_ROW])
    b = _write(tmp_path / "b.jsonl", [BASE_ROW])
    r = _run(a, b)
    assert r.returncode == 0, r.stdout
    assert "IDENTICAL" in r.stdout


def test_device_math_divergence_classified(tmp_path):
    a = _write(tmp_path / "a.jsonl", [BASE_ROW])
    b = _write(tmp_path / "b.jsonl", [{**BASE_ROW, "loss": 1.26}])
    r = _run(a, b)
    assert r.returncode == 1
    assert "DEVICE MATH" in r.stdout and "loss" in r.stdout


def test_clip_controller_fields_are_hyper_not_math(tmp_path):
    """A KL-clip A/B (clip_mult/clip_eps differ, device fields equal) must
    report HYPER INPUT divergence, never DEVICE MATH."""
    a = _write(tmp_path / "a.jsonl", [BASE_ROW])
    b = _write(
        tmp_path / "b.jsonl",
        [{**BASE_ROW, "clip_mult": 0.6667, "clip_eps": 0.1333}],
    )
    r = _run(a, b)
    assert r.returncode == 1  # not same-input: determinism not judgeable
    assert "HYPER INPUT" in r.stdout
    assert "DEVICE MATH" not in r.stdout
    assert "device-math fields identical" in r.stdout


def test_no_common_rows_exits_two(tmp_path):
    a = _write(tmp_path / "a.jsonl", [BASE_ROW])
    b = _write(tmp_path / "b.jsonl", [{**BASE_ROW, "update": 2}])
    assert _run(a, b).returncode == 2
