"""Smoke-run scripts/sweep_ppo.py — the harness behind the recorded PPO
quality results (docs/RESULTS.md cites it as the reproduce command).

Tiny shapes on the CPU backend; asserts the per-config JSON line and the
final summary parse and carry the expected keys.
"""

import json
import pathlib
import subprocess
import sys


def test_sweep_smoke_produces_summary(tmp_path):
    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            sys.executable,
            str(repo / "scripts" / "sweep_ppo.py"),
            "--configs", "base",
            "--updates", "2",
            "--num-envs", "16",
            "--rollout-len", "8",
            "--eval-envs", "8",
            "--eval-steps", "32",
            "--platform", "cpu",
            "--torso", "mlp",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(repo),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 2, r.stdout
    per_config = json.loads(lines[0])
    assert per_config["config"] == "base"
    assert "greedy_return" in per_config and "frames_per_s" in per_config
    summary = json.loads(lines[-1])
    assert summary["best"] == "base"
    # the best config's TrainState was checkpointed for cli.evaluate
    assert (tmp_path / "ckpt").exists()
