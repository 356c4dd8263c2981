"""Fault-injection test (SURVEY.md §5 "Failure detection / recovery"):
kill the trainer between updates, restart the process, resume from the
checkpoint, and assert the continued run is bit-identical to an
uninterrupted one.  Runs the real CLI in subprocesses on the CPU backend.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_train(tmp, updates, resume=False, tag="a"):
    cmd = [
        sys.executable, "-m", "blockpuzzle_tpu.cli.train",
        "--algo", "ppo", "--platform", "cpu",
        "--num-envs", "8", "--rollout-len", "4", "--updates", str(updates),
        "--seed", "3", "--log-every", "1",
        "--log-dir", f"{tmp}/logs-{tag}",
        "--checkpoint-dir", f"{tmp}/ckpt",
        "--checkpoint-every", "2",
    ]
    if resume:
        cmd.append("--resume")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def read_metrics(tmp, tag):
    path = f"{tmp}/logs-{tag}/ppo-default.jsonl"
    return [json.loads(l) for l in open(path)]


@pytest.mark.slow
def test_crash_restart_resume_bit_exact(tmp_path):
    tmp = str(tmp_path)
    # uninterrupted 4-update run
    run_train(tmp + "/full", updates=4, tag="full")
    full = read_metrics(tmp + "/full", "full")

    # "crashed" run: 2 updates (checkpoint at 2), then restart + resume to 4
    run_train(tmp + "/crash", updates=2, tag="part1")
    run_train(tmp + "/crash", updates=4, resume=True, tag="part2")
    part2 = read_metrics(tmp + "/crash", "part2")

    # updates 3..4 of the resumed run must match the uninterrupted run
    full_by_step = {m["step"]: m for m in full}
    resumed_by_step = {m["step"]: m for m in part2}
    for step in (3, 4):
        a, b = full_by_step[step], resumed_by_step[step]
        for key in ("loss", "policy_loss", "episode_return", "reward_per_step"):
            np.testing.assert_allclose(
                a[key], b[key], rtol=0, atol=0,
                err_msg=f"step {step} key {key}: {a[key]} != {b[key]}",
            )
