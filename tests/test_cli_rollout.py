"""Drive both paths of the rollout CLI (the reference's demo-script role).

Covers SURVEY.md §2.1 "Demo / training script(s)": ``--render`` plays the
CPU oracle with ASCII frames; the default path runs a batched device rollout
and prints episode statistics.  Runs on the 8-device CPU sim (conftest).
"""

from blockpuzzle_tpu.cli import rollout


def test_render_path_plays_an_episode(capsys):
    rc = rollout.main(["--render", "--steps", "40", "--seed", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    # ASCII frames: board glyphs + the status line from the oracle render
    assert "·" in out or "█" in out
    assert "queue:" in out


def test_batched_path_reports_episode_stats(capsys):
    rc = rollout.main(["--num-envs", "64", "--steps", "100", "--seed", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    # one summary line: steps, steady-state rate, episode stats
    assert "env-steps" in out
    assert "episodes" in out
    # 64 envs x 200 steps (1 warmup + 1 measured chunk of 100) on the
    # default preset: plenty of finished episodes (mean length ~18)
    episodes = int(out.split("episodes")[1].split("|")[0].strip())
    assert episodes > 0


def test_env_overrides_reach_the_engine(capsys):
    rc = rollout.main([
        "--num-envs", "16", "--steps", "10", "--seed", "3",
        "--env", "streak_bonus=5", "--env", "piece_set=mini5",
        "--env", "height=5", "--env", "width=5",
    ])
    assert rc == 0
    assert "env-steps" in capsys.readouterr().out


def test_env_overrides_reject_unknown_key(capsys):
    import pytest

    with pytest.raises(SystemExit) as e:
        rollout.main(["--env", "bogus=1"])
    assert "unknown EnvConfig field" in str(e.value)


def test_batched_path_rounds_steps_to_one_chunk(capsys):
    # --steps below the 100-step chunk still runs exactly one chunk
    rc = rollout.main(["--num-envs", "32", "--steps", "10", "--seed", "2"])
    assert rc == 0
    assert "3200 env-steps" in capsys.readouterr().out
