"""CPU oracle behavior tests: Gym contract, mechanics, seeding (SURVEY §4.2)."""

import numpy as np
import pytest

import gymnasium

import blockpuzzle_tpu  # noqa: F401 — registers env ids
from blockpuzzle_tpu import rules
from blockpuzzle_tpu.config import default_config, tenten_config, woodoku_config
from blockpuzzle_tpu.oracle import BlockPuzzleOracleEnv, record_trajectory


def test_gymnasium_env_checker():
    from gymnasium.utils.env_checker import check_env

    env = BlockPuzzleOracleEnv(default_config())
    check_env(env, skip_render_check=True)


def test_gym_make_registered_ids():
    for id_ in [
        "BlockPuzzleTpu/BlockPuzzle-v0",
        "BlockPuzzleTpu/BlockPuzzle-tenten-v0",
        "BlockPuzzleTpu/BlockPuzzle-woodoku-v0",
    ]:
        env = gymnasium.make(id_)
        obs, info = env.reset(seed=0)
        assert "board" in obs and "queue" in obs
        env.close()


def test_seeding_is_deterministic():
    a = record_trajectory(default_config(), seed=7, max_steps=64)
    b = record_trajectory(default_config(), seed=7, max_steps=64)
    np.testing.assert_array_equal(a.actions, b.actions)
    np.testing.assert_array_equal(a.boards, b.boards)
    np.testing.assert_array_equal(a.rewards, b.rewards)
    c = record_trajectory(default_config(), seed=8, max_steps=64)
    assert a.episode_return != c.episode_return or len(a.actions) != len(c.actions)


def _env_with_queue(cfg, queue):
    env = BlockPuzzleOracleEnv(cfg)
    env.reset(seed=0)
    env.queue[:] = queue
    return env


def test_single_row_clear_reward():
    cfg = default_config()  # 10x10, queue of 1
    env = _env_with_queue(cfg, [4])  # piece 4 = 1x5 bar
    # place 1x5 at (0,0): legal, no clear
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 0, 0))
    assert info["legal"] and r == 5.0 and info["lines_cleared"] == 0
    # complete row 0 with another 1x5 at (0,5)
    env.queue[:] = [4]
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 0, 5))
    assert info["legal"] and info["lines_cleared"] == 1
    assert r == 5.0 + 10.0  # 5 cells + bonus(k=1)
    assert obs["board"].sum() == 0  # row cleared


def test_simultaneous_row_and_col_clear():
    cfg = default_config()
    env = _env_with_queue(cfg, [0])  # 1x1
    # fill row 0 except (0,0) and col 0 except (0,0)
    env.board[0, 1:] = 1
    env.board[1:, 0] = 1
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 0, 0))
    assert info["lines_cleared"] == 2  # one row + one col, computed before clear
    assert r == 1.0 + 30.0  # 1 cell + bonus(k=2)
    assert obs["board"].sum() == 0


def test_illegal_action_is_noop():
    cfg = default_config()
    env = _env_with_queue(cfg, [10])  # 3x3 square
    env.board[0, 0] = 1
    board_before = env.board.copy()
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 0, 0))
    assert not info["legal"]
    assert r == cfg.illegal_penalty
    np.testing.assert_array_equal(env.board, board_before)
    # out-of-bounds anchor is also illegal
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 8, 8))
    assert not info["legal"]


def test_out_of_bounds_anchor_illegal_everywhere():
    cfg = default_config()
    env = _env_with_queue(cfg, [8])  # 5x1 vertical bar
    mask = env.legal_action_mask()
    for r in range(cfg.height):
        for c in range(cfg.width):
            expected = r + 5 <= cfg.height
            assert mask[rules.encode_action(cfg, 0, r, c)] == expected


def test_game_over_detection():
    cfg = default_config()
    env = _env_with_queue(cfg, [10])  # 3x3 square
    env.board[:] = 1
    env.board[0, 0] = 0  # only a single free cell
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 5, 5))
    assert not info["legal"]
    assert term  # 3x3 cannot fit anywhere
    assert not info["action_mask"].any()


def test_batch_refill_semantics():
    cfg = tenten_config()  # queue of 3, batch refill
    env = BlockPuzzleOracleEnv(cfg)
    obs, info = env.reset(seed=3)
    assert (obs["queue"] != env._empty_id).all()
    # place one legal piece: its slot stays empty (no immediate refill)
    legal = np.where(info["action_mask"])[0]
    a = int(legal[0])
    slot = a // cfg.num_cells
    obs, r, term, trunc, info = env.step(a)
    assert obs["queue"][slot] == env._empty_id
    # empty slots contribute no legal actions
    seg = info["action_mask"][slot * cfg.num_cells : (slot + 1) * cfg.num_cells]
    assert not seg.any()


def test_each_refill_semantics():
    cfg = default_config()
    env = BlockPuzzleOracleEnv(cfg)
    obs, info = env.reset(seed=3)
    legal = np.where(info["action_mask"])[0]
    obs, *_ = env.step(int(legal[0]))
    assert obs["queue"][0] != env._empty_id  # refilled immediately


def test_streak_bonus_rewards_consecutive_clears():
    import dataclasses

    cfg = dataclasses.replace(default_config(), streak_bonus=5.0)
    env = _env_with_queue(cfg, [4])  # piece 4 = 1x5 bar
    env.board[0, 5:] = 1  # rows 0 and 1 each need cells 0-4
    env.board[1, 5:] = 1
    # first clear: starts the streak, no extra bonus yet
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 0, 0))
    assert info["lines_cleared"] == 1 and info["streak"] == 1
    assert r == 5.0 + 10.0
    # second consecutive clear: pays streak_bonus * (2 - 1)
    env.queue[:] = [4]
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 1, 0))
    assert info["lines_cleared"] == 1 and info["streak"] == 2
    assert r == 5.0 + 10.0 + 5.0
    # a legal non-clearing placement resets the streak
    env.queue[:] = [0]  # 1x1
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 5, 5))
    assert info["lines_cleared"] == 0 and info["streak"] == 0 and r == 1.0
    # re-arm a streak, then verify an illegal no-op leaves it unchanged
    env.board[2, 1:] = 1
    env.queue[:] = [0]
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 2, 0))
    assert info["streak"] == 1
    env.queue[:] = [0]
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 5, 5))
    assert not info["legal"] and r == 0.0 and info["streak"] == 1


def test_streak_disabled_by_default():
    env = _env_with_queue(default_config(), [4])
    env.board[0, 5:] = 1
    env.board[1, 5:] = 1
    obs, r1, *_ , i1 = env.step(rules.encode_action(default_config(), 0, 0, 0))
    env.queue[:] = [4]
    obs, r2, *_ , i2 = env.step(rules.encode_action(default_config(), 0, 1, 0))
    # consecutive clears pay identically with the knob off
    assert r1 == r2 == 15.0
    assert i1["streak"] == i2["streak"] == 0


def test_region_clear_woodoku():
    cfg = woodoku_config()
    env = BlockPuzzleOracleEnv(cfg)
    env.reset(seed=0)
    env.queue[:] = [10, env._empty_id, env._empty_id]  # 3x3 square
    obs, r, term, trunc, info = env.step(rules.encode_action(cfg, 0, 0, 0))
    # filling region (0,0) with a 3x3 clears exactly that region
    assert info["lines_cleared"] == 1
    assert r == 9.0 + 10.0
    assert obs["board"].sum() == 0


def test_truncation():
    cfg = default_config()
    env = BlockPuzzleOracleEnv(cfg, max_steps=2)
    env.reset(seed=0)
    _, _, term, trunc, _ = env.step(0)
    assert not trunc
    _, _, term, trunc, _ = env.step(0)
    assert trunc


def test_render_modes():
    env = BlockPuzzleOracleEnv(default_config())
    env.reset(seed=0)
    text = env._render_ansi()
    assert "queue:" in text and len(text.splitlines()) == 11
    img = env._render_rgb()
    assert img.shape == (160, 160, 3) and img.dtype == np.uint8


def test_full_episode_terminates():
    traj = record_trajectory(default_config(), seed=0, max_steps=10_000)
    assert traj.terminated[-1]
    assert traj.episode_return > 0
    # invariant: no recorded board ever holds a full row or column
    assert not traj.boards.all(axis=2).any()
    assert not traj.boards.all(axis=1).any()


def test_gymnasium_env_checker_all_presets():
    from gymnasium.utils.env_checker import check_env

    for preset in (tenten_config(), woodoku_config()):
        check_env(BlockPuzzleOracleEnv(preset), skip_render_check=True)


def test_reset_options_override_board_and_queue():
    env = BlockPuzzleOracleEnv(default_config())
    board = np.zeros((10, 10), dtype=np.uint8)
    board[0, :9] = 1
    obs, info = env.reset(seed=0, options={"board": board, "queue": [0]})
    np.testing.assert_array_equal(obs["board"], board)
    np.testing.assert_array_equal(obs["queue"], [0])
    # piece 0 is the 1x1: placing it at (0, 9) completes and clears row 0
    obs, r, term, trunc, info = env.step(9)
    assert info["lines_cleared"] == 1
    assert obs["board"][0].sum() == 0


def test_reset_options_rejects_bad_input():
    env = BlockPuzzleOracleEnv(default_config())
    with pytest.raises(ValueError):
        env.reset(options={"nope": 1})
    with pytest.raises(ValueError):
        env.reset(options={"board": np.zeros((3, 3), np.uint8)})
    with pytest.raises(ValueError):
        # non-binary cells: can_place (bitwise &) and legal_action_mask
        # (overlap counts) would disagree on them
        env.reset(options={"board": np.full((10, 10), 2, np.uint8)})
    with pytest.raises(ValueError):
        env.reset(options={"queue": [999]})


def test_reset_options_do_not_change_deal_stream():
    """The RNG draws happen before the override, so seeded determinism of
    the subsequent deal stream is unaffected by options."""
    env_a = BlockPuzzleOracleEnv(default_config())
    env_b = BlockPuzzleOracleEnv(default_config())
    env_a.reset(seed=5)
    env_b.reset(seed=5, options={"queue": [0]})
    assert env_a._deal() == env_b._deal()


def test_recorder_policy_stream_decorrelated_from_deals():
    """Default policy seed is seed+1: explicit policy_seed=seed must give
    the OLD correlated behavior, and differ from the new default."""
    a = record_trajectory(default_config(), seed=3, max_steps=64)
    b = record_trajectory(default_config(), seed=3, max_steps=64, policy_seed=4)
    np.testing.assert_array_equal(a.actions, b.actions)
    c = record_trajectory(default_config(), seed=3, max_steps=64, policy_seed=3)
    assert len(a.actions) != len(c.actions) or (a.actions != c.actions).any()
