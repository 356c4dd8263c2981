"""Gymnasium VectorEnv adapter tests (TPU engine behind the Gym surface)."""

import numpy as np
import pytest

import gymnasium

import blockpuzzle_tpu  # noqa: F401 — registers ids
from blockpuzzle_tpu.config import default_config, tenten_config
from blockpuzzle_tpu.vector_env import BlockPuzzleVectorEnv


def test_make_vec_registered():
    env = gymnasium.make_vec("BlockPuzzleTpu/BlockPuzzle-v0", num_envs=8)
    assert isinstance(env.unwrapped, BlockPuzzleVectorEnv)
    obs, infos = env.reset(seed=0)
    assert obs["board"].shape == (8, 10, 10)
    assert infos["action_mask"].shape == (8, 100)
    env.close()


def test_vector_step_and_masking():
    env = BlockPuzzleVectorEnv(num_envs=16, cfg=default_config())
    obs, infos = env.reset(seed=1)
    rng = np.random.default_rng(0)
    for _ in range(20):
        mask = infos["action_mask"]
        # sample one legal action per env
        actions = np.array(
            [rng.choice(np.flatnonzero(m)) for m in mask], dtype=np.int64
        )
        obs, rewards, term, trunc, infos = env.step(actions)
        assert rewards.shape == (16,)
        assert (rewards > 0).all()  # legal actions always reward
    env.close()


def test_vector_autoreset_final_observation():
    env = BlockPuzzleVectorEnv(num_envs=32, cfg=default_config())
    obs, infos = env.reset(seed=2)
    rng = np.random.default_rng(1)
    saw_done = False
    for _ in range(120):
        mask = infos["action_mask"]
        actions = np.array(
            [rng.choice(np.flatnonzero(m)) if m.any() else 0 for m in mask],
            dtype=np.int64,
        )
        obs, rewards, term, trunc, infos = env.step(actions)
        done = term | trunc
        if done.any():
            saw_done = True
            assert "final_board" in infos
            i = int(np.flatnonzero(done)[0])
            # live obs for the done env is a fresh (empty) board...
            assert obs["board"][i].sum() == 0
            # ...while the final board is the dead position (non-empty)
            assert infos["final_board"][i].sum() > 0
            np.testing.assert_array_equal(infos["_final_board"], done)
            break
    assert saw_done, "no episode finished in 120 steps"
    env.close()


def test_vector_env_spaces_batched():
    env = BlockPuzzleVectorEnv(num_envs=4, cfg=tenten_config())
    assert env.single_action_space.n == 300
    assert env.action_space.shape == (4,)
    obs, infos = env.reset(seed=0)
    assert obs["queue"].shape == (4, 3)
    assert env.observation_space.contains(obs)
    env.close()


def test_vector_render_rgb():
    env = BlockPuzzleVectorEnv(num_envs=4, render_mode="rgb_array")
    env.reset(seed=0)
    img = env.render()
    assert img is not None and img.ndim == 3 and img.dtype == np.uint8
    env.close()


def test_vector_reset_options_override_state():
    env = BlockPuzzleVectorEnv(num_envs=4, cfg=default_config())
    boards = np.zeros((4, 10, 10), dtype=np.uint8)
    boards[:, 0, :9] = 1
    queues = np.zeros((4, 1), dtype=np.int32)  # piece 0 = 1x1
    obs, infos = env.reset(seed=0, options={"board": boards, "queue": queues})
    np.testing.assert_array_equal(obs["board"], boards)
    np.testing.assert_array_equal(obs["queue"], queues)
    # the recomputed mask must forbid the occupied cells
    assert not infos["action_mask"][:, :9].any()
    # completing row 0 clears it in every env
    obs, rewards, term, trunc, infos = env.step(np.full(4, 9))
    assert (infos["lines_cleared"] == 1).all()
    assert (obs["board"][:, 0].sum(axis=-1) == 0).all()
    env.close()


def test_vector_reset_options_rejects_unknown():
    env = BlockPuzzleVectorEnv(num_envs=2, cfg=default_config())
    with pytest.raises(ValueError):
        env.reset(seed=0, options={"bogus": 1})
    env.close()


def test_vector_reset_options_rejects_bad_board():
    env = BlockPuzzleVectorEnv(num_envs=2, cfg=default_config())
    # wrong shape: a transposed/flattened array must not be silently
    # reinterpreted by a bare reshape (the oracle raises on shape mismatch)
    with pytest.raises(ValueError):
        env.reset(seed=0, options={"board": np.zeros((100, 2), np.uint8)})
    # non-binary cells would desync engine count==size clears from the
    # oracle's .all()
    with pytest.raises(ValueError):
        env.reset(seed=0, options={"board": np.full((2, 10, 10), 2, np.uint8)})
    # flat (N, H*W) remains accepted
    obs, infos = env.reset(seed=0, options={"board": np.zeros((2, 100), np.uint8)})
    assert obs["board"].shape == (2, 10, 10)
    env.close()
