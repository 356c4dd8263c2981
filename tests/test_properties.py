"""Property-based tests (SURVEY.md §4.2): invariants over random states."""

import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from blockpuzzle_tpu import rules
from blockpuzzle_tpu.config import default_config, tenten_config
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.oracle import BlockPuzzleOracleEnv

CFG = default_config()
ENV = make_env(CFG)
ORACLE = BlockPuzzleOracleEnv(CFG)
ORACLE.reset(seed=0)


@st.composite
def board_and_piece(draw):
    bits = draw(st.integers(0, 2**100 - 1))
    board = np.array(
        [(bits >> i) & 1 for i in range(100)], dtype=np.uint8
    ).reshape(10, 10)
    pid = draw(st.integers(0, 18))
    return board, pid


@given(board_and_piece())
@settings(max_examples=60, deadline=None)
def test_mask_equals_canplace_everywhere(bp):
    """Engine mask ⇔ oracle can_place at every anchor (mask ⇔ can_place
    property from SURVEY §4.2)."""
    board, pid = bp
    ORACLE.board[:] = board
    ORACLE.queue[:] = [pid]
    expected = ORACLE.legal_action_mask()
    got = np.asarray(
        ENV.action_mask(
            ENV.encode_board(board[None]), jnp.asarray([[pid]], jnp.int32)
        )
    )[0]
    np.testing.assert_array_equal(got, expected)


@given(board_and_piece(), st.integers(0, 99))
@settings(max_examples=60, deadline=None)
def test_step_never_leaves_full_line(bp, cell):
    """place-then-clear never leaves a full row/col (SURVEY §4.2 property)."""
    board, pid = bp
    # clear any pre-existing full lines so the input is a reachable state
    b = board.copy()
    b[b.all(axis=1)] = 0
    b[:, b.all(axis=0)] = 0
    state, _ = ENV.init(jax.random.key(0), 1, deal_override=np.array([[pid]]))
    state = state.replace(board=ENV.encode_board(b[None]))
    state2, ts = ENV.step(state, jnp.asarray([cell]), auto_reset=False)
    out = np.asarray(ENV.board_obs(state2.board))[0]
    assert not out.all(axis=1).any(), "full row left after step"
    assert not out.all(axis=0).any(), "full col left after step"


@given(board_and_piece(), st.integers(0, 99))
@settings(max_examples=40, deadline=None)
def test_reward_zero_iff_illegal(bp, cell):
    board, pid = bp
    b = board.copy()
    b[b.all(axis=1)] = 0
    b[:, b.all(axis=0)] = 0
    state, _ = ENV.init(jax.random.key(0), 1, deal_override=np.array([[pid]]))
    state = state.replace(board=ENV.encode_board(b[None]))
    _, ts = ENV.step(state, jnp.asarray([cell]), auto_reset=False)
    legal = bool(ts.info["legal"][0])
    reward = float(ts.reward[0])
    if legal:
        assert reward >= int(rules.tables_for(CFG).piece_cells[pid])
    else:
        assert reward == CFG.illegal_penalty


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_batch_refill_only_when_hand_empty(seed):
    """1010!-variant invariant: slots refill only when ALL are empty."""
    cfg = tenten_config()
    oracle = BlockPuzzleOracleEnv(cfg)
    obs, info = oracle.reset(seed=seed)
    import random as pyrandom

    rng = pyrandom.Random(seed)
    for _ in range(30):
        legal = np.flatnonzero(info["action_mask"])
        if legal.size == 0:
            break
        n_empty_before = int((obs["queue"] == oracle._empty_id).sum())
        obs, r, term, trunc, info = oracle.step(int(rng.choice(legal)))
        n_empty_after = int((obs["queue"] == oracle._empty_id).sum())
        if n_empty_before < cfg.queue_size - 1:
            # hand not about to empty: consumed slot stays empty
            assert n_empty_after == n_empty_before + 1
        else:
            # last piece placed -> full redeal
            assert n_empty_after == 0
        if term or trunc:
            break
