"""Pallas kernel parity tests — interpret mode on CPU (SURVEY.md §4.2
"Kernel parity": kernels vs jnp references, bit-equal on random boards)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blockpuzzle_tpu.config import default_config, woodoku_config
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.kernels import ApplyKernel, ClearScanKernel, LegalityKernel


def random_boards(cfg, n, rng, fill=0.5, with_full_lines=True):
    b = (rng.random((n, cfg.num_cells)) < fill).astype(np.uint8)
    if with_full_lines:
        # force some full rows/cols to exercise the clear path
        grid = b.reshape(n, cfg.height, cfg.width)
        grid[0, 3, :] = 1
        grid[1, :, 7] = 1
        grid[2, 0, :] = 1
        grid[2, :, 0] = 1
    return jnp.asarray(b)


@pytest.mark.parametrize("cfg", [default_config(), woodoku_config()], ids=str)
def test_clear_kernel_matches_reference(cfg, rng):
    k = ClearScanKernel(cfg, tile_n=8)
    boards = random_boards(cfg, 16, rng)
    ref_board, ref_k = k.reference(boards)
    out_board, out_k = k(boards, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_board), np.asarray(ref_board))
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(ref_k))


def test_clear_kernel_matches_engine_jnp(rng):
    cfg = default_config()
    env = make_env(cfg)  # jnp backend
    k = ClearScanKernel(cfg, tile_n=8)
    boards = random_boards(cfg, 16, rng)
    ref_board, ref_k = env.clear_scan(boards)
    out_board, out_k = k(boards, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_board), np.asarray(ref_board))
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(ref_k))


@pytest.mark.parametrize("cfg", [default_config()], ids=str)
def test_legality_kernel_matches_reference(cfg, rng):
    k = LegalityKernel(cfg, tile_n=8, tile_a=128)
    boards = random_boards(cfg, 16, rng, fill=0.4, with_full_lines=False)
    ref = k.reference(boards)
    out = k(boards, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_apply_kernel_matches_reference(rng):
    cfg = default_config()
    env = make_env(cfg)
    k = ApplyKernel(cfg, tile_n=8)
    boards = random_boards(cfg, 16, rng, fill=0.4)
    # random global action ids incl. invalid anchors
    g = jnp.asarray(rng.integers(0, env._cover_u8.shape[0], 16), jnp.int32)
    cover = jnp.take(env._cover_u8, g, axis=0)
    valid = jnp.take(env._valid, g)
    ref = k.reference(boards, cover, valid)
    out = k(boards, cover, valid, interpret=True)
    for r, o, name in zip(ref, out, ("board", "k", "legal")):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r), name)


def test_apply_kernel_illegal_is_noop_even_with_full_line(rng):
    """Adversarial: board already holds a full row; illegal action must not
    clear it (oracle no-op semantics)."""
    cfg = default_config()
    env = make_env(cfg)
    k = ApplyKernel(cfg, tile_n=8)
    board = np.zeros((8, cfg.num_cells), np.uint8)
    board[:, :10] = 1  # full row 0
    board = jnp.asarray(board)
    g = jnp.zeros(8, jnp.int32)  # piece 0 at (0,0): occupied -> illegal
    cover = jnp.take(env._cover_u8, g, axis=0)
    valid = jnp.take(env._valid, g)
    out_board, out_k, out_legal = k(board, cover, valid, interpret=True)
    assert not bool(out_legal.any())
    np.testing.assert_array_equal(np.asarray(out_board), np.asarray(board))
    assert int(out_k.sum()) == 0


@pytest.mark.parametrize(
    "cfg", [default_config(), woodoku_config()], ids=str
)
def test_pallas_engine_step_parity_with_jnp_engine(cfg, rng):
    """Full engine step: pallas(interpret) backend vs jnp backend, bit-equal
    over a multi-step rollout with shared actions and deals."""
    env_j = make_env(cfg, backend="jnp")
    env_p = make_env(cfg, backend="pallas")
    n = 8
    state_j, ts_j = env_j.init(jax.random.key(0), n)
    state_p, ts_p = env_p.init(jax.random.key(0), n)
    np.testing.assert_array_equal(
        np.asarray(ts_j.action_mask), np.asarray(ts_p.action_mask)
    )
    key = jax.random.key(1)
    for t in range(20):
        key, sub = jax.random.split(key)
        logits = jnp.where(ts_j.action_mask, 0.0, -1e9)
        a = jax.random.categorical(sub, logits, axis=-1)
        deals = jax.random.randint(
            sub, (n, cfg.queue_size), 0, env_j.num_pieces, dtype=jnp.int32
        )
        state_j, ts_j = env_j.step(state_j, a, deal_override=deals)
        state_p, ts_p = env_p.step(state_p, a, deal_override=deals)
        np.testing.assert_array_equal(
            np.asarray(ts_j.board), np.asarray(ts_p.board), f"board t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(ts_j.action_mask),
            np.asarray(ts_p.action_mask),
            f"mask t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(ts_j.reward), np.asarray(ts_p.reward), f"reward t={t}"
        )


def test_ragged_batch_falls_back_to_reference(rng):
    cfg = default_config()
    k = ClearScanKernel(cfg, tile_n=8)
    boards = random_boards(cfg, 11, rng)  # 11 % 8 != 0
    out_board, out_k = k(boards, interpret=True)
    ref_board, ref_k = k.reference(boards)
    np.testing.assert_array_equal(np.asarray(out_board), np.asarray(ref_board))


def test_mask_kernel_matches_action_mask(rng):
    """Fused mask kernel == engine action_mask, incl. empty sentinel slots.

    The reference side here is the bitboard mask on the u8 layout (the
    kernel consumes u8 flat boards; the packed default is bit-equal to it
    by test_packed_state_engine_bit_equal): this test closes
    the bitboard <-> MaskKernel leg of the parity triangle directly (the
    shift <-> matmul leg is tests/test_env_core.py::
    test_shift_mask_impl_bit_equal, bitboard <-> shift is
    test_bitboard_mask_impl_bit_equal), even though the kernel internally
    implements the retired matmul formulation.
    """
    from blockpuzzle_tpu.kernels import MaskKernel
    from blockpuzzle_tpu.config import tenten_config

    for cfg in (default_config(), tenten_config()):
        env = make_env(cfg, state_impl="u8")  # kernel takes u8 flat boards
        mk = MaskKernel(cfg, tile_n=8)
        board = (rng.random((16, cfg.num_cells)) < 0.4).astype(np.uint8)
        queue = rng.integers(
            0, env.num_pieces + 1, size=(16, cfg.queue_size)
        ).astype(np.int32)
        ref = np.asarray(env.action_mask(jnp.asarray(board), jnp.asarray(queue)))
        got = np.asarray(mk(jnp.asarray(board), jnp.asarray(queue), interpret=True))
        np.testing.assert_array_equal(got, ref)


def test_hybrid_backend_step_parity(rng):
    """hybrid backend (jnp step + pallas mask) bit-equal to jnp backend."""
    cfg = default_config()
    ej = make_env(cfg, backend="jnp")
    eh = make_env(cfg, backend="hybrid")
    n = 8
    sj, tj = ej.init(jax.random.key(0), n)
    sh, th = eh.init(jax.random.key(0), n)
    np.testing.assert_array_equal(
        np.asarray(tj.action_mask), np.asarray(th.action_mask)
    )
    key = jax.random.key(1)
    for t in range(15):
        key, sub = jax.random.split(key)
        a = jax.random.categorical(
            sub, jnp.where(tj.action_mask, 0.0, -1e9), axis=-1
        )
        deals = jax.random.randint(sub, (n, 1), 0, ej.num_pieces, jnp.int32)
        sj, tj = ej.step(sj, a, deal_override=deals)
        sh, th = eh.step(sh, a, deal_override=deals)
        np.testing.assert_array_equal(
            np.asarray(tj.board), np.asarray(th.board), f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(tj.action_mask), np.asarray(th.action_mask), f"t={t}"
        )
