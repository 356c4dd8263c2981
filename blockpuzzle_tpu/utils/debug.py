"""Debug mode: NaN trapping + structural state assertions (SURVEY.md §5
"Race detection / sanitizers" row — races are N/A by construction in the
pure-functional engine; the sanitizers that DO apply are NaN traps and
shape/dtype/invariant checks)."""

from __future__ import annotations

import contextlib
from typing import Iterator

import chex
import jax
import jax.numpy as jnp


def enable_debug_mode() -> None:
    """Trap NaNs at dispatch boundaries (recompiles affected programs)."""
    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def debug_mode() -> Iterator[None]:
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def validate_env_state(env, state) -> None:
    """Structural + semantic invariants of a batched EnvState (host-side;
    call outside jit, e.g. between updates in debug runs)."""
    cfg = env.cfg
    n = state.num_envs
    if getattr(env, "state_impl", "u8") == "packed":
        chex.assert_shape(state.board, (n, cfg.height))
        chex.assert_type(state.board, jnp.uint32)
    else:
        chex.assert_shape(state.board, (n, cfg.num_cells))
        chex.assert_type(state.board, jnp.uint8)
    chex.assert_shape(state.queue, (n, cfg.queue_size))
    chex.assert_shape(state.rng_counter, (n,))
    chex.assert_shape(state.steps, (n,))

    import numpy as np

    grid = np.asarray(env.board_obs(state.board))
    assert ((grid == 0) | (grid == 1)).all(), "board cells must be 0/1"
    assert not grid.all(axis=2).any(), "mid-episode board holds a full row"
    assert not grid.all(axis=1).any(), "mid-episode board holds a full col"
    queue = np.asarray(state.queue)
    assert (queue >= 0).all() and (queue <= env.empty_id).all(), (
        "queue ids out of range"
    )
    if not cfg.refill_batch:
        assert (queue < env.empty_id).all(), (
            "refill-each mode must never expose an empty slot"
        )
    chex.assert_shape(state.streak, (n,))
    streak = np.asarray(state.streak)
    assert (streak >= 0).all(), "streak counter went negative"
    if not cfg.streak_bonus:
        assert (streak == 0).all(), (
            "streak must stay zero while cfg.streak_bonus is disabled"
        )
