"""Correctness of the round-5 sampler-folding path
(blockpuzzle_tpu/env/words.py — VERDICT r4 item 8): the packed legal-words
producer must bit-match the engine's bool mask, and the rank-select
sampler must be uniform-legal (up to the f32 rank draw's ~2^-24
quantization).  CPU sim (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blockpuzzle_tpu.config import PRESETS
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.env.words import (
    legal_words,
    pack_bool_mask,
    rank_select_bit,
    sample_uniform_legal,
)


@pytest.mark.parametrize("preset", ["default", "tenten", "woodoku"])
def test_legal_words_bit_matches_bool_mask(preset):
    cfg = PRESETS[preset]()
    env = make_env(cfg)
    state, ts = env.init_jit(jax.random.key(0), 32)
    key = jax.random.key(1)
    for _ in range(6):
        key, sub = jax.random.split(key)
        bits = jax.random.bits(sub, ts.action_mask.shape, jnp.uint32)
        a = jnp.argmax(
            jnp.where(ts.action_mask, bits | jnp.uint32(1), jnp.uint32(0)),
            axis=-1,
        )
        state, ts = env.step_jit(state, a)
        np.testing.assert_array_equal(
            np.asarray(legal_words(env, state.board, state.queue)),
            np.asarray(
                pack_bool_mask(
                    ts.action_mask, cfg.height, cfg.width, cfg.queue_size
                )
            ),
        )


def test_sample_uniform_legal_uniform_legal():
    cfg = PRESETS["default"]()
    env = make_env(cfg)
    state, ts = env.init_jit(jax.random.key(0), 16)
    key = jax.random.key(1)
    for _ in range(4):
        key, sub = jax.random.split(key)
        bits = jax.random.bits(sub, ts.action_mask.shape, jnp.uint32)
        a = jnp.argmax(
            jnp.where(ts.action_mask, bits | jnp.uint32(1), jnp.uint32(0)),
            axis=-1,
        )
        state, ts = env.step_jit(state, a)
    words = legal_words(env, state.board, state.queue)
    mask = np.asarray(ts.action_mask)
    draws = 400
    hits = np.zeros_like(mask, dtype=np.int64)
    sample = jax.jit(sample_uniform_legal, static_argnums=2)
    for s in range(draws):
        a = np.asarray(sample(words, jax.random.key(1000 + s), cfg.width))
        assert mask[np.arange(mask.shape[0]), a].all(), "illegal sample"
        hits[np.arange(mask.shape[0]), a] += 1
    # empirical frequency ~ uniform over each env's legal set: every legal
    # action of env 0 drawn at least once, expected count within 4 sigma
    legal0 = np.flatnonzero(mask[0])
    exp = draws / len(legal0)
    sigma = (draws * (1 / len(legal0)) * (1 - 1 / len(legal0))) ** 0.5
    assert (hits[0, legal0] > 0).all()
    assert np.abs(hits[0, legal0] - exp).max() < 4.5 * sigma + 1


def test_rank_select_bit_exact():
    rng = np.random.default_rng(0)
    words, ranks, expect = [], [], []
    for _ in range(128):
        word = np.uint32(rng.integers(1, 2**32, dtype=np.uint64))
        setbits = np.flatnonzero([(word >> i) & 1 for i in range(32)])
        j = int(rng.integers(0, len(setbits)))
        words.append(word)
        ranks.append(j)
        expect.append(setbits[j])
    got = rank_select_bit(
        jnp.asarray(words), jnp.asarray(ranks, jnp.int32)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_sample_uniform_legal_empty_mask_returns_zero():
    """All-zero words (a frozen auto_reset=False terminal state) must
    return the documented action 0, not the out-of-range S*H*W + 31 the
    unguarded arithmetic would produce (round-5 review finding)."""
    words = jnp.zeros((4, 10), jnp.uint32)
    a = sample_uniform_legal(words, jax.random.key(0), 10)
    np.testing.assert_array_equal(np.asarray(a), 0)
    # mixed batch: empty envs pin 0, the non-empty env stays legal
    # (.at[1] fills ALL of env 1's words with bits {2, 5})
    words = words.at[1].set(jnp.uint32(0b100100))
    a = np.asarray(sample_uniform_legal(words, jax.random.key(1), 10))
    assert a[0] == 0 and a[2] == 0 and a[3] == 0
    assert a[1] % 10 in (2, 5)
