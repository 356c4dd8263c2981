"""Measure the round-5 perf candidates on the step-bench residual
(VERDICT r4 item 8 / ROADMAP round-5 item 4): fold the uniform-legal
sampler into the mask representation.

Three modes, one process, same harness as bench.py's device loop:

* ``base``    — production bench sampler: iid u32 draw over the (N, A)
  bool mask + argmax (bench.py:136-147).
* ``packsel`` — keep the bool mask carry, but PACK it to (N, S*H) u32
  row words and pick the j-th set bit of a uniform rank draw: replaces
  the (N, A) random draw + u32 argmax with one (N,) uniform + popcount
  rank-select over W-fold fewer lanes.
* ``words``   — the full candidate: produce the legal mask AS packed row
  words (prototype of an engine ``legal_words`` output; here computed
  from engine internals, relying on XLA CSE against the step's internal
  mask), so the (N, A) bool tensor never enters the scan carry.

All three sample exactly uniform over legal actions (base's argmax tie
odds ~2^-32 aside).  Prints one JSON line per mode; positive result =
promote ``words`` into the engine as a TimeStep variant, negative =
record in RESULTS.md and retire (measure-before-believing).

Run AFTER the round-5 chain (scripts/r5_tail.sh) — one TPU process at a
time.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def rank_select_bit(word, j):
    """Bit index of the j-th (0-based) set bit of u32 ``word`` — 5-step
    binary search on prefix popcounts; pure vector ops (no gather)."""
    import jax.numpy as jnp
    import jax

    pos = jnp.zeros_like(j)
    rem = j
    for width in (16, 8, 4, 2, 1):
        lowmask = (
            (jnp.uint32((1 << width) - 1)) << pos.astype(jnp.uint32)
        )
        c = jax.lax.population_count(word & lowmask).astype(jnp.int32)
        go_high = rem >= c
        rem = jnp.where(go_high, rem - c, rem)
        pos = pos + jnp.where(go_high, width, 0)
    return pos


def sample_from_words(words, key, width):
    """Uniform-legal action from (N, SH) u32 legal row words.

    a = word_index * W + bit  (matches the flat (slot, r, c) action id:
    word_index = s*H + r).  All lanes-over-N vector ops: popcount,
    cumsum over the tiny static SH axis, one-hot select (no gather).
    """
    import jax
    import jax.numpy as jnp

    n, sh = words.shape
    cnt = jax.lax.population_count(words).astype(jnp.int32)    # (N, SH)
    csum = jnp.cumsum(cnt, axis=1)                             # (N, SH)
    total = csum[:, -1]                                        # (N,)
    u = jax.random.uniform(key, (n,))
    r = jnp.minimum(
        (u * total.astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(total - 1, 0),
    )                                                          # (N,)
    # first word whose inclusive cumsum exceeds r
    gt = (csum > r[:, None])
    widx = jnp.sum(jnp.logical_not(gt).astype(jnp.int32), axis=1)  # (N,)
    onehot = widx[:, None] == jnp.arange(sh, dtype=jnp.int32)[None, :]
    word = jnp.sum(jnp.where(onehot, words, jnp.uint32(0)), axis=1)
    prev = jnp.sum(jnp.where(onehot, csum - cnt, 0), axis=1)   # rank base
    bit = rank_select_bit(word, r - prev)
    return widx * width + bit


def make_legal_words_fn(env):
    """Prototype of an engine-level packed legal-words producer: the
    bitboard mask algorithm (env/core.py:_bitboard_mask_from_words) with
    the final reshape replaced by a pow2 pack over columns."""
    import jax.numpy as jnp
    import numpy as np

    cfg = env.cfg
    t = env.tables
    h, w = cfg.height, cfg.width
    fpw, nwords = env._bb_fpw, env._bb_nwords
    pow2 = jnp.asarray((np.uint32(1) << np.arange(w, dtype=np.uint32)))

    def legal_words(words, queue):
        n = words.shape[0]
        pad = jnp.full(
            (n, t.max_h - 1), np.uint32((1 << w) - 1), dtype=jnp.uint32
        )
        padded = jnp.concatenate([words, pad], axis=1)
        wks = []
        for k in range(nwords):
            wk = jnp.zeros((n, h), jnp.uint32)
            for j in range(fpw):
                i = k * fpw + j
                if i >= t.max_h:
                    break
                wk = wk | (padded[:, i : i + h] << np.uint32(j * w))
            wks.append(wk)
        outs = []
        for s in range(cfg.queue_size):
            pid_s = queue[:, s]
            onehot_b = pid_s[:, None] == env._piece_iota[None, :]
            prow = jnp.sum(
                jnp.where(
                    onehot_b[:, :, None], env._bb_prow[None], jnp.uint32(0)
                ),
                axis=1,
            )
            pw = jnp.sum(
                jnp.where(onehot_b, env._bb_piece_w[None], 0), axis=1
            )
            acc = jnp.zeros((n, h, w), jnp.uint32)
            for k in range(nwords):
                shifted = (
                    prow[:, k : k + 1] << env._bb_c_iota[None, :]
                ) & env._bb_cmask[None, :]
                acc = acc | (wks[k][:, :, None] & shifted[:, None, :])
            ok_col = (
                env._bb_c_iota.astype(jnp.int32)[None, :] + pw[:, None] <= w
            )
            legal = (acc == 0) & ok_col[:, None, :] & (
                pid_s < env.num_pieces
            )[:, None, None]                                   # (N, H, W)
            outs.append(
                jnp.sum(legal.astype(jnp.uint32) * pow2[None, None, :],
                        axis=2)                                # (N, H)
            )
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    return legal_words


def pack_bool_mask(mask, height, width, queue_size):
    """(N, S*H*W) bool -> (N, S*H) u32 row words (pow2 weighted sum)."""
    import jax.numpy as jnp
    import numpy as np

    n = mask.shape[0]
    pow2 = jnp.asarray((np.uint32(1) << np.arange(width, dtype=np.uint32)))
    m3 = mask.reshape(n, queue_size * height, width)
    return jnp.sum(m3.astype(jnp.uint32) * pow2[None, None, :], axis=2)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--modes", nargs="*", default=["base", "packsel", "words"],
                   choices=["base", "packsel", "words"])
    p.add_argument("--num-envs", type=int, default=49152)
    p.add_argument("--chunk", type=int, default=200)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--preset", default="default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from blockpuzzle_tpu.config import PRESETS
    from blockpuzzle_tpu.env import make_env
    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = PRESETS[args.preset]()
    env = make_env(cfg)
    assert env.state_impl == "packed", "prototype needs the packed engine"
    legal_words = make_legal_words_fn(env)
    n = args.num_envs
    w = cfg.width

    def make_chunk(mode):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def chunk(state, carry_mask, key):
            def body(carry, _):
                state, m, key = carry
                key, sub = jax.random.split(key)
                if mode == "base":
                    bits = jax.random.bits(sub, m.shape, jnp.uint32)
                    a = jnp.argmax(
                        jnp.where(m, bits | jnp.uint32(1), jnp.uint32(0)),
                        axis=-1,
                    )
                elif mode == "packsel":
                    wrds = pack_bool_mask(
                        m, cfg.height, cfg.width, cfg.queue_size
                    )
                    a = sample_from_words(wrds, sub, w)
                else:  # words: carry IS the packed words
                    a = sample_from_words(m, sub, w)
                state, ts = env.step(state, a)
                if mode == "words":
                    m_next = legal_words(state.board, state.queue)
                else:
                    m_next = ts.action_mask
                return (state, m_next, key), ts.reward.sum()

            (state, m, key), r = jax.lax.scan(
                body, (state, carry_mask, key), None,
                length=args.chunk, unroll=4,
            )
            return state, m, key, r.sum()

        return chunk

    results = {}
    for mode in args.modes:
        state, ts = env.init_jit(jax.random.key(0), n)
        if mode == "words":
            carry = legal_words(state.board, state.queue)
        else:
            carry = ts.action_mask
        key = jax.random.key(1, impl="rbg")
        chunk = make_chunk(mode)
        t0 = time.time()
        out = chunk(state, carry, key)
        state, carry, key, r = out
        float(r)  # completion barrier (axon: device_get, CLAUDE.md)
        print(f"[{mode}] compile+warm {time.time() - t0:.1f}s",
              file=sys.stderr)
        rates = []
        for win in range(args.windows):
            t0 = time.time()
            for _ in range(args.iters):
                state, carry, key, r = chunk(state, carry, key)
            float(r)  # completion barrier
            rate = args.iters * args.chunk * n / (time.time() - t0)
            rates.append(rate)
            print(f"[{mode}] window {win}: {rate / 1e6:.2f}M steps/s",
                  file=sys.stderr)
        rates.sort()
        results[mode] = rates[len(rates) // 2]
        print(json.dumps({"mode": mode, "num_envs": n,
                          "steps_per_s": round(results[mode])}))
        sys.stdout.flush()
    if len(results) > 1 and "base" in results:
        rel = {m: round(v / results["base"], 4) for m, v in results.items()}
        print(json.dumps({"relative_to_base": rel}))
    return 0


if __name__ == "__main__":
    import os
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    raise SystemExit(main())
