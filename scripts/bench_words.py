"""Measure the round-5 perf candidates on the step-bench residual
(VERDICT r4 item 8 / ROADMAP round-5 item 4): fold the uniform-legal
sampler into the mask representation (blockpuzzle_tpu/env/words.py).

Three modes, one process, same harness as bench.py's device loop:

* ``base``    — production bench sampler: iid u32 draw over the (N, A)
  bool mask + argmax (bench.py:136-147).
* ``packsel`` — keep the bool mask carry, but PACK it to (N, S*H) u32
  row words and pick the j-th set bit of a uniform rank draw: replaces
  the (N, A) random draw + u32 argmax with one (N,) uniform + popcount
  rank-select over W-fold fewer lanes.
* ``words``   — the full candidate: produce the legal mask AS packed row
  words (env.words.legal_words, relying on XLA CSE against the step's
  internal mask), so the (N, A) bool tensor never enters the scan carry.

All three sample uniform over legal actions up to tiny quantization
(base: argmax tie odds ~2^-32; packsel/words: the f32 rank draw's
~total/2^24 relative bias).  Prints one JSON line per mode; positive
result =
wire ``words`` into the serving consumers, negative = record in
RESULTS.md and retire (measure-before-believing).

Run AFTER the round-5 chain (scripts/r5_tail.sh) — one TPU process at a
time.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


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
    from blockpuzzle_tpu.env.words import (
        legal_words, pack_bool_mask, sample_uniform_legal,
    )
    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = PRESETS[args.preset]()
    env = make_env(cfg)
    assert env.state_impl == "packed", "words modes need the packed engine"
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
                    a = sample_uniform_legal(wrds, sub, w)
                else:  # words: carry IS the packed words
                    a = sample_uniform_legal(m, sub, w)
                state, ts = env.step(state, a)
                if mode == "words":
                    m_next = legal_words(env, state.board, state.queue)
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
            carry = legal_words(env, state.board, state.queue)
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
        # true median (for an even window count, the mean of the middle
        # pair — `rates[len//2]` alone would be the MAX at --windows 2)
        mid = len(rates) // 2
        results[mode] = (rates[mid] if len(rates) % 2
                         else 0.5 * (rates[mid - 1] + rates[mid]))
        print(json.dumps({"mode": mode, "num_envs": n,
                          "steps_per_s": round(results[mode])}))
        sys.stdout.flush()
    if len(results) > 1 and "base" in results:
        rel = {m: round(v / results["base"], 4) for m, v in results.items()}
        print(json.dumps({"relative_to_base": rel}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
