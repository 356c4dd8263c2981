"""Headline benchmark: batched env-steps/s per chip (BASELINE.md).

Runs the batched engine at its best-measured batch size with a uniform-legal
random policy (the honest rollout workload: every step samples from the
legal-action mask the env emits), steady-state, excluding compile.

Prints ONE JSON line:
  {"metric": "env_steps_per_s_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / 10_000_000}

vs_baseline divides by the 10M steps/s/chip north-star target from
BASELINE.json — the reference publishes no numbers of its own
(BASELINE.md: `published: {}`; single-env Python envs of this genre run
~1e4-1e5 steps/s, measured on stderr for context).

Resilience (VERDICT.md round 1, item 1): the axon TPU tunnel wedges
transiently for ~20-30 min (a mid-compile kill or a sick tunnel hangs
device init — exactly how BENCH_r01 recorded rc=1 for a 10.8x-target
result).  All device work therefore runs in SUBPROCESSES so a hang is a
timeout, not a lost round:

  * parent process never touches the TPU (the oracle bench is numpy-only);
  * a tiny health-check matmul subprocess gates the real bench, retried
    with backoff across the tunnel's self-recovery window;
  * the bench worker subprocess gets a generous timeout and a retry;
  * on unrecoverable failure the JSON line still prints (value 0 +
    "error" field) and the exit code is 0.
"""

from __future__ import annotations

import functools
import json
import subprocess
import sys
import time

import os

BASELINE_STEPS_PER_S = 10_000_000  # BASELINE.json north_star target
# best measured batch (docs/RESULTS.md: 151.4M steps/s at 49152 vs 145.2M
# at 32768 and 149.7M at 65536); env var overrides for experiments
# parsed in main()/bench_device() (NOT at import) so a malformed value
# produces the contract JSON line instead of an import-time traceback
NUM_ENVS_RAW = os.environ.get("BP_BENCH_NUM_ENVS", "49152")
# legality-matmul operand dtype — ONLY read by BP_BENCH_MASK_IMPL=matmul
# (the shift impl computes in bf16 throughout): "int8" (s8xs8->s32 runs at
# 2x the bf16 MXU rate on v5e and is bit-identical here — measured 123.1M
# vs 117.4M steps/s, docs/RESULTS.md) or "bf16"
MASK_DTYPE = os.environ.get("BP_BENCH_MASK_DTYPE", "int8")
# game preset ("default" headline; "tenten"/"woodoku"/"big" variant rows)
PRESET = os.environ.get("BP_BENCH_PRESET", "default")
# mask computation: "bitboard" default (packed u32 row-field words, 2
# AND+OR taps — measured 209.2M vs 151.4M steps/s for "shift" at the
# headline protocol, round 4, docs/RESULTS.md); "shift"/"matmul" kept for
# comparison
MASK_IMPL = os.environ.get("BP_BENCH_MASK_IMPL", "bitboard")
# engine backend: "jnp" (XLA-fused, the production default), "hybrid"
# (jnp step + pallas mask kernel), "pallas" (all hand kernels) — lets the
# kernel retirement verdict be re-checked under the EXACT headline
# protocol (VERDICT r2 weak #4: bench_backends.py uses N=16384/100-step
# chunks/no-unroll, so its 2.0-2.6x ratio wasn't apples-to-apples)
BACKEND = os.environ.get("BP_BENCH_BACKEND", "jnp")
# EnvState layout: "auto" resolves to "packed" ((N, H) u32 row words
# end-to-end, the round-4 production default — 293.5M vs 209.2M steps/s)
# wherever rows fit a u32 word; "u8" ((N, HW) cells) selectable
STATE_IMPL = os.environ.get("BP_BENCH_STATE_IMPL", "auto")
# uniform-legal sampler: "argmax" (iid u32 draw over the (N, A) bool
# mask + argmax — the headline protocol) or "words" (round 5: popcount
# rank-select over (N, S*H) packed legal words, env/words.py — requires
# the packed engine; measured head-to-head by scripts/bench_words.py)
SAMPLER = os.environ.get("BP_BENCH_SAMPLER", "argmax")
CHUNK = 400                        # long chunks amortize dispatch latency
ITERS = 8                          # ~1 s/window: amortizes the device_get RTT
WINDOWS = 5                        # median window is the headline (robust
                                   # to tunnel jitter in both directions)

HEALTH_TIMEOUT_S = 180             # tiny matmul on a healthy tunnel: ~2 s
WORKER_TIMEOUT_S = 1800            # covers a cold-cache remote compile
DEVICE_BUDGET_S = 55 * 60          # total wall budget for the device phase
                                   # (tunnel self-recovers in ~20-30 min)
# Backoff between device attempts: one quick retry for transient blips,
# then ONE long quiet wait sized to the tunnel's documented 20-30 min
# self-recovery (repeated short-interval health probes each get killed at
# HEALTH_TIMEOUT_S, and repeated kills compound the wedge — see
# .claude/skills/verify/SKILL.md), then short tail retries against
# whatever budget remains.
BACKOFF_S = (60, 1500, 300, 300)


def bench_oracle(max_steps: int = 2000) -> float:
    """Single-env CPU oracle steps/s (the reference-shaped baseline)."""
    import random

    import numpy as np

    from blockpuzzle_tpu.config import default_config
    from blockpuzzle_tpu.oracle import BlockPuzzleOracleEnv

    env = BlockPuzzleOracleEnv(default_config())
    rng = random.Random(0)
    obs, info = env.reset(seed=0)
    t0 = time.time()
    steps = 0
    while steps < max_steps:
        legal = np.flatnonzero(info["action_mask"])
        if legal.size == 0:
            obs, info = env.reset()
            continue
        obs, r, term, trunc, info = env.step(int(rng.choice(legal)))
        steps += 1
        if term or trunc:
            obs, info = env.reset()
    return steps / (time.time() - t0)


def bench_device() -> float:
    import jax
    import jax.numpy as jnp

    from blockpuzzle_tpu.env import make_env
    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from blockpuzzle_tpu.config import PRESETS

    num_envs = int(NUM_ENVS_RAW)  # validated in main() before the worker runs

    env = make_env(PRESETS[PRESET](), backend=BACKEND,
                   mask_dtype=MASK_DTYPE, mask_impl=MASK_IMPL,
                   state_impl=None if STATE_IMPL == "auto" else STATE_IMPL)
    if SAMPLER == "words" and env.state_impl != "packed":
        raise ValueError("BP_BENCH_SAMPLER=words needs the packed engine")
    state, ts = env.init_jit(jax.random.key(0), num_envs)
    policy_key = jax.random.key(1, impl="rbg")  # fast PRNG for gumbel sampling
    if SAMPLER == "words":
        from blockpuzzle_tpu.env.words import legal_words, sample_uniform_legal

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state, mask, key):
        def body(carry, _):
            state, mask, key = carry
            key, sub = jax.random.split(key)
            if SAMPLER == "words":
                # round 5: popcount rank-select over (N, S*H) packed legal
                # words — one (N,) uniform instead of an (N, A) u32 draw
                a = sample_uniform_legal(mask, sub, env.cfg.width)
                state, ts = env.step(state, a)
                return (
                    (state, legal_words(env, state.board, state.queue), key),
                    ts.reward.sum(),
                )
            # uniform-legal sampling WITHOUT gumbel noise: iid u32 per
            # action, argmax over legal slots picks uniformly (tie odds
            # ~2^-32).  categorical() would spend two transcendentals
            # (log/exp) per (N, A) element on the VPU — ~60M/step at this
            # batch — for the same distribution.  `| 1` keeps every legal
            # draw strictly above the illegal 0s, so even an all-zero draw
            # row cannot argmax onto an illegal action.
            bits = jax.random.bits(sub, mask.shape, jnp.uint32)
            a = jnp.argmax(
                jnp.where(mask, bits | jnp.uint32(1), jnp.uint32(0)), axis=-1
            )
            state, ts = env.step(state, a)
            return (state, ts.action_mask, key), ts.reward.sum()

        # unroll=4: lets XLA overlap consecutive steps (+12% measured)
        (state, mask, key), r = jax.lax.scan(
            body, (state, mask, key), None, length=CHUNK, unroll=4
        )
        return state, mask, key, r.sum()

    # TIMING BARRIER: on the axon tunnel, block_until_ready returns as soon
    # as the work is ENQUEUED (measured 2026-08-17: dispatch 0.3 ms, "block"
    # 0.2 ms, device_get 215 s draining the real work) — it is NOT a
    # completion barrier.  Every window below must end in a device_get
    # (float()) of a value that depends on the whole program.
    carry0 = (
        legal_words(env, state.board, state.queue)
        if SAMPLER == "words"
        else ts.action_mask
    )
    out = chunk(state, carry0, policy_key)  # compile + warmup
    state, mask, key, r = out
    float(r)  # drain compile + warmup before the timed windows
    rates = []
    for w in range(WINDOWS):
        t0 = time.time()
        for _ in range(ITERS):
            state, mask, key, r = chunk(state, mask, key)
        float(r)  # completion barrier (see note above)
        rate = ITERS * CHUNK * num_envs / (time.time() - t0)
        print(f"[bench] window {w}: {rate / 1e6:.2f}M steps/s", file=sys.stderr)
        rates.append(rate)
    rates.sort()
    median = rates[len(rates) // 2]
    print(
        f"[bench] median {median / 1e6:.2f}M, best {rates[-1] / 1e6:.2f}M "
        f"steps/s over {WINDOWS} windows",
        file=sys.stderr,
    )
    return median


def _health_main() -> int:
    """Subprocess body: tiny matmul proves the TPU tunnel is alive."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    y = jax.jit(lambda a: (a @ a).sum())(x)
    # device_get, NOT block_until_ready: the latter only waits for enqueue
    # on the axon tunnel, so it would "pass" on a wedged device
    assert float(y) == 128.0 * 128 * 128
    print(f"[health] ok on {jax.devices()[0].platform}", file=sys.stderr)
    return 0


def _worker_main() -> int:
    """Subprocess body: the real device bench; prints one JSON line."""
    value = bench_device()
    print(json.dumps({"value": value}))
    return 0


def _run_sub(flag: str, timeout: float) -> "subprocess.CompletedProcess | None":
    """Run `python bench.py <flag>` with a timeout; None on timeout."""
    try:
        return subprocess.run(
            [sys.executable, __file__, flag],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            timeout=timeout,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"[bench] {flag} timed out after {timeout:.0f}s", file=sys.stderr)
        return None


def _device_value_resilient() -> "tuple[float, str | None]":
    """(steps/s, error) — orchestrates health + worker subprocesses."""
    deadline = time.time() + DEVICE_BUDGET_S
    backoff = iter(BACKOFF_S)
    last_err = "device bench never attempted"
    healthy = False
    while time.time() < deadline:
        if not healthy:
            r = _run_sub("--health", HEALTH_TIMEOUT_S)
            if r is None or r.returncode != 0:
                last_err = (
                    "health check timed out"
                    if r is None
                    else f"health check rc={r.returncode}"
                )
                wait = next(backoff, BACKOFF_S[-1])
                if time.time() + wait >= deadline:
                    break
                print(
                    f"[bench] tunnel unhealthy ({last_err}); "
                    f"retrying in {wait}s",
                    file=sys.stderr,
                )
                time.sleep(wait)
                continue
            healthy = True
        budget = min(WORKER_TIMEOUT_S, deadline - time.time())
        if budget < 60:
            last_err = "device budget exhausted before worker could run"
            break
        r = _run_sub("--device-worker", budget)
        if r is not None and r.returncode == 0:
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    return float(json.loads(line)["value"]), None
                except (json.JSONDecodeError, KeyError, ValueError, TypeError):
                    continue
            last_err = "worker produced no parseable JSON"
        else:
            last_err = (
                "worker timed out"
                if r is None
                else f"worker rc={r.returncode}"
            )
        # a worker failure may itself have wedged the tunnel: re-health
        healthy = False
        wait = next(backoff, BACKOFF_S[-1])
        if time.time() + wait >= deadline:
            break
        print(
            f"[bench] worker failed ({last_err}); retrying in {wait}s",
            file=sys.stderr,
        )
        time.sleep(wait)
    return 0.0, last_err


def main() -> int:
    # Fail fast on knob typos BEFORE the subprocess loop: a deterministic
    # config error in the worker would otherwise be indistinguishable from
    # a tunnel failure and retried for the whole 55-min device budget.
    from blockpuzzle_tpu.config import PRESETS

    def _knob_error(msg: str) -> int:
        print(
            json.dumps(
                {
                    "metric": "env_steps_per_s_per_chip",
                    "value": 0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": msg,
                }
            )
        )
        return 0

    for name, value, allowed in (
        ("BP_BENCH_PRESET", PRESET, sorted(PRESETS)),
        ("BP_BENCH_MASK_IMPL", MASK_IMPL, ["matmul", "shift", "bitboard"]),
        ("BP_BENCH_MASK_DTYPE", MASK_DTYPE, ["bf16", "int8"]),
        ("BP_BENCH_BACKEND", BACKEND, ["jnp", "hybrid", "pallas"]),
        ("BP_BENCH_STATE_IMPL", STATE_IMPL, ["auto", "u8", "packed"]),
        ("BP_BENCH_SAMPLER", SAMPLER, ["argmax", "words"]),
    ):
        if value not in allowed:
            return _knob_error(f"{name}={value!r} not in {allowed}")
    # contradictory combinations would raise deterministically inside the
    # worker and be retried for the whole device budget — reject them here
    if STATE_IMPL == "packed" and MASK_IMPL != "bitboard":
        return _knob_error(
            "BP_BENCH_STATE_IMPL=packed implies BP_BENCH_MASK_IMPL="
            f"bitboard (got {MASK_IMPL!r})"
        )
    if STATE_IMPL == "packed" and BACKEND != "jnp":
        return _knob_error(
            "BP_BENCH_STATE_IMPL=packed supports BP_BENCH_BACKEND=jnp "
            f"only (got {BACKEND!r})"
        )
    if SAMPLER == "words" and (STATE_IMPL == "u8" or BACKEND != "jnp"
                               or MASK_IMPL != "bitboard"):
        return _knob_error(
            "BP_BENCH_SAMPLER=words needs the packed engine "
            "(BP_BENCH_STATE_IMPL auto/packed, BP_BENCH_BACKEND=jnp, "
            f"BP_BENCH_MASK_IMPL=bitboard); got state_impl={STATE_IMPL!r} "
            f"backend={BACKEND!r} mask_impl={MASK_IMPL!r}"
        )
    try:
        if int(NUM_ENVS_RAW) <= 0:
            return _knob_error(
                f"BP_BENCH_NUM_ENVS={NUM_ENVS_RAW!r} must be positive"
            )
    except ValueError:
        return _knob_error(
            f"BP_BENCH_NUM_ENVS={NUM_ENVS_RAW!r} is not an integer"
        )

    oracle_sps = bench_oracle()
    print(
        f"[bench] oracle single-env: {oracle_sps:,.0f} steps/s (1 CPU core)",
        file=sys.stderr,
    )
    value, error = _device_value_resilient()
    if error is None:
        print(
            f"[bench] device batched: {value / 1e6:.2f}M steps/s "
            f"({value / oracle_sps:,.0f}x oracle)",
            file=sys.stderr,
        )
    result = {
        "metric": "env_steps_per_s_per_chip",
        "value": round(value),
        "unit": "steps/s",
        "vs_baseline": round(value / BASELINE_STEPS_PER_S, 3),
    }
    if error is not None:
        result["error"] = error
    print(json.dumps(result))
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    if "--health" in sys.argv:
        raise SystemExit(_health_main())
    if "--device-worker" in sys.argv:
        raise SystemExit(_worker_main())
    raise SystemExit(main())
