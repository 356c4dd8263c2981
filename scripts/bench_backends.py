"""Backend comparison: jnp vs hybrid vs pallas on the live device.

Produces the hardware evidence VERDICT.md round 1 asked for (item 2): a
timed compile smoke + steady-state steps/s for every engine backend, so
docs/CAPABILITIES.md's claims about the Pallas path carry a recorded
artifact instead of an assertion.

Each backend runs in its OWN subprocess with a timeout: a Pallas compile
hang on the axon platform (observed: a trivial pallas_call exceeding 120 s,
SURVEY.md §7.0) must cost one timeout, not the session.  Run with no args
to orchestrate all backends serially (one TPU process at a time); the
per-backend worker mode is `--backend <name>`.

Protocol (deliberately smaller than bench.py's headline so Pallas compile
stays tractable): N=16384 envs, 100-step chunks, no unroll, median of 3
windows.  Numbers are comparable ACROSS backends here, not with bench.py.
"""

from __future__ import annotations

import argparse
import functools
import json
import subprocess
import os
import sys

# allow `python scripts/<name>.py` without PYTHONPATH (the package is
# not pip-installed; the interpreter puts scripts/, not the repo root,
# on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

NUM_ENVS = 16384
CHUNK = 100
ITERS = 10     # ~0.2-0.5 s/window: amortizes the tunnel's device_get RTT
WINDOWS = 3
BACKENDS = ("jnp", "hybrid", "pallas")
WORKER_TIMEOUT_S = 1500


def run_backend(backend: str) -> dict:
    import jax
    import jax.numpy as jnp

    from blockpuzzle_tpu.env import make_env

    env = make_env(backend=backend)
    # NOTE: on the axon tunnel block_until_ready is only an ENQUEUE
    # barrier; device_get (float()/np.asarray) is the completion barrier
    # (see bench.py).  All timings below end in a device_get.
    import numpy as np

    t0 = time.time()
    state, ts = env.init_jit(jax.random.key(0), NUM_ENVS)
    np.asarray(state.rng_counter[0])
    init_s = time.time() - t0

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state, mask, key):
        def body(carry, _):
            state, mask, key = carry
            key, sub = jax.random.split(key)
            a = jax.random.categorical(sub, jnp.where(mask, 0.0, -1e9), axis=-1)
            state, ts = env.step(state, a)
            return (state, ts.action_mask, key), ts.reward.sum()

        (state, mask, key), r = jax.lax.scan(
            body, (state, mask, key), None, length=CHUNK
        )
        return state, mask, key, r.sum()

    key = jax.random.key(1, impl="rbg")
    t0 = time.time()
    out = chunk(state, ts.action_mask, key)
    state, mask, key, r = out
    float(r)
    compile_s = time.time() - t0

    rates = []
    for _ in range(WINDOWS):
        t0 = time.time()
        for _ in range(ITERS):
            state, mask, key, r = chunk(state, mask, key)
        float(r)
        rates.append(ITERS * CHUNK * NUM_ENVS / (time.time() - t0))
    rates.sort()
    return {
        "backend": backend,
        "platform": jax.devices()[0].platform,
        "num_envs": NUM_ENVS,
        "init_s": round(init_s, 2),
        "compile_s": round(compile_s, 2),
        "steps_per_s": round(rates[len(rates) // 2]),
        "best_steps_per_s": round(rates[-1]),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=BACKENDS, default=None)
    p.add_argument("--timeout", type=float, default=WORKER_TIMEOUT_S)
    args = p.parse_args()

    if args.backend:
        print(json.dumps(run_backend(args.backend)))
        return 0

    results = []
    for backend in BACKENDS:
        print(f"[backends] running {backend}...", file=sys.stderr)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--backend", backend],
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                timeout=args.timeout,
                text=True,
            )
        except subprocess.TimeoutExpired:
            results.append({"backend": backend,
                            "error": f"timeout after {args.timeout:.0f}s"})
            continue
        if r.returncode != 0:
            results.append({"backend": backend, "error": f"rc={r.returncode}"})
            continue
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                results.append(json.loads(line))
                break
            except json.JSONDecodeError:
                continue
        else:
            results.append({"backend": backend, "error": "no JSON output"})

    print("| backend | init (s) | compile (s) | median steps/s | note |")
    print("|---|---|---|---|---|")
    for r in results:
        if "error" in r:
            print(f"| {r['backend']} | — | — | — | {r['error']} |")
        else:
            print(
                f"| {r['backend']} | {r['init_s']} | {r['compile_s']} "
                f"| {r['steps_per_s'] / 1e6:.1f}M | {r['platform']} |"
            )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
