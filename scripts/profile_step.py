"""Per-op device profile of the bench step loop (next-bottleneck finder).

Captures a ``jax.profiler`` trace around a few scan chunks of the bench
workload (uniform-legal random policy), parses the trace-viewer JSON the
profiler writes (``plugins/profile/*/**.trace.json.gz``), and prints the
top device ops by total time, normalized to us per env-step.

Usage (TPU):  PYTHONPATH=. python scripts/profile_step.py --num-envs 32768
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

# allow `python scripts/<name>.py` without PYTHONPATH (the package is
# not pip-installed; the interpreter puts scripts/, not the repo root,
# on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=32768)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--chunks", type=int, default=3, help="traced chunks")
    p.add_argument("--unroll", type=int, default=4)
    p.add_argument("--mask-dtype", choices=["bf16", "int8"], default="int8",
                   help="legality-matmul operand dtype (matmul impl only)")
    p.add_argument("--mask-impl",
                   choices=["bitboard", "shift", "matmul"],
                   default="bitboard", help="match bench.py's default")
    p.add_argument("--preset", default="default")
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from blockpuzzle_tpu.env import make_env
    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from blockpuzzle_tpu.config import PRESETS

    env = make_env(
        PRESETS[args.preset](),
        mask_dtype=args.mask_dtype,
        mask_impl=args.mask_impl,
    )
    state, ts = env.init_jit(jax.random.key(0), args.num_envs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state, mask, key):
        def body(carry, _):
            state, mask, key = carry
            key, sub = jax.random.split(key)
            # `| 1`: legal draws stay above illegal 0s even on an all-zero
            # draw row (matches bench.py's sampler exactly)
            bits = jax.random.bits(sub, mask.shape, jnp.uint32)
            a = jnp.argmax(
                jnp.where(mask, bits | jnp.uint32(1), jnp.uint32(0)), axis=-1
            )
            state, ts = env.step(state, a)
            return (state, ts.action_mask, key), ts.reward.sum()

        (state, mask, key), r = jax.lax.scan(
            body, (state, mask, key), None, length=args.chunk,
            unroll=args.unroll,
        )
        return state, mask, key, r.sum()

    key = jax.random.key(1, impl="rbg")
    state, mask, key, r = chunk(state, ts.action_mask, key)
    float(r)  # compile + drain (device_get barrier; see bench.py)

    tmp = tempfile.mkdtemp(prefix="bp_step_trace_")
    t0 = time.time()
    jax.profiler.start_trace(tmp)
    for _ in range(args.chunks):
        state, mask, key, r = chunk(state, mask, key)
    float(r)
    jax.profiler.stop_trace()
    wall = time.time() - t0
    n_steps = args.chunks * args.chunk
    print(
        f"[profile] {n_steps} steps traced in {wall:.2f}s "
        f"({args.num_envs * n_steps / wall / 1e6:.1f}M steps/s incl. trace "
        f"overhead)",
        file=sys.stderr,
    )

    paths = glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print(json.dumps({"error": f"no trace under {tmp}"}))
        return 1
    with gzip.open(paths[0]) as f:
        data = json.load(f)
    # device-side complete events: pid of TPU tracks carry "/device:" names
    device_pids = {
        e["pid"]
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    durs: dict = collections.defaultdict(float)
    counts: dict = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            durs[e["name"]] += e.get("dur", 0.0)  # us
            counts[e["name"]] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]
    total_us = sum(durs.values())
    rows = [
        {
            "op": name,
            "us_per_step": round(us / n_steps, 2),
            "count": counts[name],
            "pct": round(100 * us / total_us, 1),
        }
        for name, us in top
    ]
    for r_ in rows:
        print(
            f"[profile] {r_['us_per_step']:>8.2f} us/step  {r_['pct']:>5.1f}%"
            f"  {r_['op'][:90]}",
            file=sys.stderr,
        )
    print(json.dumps({
        "num_envs": args.num_envs,
        "mask_impl": args.mask_impl,
        "mask_dtype": args.mask_dtype,
        "preset": args.preset,
        "steps": n_steps,
        "device_total_us_per_step": round(total_us / n_steps, 2),
        "top_ops": rows,
        "trace_dir": tmp,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
