"""Roofline accounting for the headline env-step bench (VERDICT r2 item 2).

"No extractable op remains" (docs/RESULTS.md) describes XLA's fusion view,
not the machine's ceiling.  This script bounds the measured steps/s against
TPU v5e hardware peaks:

  * builds bench.py's EXACT chunk program (same make_env knobs, same
    bits-argmax uniform-legal sampler, same scan/unroll),
  * asks the compiled executable for XLA's own cost model numbers
    (``Compiled.cost_analysis()``: flops, bytes accessed, per-memory-space
    breakdown where exposed),
  * optionally re-times the chunk (same window protocol as bench.py),
  * prints bytes/step/env, FLOPs/step/env, the HBM-bound and MXU-bound
    step-time floors, and the achieved fraction of each bound.

TPU v5e (v5 lite) public peaks (see jax-ml.github.io/scaling-book):
bf16 197 TFLOP/s, int8 394 TOP/s, HBM 819 GB/s.

Usage:
  PYTHONPATH=. python scripts/roofline.py [--num-envs 49152] [--no-time]
  (--platform cpu for a program-shape smoke run; the cost numbers are only
  meaningful when compiled for the TPU.)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_BYTES_PER_S = 819e9
V5E_BF16_FLOPS = 197e12
V5E_INT8_OPS = 394e12


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=49152)
    p.add_argument("--chunk", type=int, default=400)
    p.add_argument("--preset", default="default")
    p.add_argument("--mask-impl", default="bitboard")
    p.add_argument("--mask-dtype", default="int8")
    p.add_argument("--no-time", action="store_true",
                   help="cost analysis only (no timed windows)")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto")
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blockpuzzle_tpu.config import PRESETS
    from blockpuzzle_tpu.env import make_env
    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    env = make_env(
        PRESETS[args.preset](),
        mask_dtype=args.mask_dtype,
        mask_impl=args.mask_impl,
    )
    num_envs, chunk_len = args.num_envs, args.chunk
    state, ts = env.init_jit(jax.random.key(0), num_envs)
    policy_key = jax.random.key(1, impl="rbg")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state, mask, key):
        def body(carry, _):
            state, mask, key = carry
            key, sub = jax.random.split(key)
            bits = jax.random.bits(sub, mask.shape, jnp.uint32)
            a = jnp.argmax(
                jnp.where(mask, bits | jnp.uint32(1), jnp.uint32(0)), axis=-1
            )
            state, ts = env.step(state, a)
            return (state, ts.action_mask, key), ts.reward.sum()

        (state, mask, key), r = jax.lax.scan(
            body, (state, mask, key), None, length=chunk_len, unroll=4
        )
        return state, mask, key, r.sum()

    lowered = chunk.lower(state, ts.action_mask, policy_key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    # cost_analysis may return a list (one per computation) on some versions
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    steps = num_envs * chunk_len
    flops = float(ca.get("flops", 0.0))
    byt = float(ca.get("bytes accessed", 0.0))
    out = {
        "metric": "roofline",
        "num_envs": num_envs,
        "chunk": chunk_len,
        "mask_impl": args.mask_impl,
        "flops_per_step_env": flops / steps if flops else None,
        "bytes_per_step_env": byt / steps if byt else None,
    }
    # per-memory-space byte counts when the backend exposes them
    spaces = {k: v for k, v in ca.items() if k.startswith("bytes accessed")}
    for k, v in sorted(spaces.items()):
        print(f"[roofline] {k}: {float(v) / steps:.1f} B/step/env",
              file=sys.stderr)
    print(f"[roofline] flops: {flops / steps:.1f} FLOP/step/env, "
          f"total bytes: {byt / steps:.1f} B/step/env", file=sys.stderr)

    # hardware floors for one batched step of N envs
    if byt:
        t_hbm = (byt / chunk_len) / V5E_HBM_BYTES_PER_S
        out["hbm_floor_us_per_batched_step"] = t_hbm * 1e6
        out["hbm_bound_steps_per_s"] = num_envs / t_hbm
    if flops:
        t_mxu = (flops / chunk_len) / V5E_BF16_FLOPS
        out["mxu_bf16_floor_us_per_batched_step"] = t_mxu * 1e6
        out["mxu_bound_steps_per_s"] = num_envs / t_mxu

    if not args.no_time:
        carry = chunk(state, ts.action_mask, policy_key)
        state, mask, key, r = carry
        float(r)  # drain compile+warmup (axon: device_get barrier, CLAUDE.md)
        rates = []
        for w in range(args.windows):
            t0 = time.time()
            for _ in range(args.iters):
                state, mask, key, r = chunk(state, mask, key)
            float(r)
            rates.append(args.iters * chunk_len * num_envs / (time.time() - t0))
            print(f"[roofline] window {w}: {rates[-1] / 1e6:.2f}M steps/s",
                  file=sys.stderr)
        rates.sort()
        measured = rates[len(rates) // 2]
        out["measured_steps_per_s"] = round(measured)
        t_meas = num_envs / measured
        out["measured_us_per_batched_step"] = t_meas * 1e6
        if byt:
            out["pct_of_hbm_bound"] = round(
                100.0 * out["hbm_floor_us_per_batched_step"]
                / (t_meas * 1e6), 1)
        if flops:
            out["pct_of_mxu_bound"] = round(
                100.0 * out["mxu_bf16_floor_us_per_batched_step"]
                / (t_meas * 1e6), 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
