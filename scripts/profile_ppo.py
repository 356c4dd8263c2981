"""PPO update time breakdown on the live device (VERDICT.md round 1, item 4).

Times the full jitted update and its two halves (rollout+GAE vs minibatch
epochs) separately, plus epoch variants that remove suspected overhead:

  * perm      — production path: random permutation + jnp.take minibatches
  * noperm    — arange "permutation" (isolates the cost of the random perm
                sort itself; take gathers remain)
  * reshape   — contiguous reshape minibatches, no permutation, no gather
  * roll      — one random roll of the flat batch, then contiguous reshape
                (cheap shuffle candidate: 2 dynamic slices, no gather)

All timings use device_get barriers (axon block_until_ready returns at
enqueue; see bench.py).  Output: one JSON line with ms per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow `python scripts/<name>.py` without PYTHONPATH (the package is
# not pip-installed; the interpreter puts scripts/, not the repo root,
# on sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import optax


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--rollout-len", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--platform", choices=["auto", "cpu"], default="auto")
    args = p.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from blockpuzzle_tpu.env import make_env
    from blockpuzzle_tpu.learn import PPO, PPOConfig
    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    env = make_env()
    cfg = PPOConfig(num_envs=args.num_envs, rollout_len=args.rollout_len)
    ppo = PPO(env, cfg)
    state = ppo.init(jax.random.key(0))

    def timed(fn, *fn_args, barrier, label):
        out = fn(*fn_args)
        float(barrier(out))  # compile + drain
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*fn_args)
        float(barrier(out))
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"[profile] {label}: {ms:.1f} ms", file=sys.stderr)
        return ms, out

    results = {}

    # full update (no donation: state reused across timings)
    update = jax.jit(ppo.update)
    results["update_ms"], _ = timed(
        update, state, barrier=lambda o: o[1]["loss"], label="full update"
    )

    # rollout + GAE only
    def rollout_gae(st):
        st2, batch, last_value, stats = ppo._rollout(st)
        adv, ret = ppo._gae(batch, last_value)
        return adv.sum() + ret.sum() + batch.reward.sum()

    results["rollout_gae_ms"], _ = timed(
        jax.jit(rollout_gae), state, barrier=lambda o: o, label="rollout+GAE"
    )

    # materialize one batch for the epoch variants
    st2, batch, last_value, _ = jax.jit(ppo._rollout)(state)
    adv, ret = jax.jit(ppo._gae)(batch, last_value)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    batch_flat = jax.tree.map(flat, batch)
    adv_flat, ret_flat = flat(adv), flat(ret)
    total = cfg.rollout_len * cfg.num_envs
    mb = total // cfg.num_minibatches

    # batch tensors are passed as JIT ARGUMENTS, not closed over: device-
    # resident closure constants are copied device->host during lowering
    # (env/core.py table note — the exact pathology that wedged BENCH_r01),
    # and here that would be ~80 MB x 4 variant compiles through the tunnel
    def epochs(params, opt_state, key, batch_flat, adv_flat, ret_flat, mode):
        def one_epoch(carry, _):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            if mode == "perm":
                order = jax.random.permutation(k, total)
            elif mode == "noperm":
                order = jnp.arange(total)
            if mode in ("perm", "noperm"):
                idxs = order.reshape(cfg.num_minibatches, mb)

                def get_mb(i):
                    take = lambda x: jnp.take(x, idxs[i], axis=0)
                    return (jax.tree.map(take, batch_flat),
                            take(adv_flat), take(ret_flat))
            else:
                if mode == "roll":
                    shift = jax.random.randint(k, (), 0, total)
                    roll = lambda x: jnp.roll(x, shift, axis=0)
                else:
                    roll = lambda x: x
                bf = jax.tree.map(roll, batch_flat)
                af, rf = roll(adv_flat), roll(ret_flat)

                def get_mb(i):
                    sl = lambda x: jax.lax.dynamic_slice_in_dim(
                        x, i * mb, mb, axis=0
                    )
                    return jax.tree.map(sl, bf), sl(af), sl(rf)

            def mb_step(carry, i):
                params, opt_state = carry
                m, a, r = get_mb(i)
                grads, metrics = jax.grad(ppo._loss, has_aux=True)(
                    params, m, a, r
                )
                # tx is direction-only; apply -lr as in PPO.update
                updates, opt_state = ppo.tx.update(grads, opt_state, params)
                params = optax.apply_updates(
                    params, jax.tree.map(lambda u: -cfg.lr * u, updates)
                )
                return (params, opt_state), metrics["loss"]

            (params, opt_state), losses = jax.lax.scan(
                mb_step, (params, opt_state),
                jnp.arange(cfg.num_minibatches),
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            one_epoch, (params, opt_state, key), None, length=cfg.num_epochs
        )
        return losses.mean()

    for mode in ("perm", "noperm", "reshape", "roll"):
        fn = jax.jit(
            lambda p, o, k, bf, af, rf, m=mode: epochs(p, o, k, bf, af, rf, m)
        )
        results[f"epochs_{mode}_ms"], _ = timed(
            fn, state.params, state.opt_state, state.key,
            batch_flat, adv_flat, ret_flat,
            barrier=lambda o: o, label=f"epochs[{mode}]",
        )

    results["frames_per_s"] = round(total / (results["update_ms"] / 1e3))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
