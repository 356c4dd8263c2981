"""Parity CLI: seeded trajectory/return parity harness (BASELINE config 1).

Records seeded random-policy episodes on the CPU oracle and replays them
bit-for-bit through the batched device engine (SURVEY.md §3.5).  Exit code 0
iff every compared quantity is bit-equal.  The reference mount was empty at
build time (SURVEY.md §0), so the oracle is the canonical parity target.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

from blockpuzzle_tpu.config import PRESETS
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.oracle import record_trajectory


_REPLAY_CACHE: dict = {}


def replay_on_device(env, init_deals, actions, deals):
    """Replay a recorded episode as ONE device program (no per-step host
    round trips — SURVEY.md §3.5 "batched offline compare").

    Returns stacked (T, ...) boards/queues/masks/rewards/terminated.
    """
    cached = _REPLAY_CACHE.get(id(env))
    if cached is not None:
        return cached(
            jnp.asarray(init_deals), jnp.asarray(actions), jnp.asarray(deals)
        )

    @jax.jit
    def run(init_deals, actions, deals):
        state, ts0 = env.init(jax.random.key(0), 1, deal_override=init_deals)

        def body(state, xs):
            a, d = xs
            state, ts = env.step(
                state, a[None], deal_override=d[None], auto_reset=False
            )
            return state, (
                ts.board[0],
                ts.queue[0],
                ts.action_mask[0],
                ts.reward[0],
                ts.terminated[0],
            )

        _, outs = jax.lax.scan(body, state, (actions, deals))
        return ts0, outs

    _REPLAY_CACHE[id(env)] = run
    return run(jnp.asarray(init_deals), jnp.asarray(actions), jnp.asarray(deals))


def check_seed(cfg, seed: int, max_steps: int, env=None) -> dict:
    traj = record_trajectory(cfg, seed=seed, max_steps=max_steps)
    if env is None:
        env = make_env(cfg)
    # pad the episode to a fixed length so every seed reuses ONE compiled
    # replay program; padded steps feed empty deals + action 0 and are
    # ignored in the comparison
    T = len(traj.actions)
    pad = max_steps - T
    actions = np.concatenate([traj.actions, np.zeros(pad, np.int32)])
    deals = np.concatenate(
        [traj.deals,
         np.full((pad, cfg.queue_size), env.empty_id, np.int32)]
    )
    ts0, (boards, queues, masks, rewards, terms) = replay_on_device(
        env, traj.init_deals[None], actions, deals
    )
    boards, queues, masks, rewards, terms = jax.tree.map(
        lambda x: np.asarray(x)[:T], (boards, queues, masks, rewards, terms)
    )
    mismatches = []

    def cmp(name, got, want):
        got = np.asarray(got)
        if got.shape != want.shape or not np.array_equal(got, want):
            bad = np.nonzero(
                ~np.all(
                    (got == want).reshape(got.shape[0], -1), axis=1
                )
            )[0] if got.shape == want.shape else []
            mismatches.append(f"{name}@t={list(bad[:3])}")

    cmp("board0", np.asarray(ts0.board[0]), traj.boards[0])
    T = len(traj.actions)
    cmp("board", np.asarray(boards).reshape(T, -1),
        traj.boards[1:].reshape(T, -1))
    cmp("queue", np.asarray(queues), traj.queues[1:])
    cmp("mask", np.asarray(masks), traj.masks[1:])
    cmp("reward", np.asarray(rewards), traj.rewards)
    cmp("terminated", np.asarray(terms), traj.terminated)
    return {
        "seed": seed,
        "steps": T,
        "oracle_return": traj.episode_return,
        "device_return": float(np.asarray(rewards).sum()),
        "mismatches": mismatches,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="seeded oracle↔device parity check")
    p.add_argument("--preset", choices=sorted(PRESETS), default="default")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=512)
    args = p.parse_args(argv)

    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = PRESETS[args.preset]()
    env = make_env(cfg)
    failed = False
    for seed in range(args.seeds):
        r = check_seed(cfg, seed, args.max_steps, env=env)
        ok = not r["mismatches"] and r["oracle_return"] == r["device_return"]
        status = "OK " if ok else "FAIL"
        print(
            f"[{status}] seed {seed}: {r['steps']} steps, "
            f"return oracle={r['oracle_return']:.1f} device={r['device_return']:.1f}"
            + (f" mismatches: {r['mismatches'][:5]}" if r["mismatches"] else "")
        )
        failed |= not ok
    print("parity:", "FAIL" if failed else "PASS (bit-exact)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
