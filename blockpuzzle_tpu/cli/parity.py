"""Parity CLI: seeded trajectory/return parity harness (BASELINE config 1).

Records seeded random-policy episodes on the CPU oracle and replays them
bit-for-bit through the batched device engine (SURVEY.md §3.5).  Exit code 0
iff every compared quantity is bit-equal.  The reference mount was empty at
build time (SURVEY.md §0), so the oracle is the canonical parity target.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from blockpuzzle_tpu.config import PRESETS, cli_env_config
from blockpuzzle_tpu.env import make_env
from blockpuzzle_tpu.oracle import record_trajectory


def replay_on_device(env, init_deals, actions, deals):
    """Replay a recorded episode as ONE device program (no per-step host
    round trips — SURVEY.md §3.5 "batched offline compare").

    The jitted replay program is cached on the env object itself (a
    module-global id() keyed dict would pin every env forever).
    Returns stacked (T, ...) boards/queues/masks/rewards/terminated.
    """
    cached = getattr(env, "_parity_replay_fn", None)
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

    env._parity_replay_fn = run
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


def check_batched_lockstep(cfg, env, seeds, max_steps: int) -> dict:
    """All seeds replayed in ONE lockstep batch (BASELINE config 2: batched
    semantics == independent single-env runs).  Each oracle episode is
    compared within its own length; shorter episodes pad with no-op deals.
    """
    trajs = [record_trajectory(cfg, seed=s, max_steps=max_steps) for s in seeds]
    B = len(trajs)
    T = max_steps
    actions = np.zeros((T, B), np.int32)
    deals = np.full((T, B, cfg.queue_size), env.empty_id, np.int32)
    for b, tr in enumerate(trajs):
        actions[: len(tr.actions), b] = tr.actions
        deals[: len(tr.actions), b] = tr.deals
    init_deals = np.stack([tr.init_deals for tr in trajs])

    @jax.jit
    def run(init_deals, actions, deals):
        state, ts0 = env.init(jax.random.key(0), B, deal_override=init_deals)

        def body(state, xs):
            a, d = xs
            state, ts = env.step(state, a, deal_override=d, auto_reset=False)
            return state, (ts.board, ts.reward, ts.terminated)

        _, outs = jax.lax.scan(body, state, (actions, deals))
        return outs

    boards, rewards, terms = jax.tree.map(
        np.asarray, run(jnp.asarray(init_deals), jnp.asarray(actions), jnp.asarray(deals))
    )
    mismatches = []
    for b, tr in enumerate(trajs):
        L = len(tr.actions)
        if not np.array_equal(
            boards[:L, b].reshape(L, -1), tr.boards[1:].reshape(L, -1)
        ):
            mismatches.append(f"board@env{b}")
        if not np.array_equal(rewards[:L, b], tr.rewards):
            mismatches.append(f"reward@env{b}")
        if not np.array_equal(terms[:L, b], tr.terminated):
            mismatches.append(f"terminated@env{b}")
    return {
        "episodes": B,
        "returns_equal": all(
            float(rewards[: len(tr.actions), b].sum()) == tr.episode_return
            for b, tr in enumerate(trajs)
        ),
        "mismatches": mismatches,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="seeded oracle↔device parity check")
    p.add_argument("--preset", choices=sorted(PRESETS), default="default")
    p.add_argument("--env", action="append", default=[], metavar="KEY=VALUE",
                   help="override any EnvConfig field on top of --preset "
                        "(repeatable), e.g. --env streak_bonus=5 "
                        "--env queue_size=3")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=512)
    p.add_argument("--batch", action="store_true",
                   help="replay all seeds in one lockstep batch (config 2)")
    args = p.parse_args(argv)

    from blockpuzzle_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = cli_env_config(args.preset, args.env)
    env = make_env(cfg)
    if args.batch:
        r = check_batched_lockstep(
            cfg, env, list(range(args.seeds)), args.max_steps
        )
        ok = r["returns_equal"] and not r["mismatches"]
        print(
            f"[{'OK ' if ok else 'FAIL'}] lockstep batch of {r['episodes']} "
            f"episodes, returns equal: {r['returns_equal']}"
            + (f", mismatches: {r['mismatches'][:5]}" if r["mismatches"] else "")
        )
        print("parity:", "PASS (bit-exact)" if ok else "FAIL")
        return 0 if ok else 1
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
