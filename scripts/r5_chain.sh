#!/bin/bash
# Round-5 TPU chain (serial — one TPU process at a time; CLAUDE.md).
# Executes VERDICT r4 "next round" items in priority order under a hard
# wall-clock deadline so the driver's end-of-round bench.py finds the
# chip free.  Each stage is guarded by need(): if the remaining window
# cannot fit the stage's ESTIMATE, it is skipped (logged) and the chain
# moves to the next (cheaper) stage — the tail stages are sacrificial.
#
#   A. probes  — packed batch-scaling rows (item 4), dueling+PER on the
#                exact sampler (item 5), lost stage-3 seed-2 short run +
#                queue_mode=planes A/B (items 2/7).
#   B. w2048 flagship at FULL budget, schedule scaled to 300k (item 1).
#   C. seed-1 replicate of the exact 500k lranneal recipe (item 2).
#   D. woodoku 300k with the scaled LR recipe (item 3).
#   F. seed-2 replicate of the 500k recipe (item 2, opportunistic).
#   E. tenten 150k (item 3, opportunistic).
#   G. optional tail hook (scripts/r5_tail.sh, written later if needed).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
DEADLINE=${R5_DEADLINE:-$(( $(date +%s) + 37800 ))}   # default: now + 10.5h

run() {  # run <timeout_s> <cmd...> — timeout clamped to the DEADLINE so
  # an admitted stage can never hold the one-process TPU through the
  # driver's end-of-round bench window (review finding: the per-stage
  # timeouts exceed their need() estimates)
  local t=$1; shift
  local now cap
  now=$(date +%s); cap=$(( DEADLINE - now - 60 ))
  (( t > cap )) && t=$cap
  if (( t < 1 )); then
    echo "=== SKIP (past deadline) $*"
    return 1
  fi
  echo "=== $(date +%H:%M:%S) $*"
  timeout "$t" "$@"
  echo "=== rc=$? $(date +%H:%M:%S)"
}

need() {  # need <estimate_s> <label> -> 0 if the window fits
  local now; now=$(date +%s)
  if (( now + $1 > DEADLINE )); then
    echo "=== SKIP '$2' (needs ${1}s, $(( DEADLINE - now ))s left)"
    return 1
  fi
  return 0
}

# --- A. probes -----------------------------------------------------------
if need 2400 "bench N=32768 packed"; then
  run 2700 env BP_BENCH_NUM_ENVS=32768 "$PY" bench.py
fi
if need 2400 "bench N=65536 packed"; then
  run 2700 env BP_BENCH_NUM_ENVS=65536 "$PY" bench.py
fi
if need 1800 "DQN dueling+PER exact-sampler probe"; then
  run 2400 "$PY" -m blockpuzzle_tpu.cli.train --algo dqn --torso mlp \
      --num-envs 1024 --updates 20000 --eps-decay 12000 --seed 0 \
      --dueling --per --checkpoint-dir ckpt_dqn_duelper_exact \
      --checkpoint-every 20000 --log-every 1000
  run 1200 "$PY" -m blockpuzzle_tpu.cli.evaluate \
      --checkpoint-dir ckpt_dqn_duelper_exact --greedy --steps 2048
fi
if need 1800 "PPO 20k seed-2 short replicate"; then
  run 3600 "$PY" scripts/sweep_ppo.py --configs base --updates 20000 \
      --torso mlp --seed 2 --num-envs 4096 --log-every 5000
fi
if need 1800 "PPO 20k queue_mode=planes A/B (vs 363.8 embed seed 0)"; then
  run 3600 "$PY" scripts/sweep_ppo.py --configs base --updates 20000 \
      --torso mlp --seed 0 --num-envs 4096 --queue-mode planes \
      --log-every 5000
fi

# --- B. w2048 flagship, full budget (VERDICT item 1) ---------------------
# 300k updates with the hold-then-cosine schedule scaled to the horizon
# (hold to 150k, cosine to 3e-5 at 300k) — the round-4 140k run compressed
# the cosine into a truncated window and strangled a still-accelerating
# curve (VERDICT r4 weak #1).  ~4h train @5.5M frames/s + ~30 min evals.
if need 17000 "w2048 300k flagship"; then
  run 21600 "$PY" scripts/sweep_ppo.py --configs base --updates 300000 \
      --torso mlp --mlp-width 2048 --num-envs 4096 --log-every 2000 \
      --seed 0 --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_w2048_full --checkpoint-every 25000 \
      --keep 14 --eval-kept --metrics-jsonl runs/w2048_300k_metrics.jsonl
fi

# --- C. seed-1 replicate of the exact 500k lranneal recipe (item 2) ------
if need 12500 "lranneal 500k seed 1"; then
  run 16200 "$PY" scripts/sweep_ppo.py --configs base --updates 500000 \
      --torso mlp --seed 1 --num-envs 4096 --log-every 2000 \
      --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_lranneal_s1 --checkpoint-every 25000 \
      --keep 25 --eval-kept --metrics-jsonl runs/lranneal_s1_metrics.jsonl
fi

# --- D. woodoku 300k (item 3) --------------------------------------------
if need 8000 "woodoku 300k"; then
  run 10800 "$PY" scripts/sweep_ppo.py --configs base --updates 300000 \
      --torso mlp --preset woodoku --num-envs 2048 --log-every 10000 \
      --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_woodoku300k --checkpoint-every 25000 \
      --keep 14 --eval-kept --metrics-jsonl runs/woodoku300k_metrics.jsonl
fi

# --- F. seed-2 replicate (item 2, opportunistic) --------------------------
if need 12500 "lranneal 500k seed 2"; then
  run 14400 "$PY" scripts/sweep_ppo.py --configs base --updates 500000 \
      --torso mlp --seed 2 --num-envs 4096 --log-every 2000 \
      --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_lranneal_s2 --checkpoint-every 25000 \
      --keep 25 --eval-kept --metrics-jsonl runs/lranneal_s2_metrics.jsonl
fi

# --- E. tenten 150k (item 3, opportunistic) --------------------------------
if need 4500 "tenten 150k"; then
  run 7200 "$PY" scripts/sweep_ppo.py --configs base --updates 150000 \
      --torso mlp --preset tenten --num-envs 2048 --log-every 10000 \
      --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_tenten150k --checkpoint-every 25000 \
      --keep 10 --eval-kept --metrics-jsonl runs/tenten150k_metrics.jsonl
fi

# --- G. tail hook (perf-candidate benches etc., authored mid-round) -------
if [ -f scripts/r5_tail.sh ]; then
  bash scripts/r5_tail.sh
fi

echo "=== R5 CHAIN DONE $(date +%H:%M:%S) (deadline was $(date -d @"$DEADLINE" +%H:%M:%S))"
