#!/bin/bash
# Round-5 scored-session TPU chain (serial — one TPU process at a time;
# CLAUDE.md).  The earlier r5_chain.sh ran its probe stage in a prior
# window (results in docs/RESULTS.md) but the workspace was reset before
# the big runs landed; this script executes the remaining VERDICT r4
# items that fit THIS session's ~5.3h TPU window, in priority order:
#
#   B. w2048 flagship at FULL budget (item 1, top priority): 300k
#      updates, hold-to-150k then cosine to 3e-5 — the schedule the
#      round-4 140k run compressed (VERDICT r4 weak #1).  ~4h train
#      @5.5M frames/s + ~30 min kept-checkpoint evals.
#   E. tenten 150k (item 3, opportunistic — will not fit unless the
#      flagship finishes early).
#
# Items that cannot fit the serial-TPU window are documented as deferred
# in docs/ROADMAP.md: the 500k seed replicates (item 2; the 3-seed
# short-horizon band 347.4/355.2/363.8 stands as the partial evidence)
# and woodoku 300k (item 3).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
DEADLINE=${R5_DEADLINE:-1787271600}   # 00:20 UTC — chip free for the driver bench

run() {  # run <timeout_s> <cmd...>
  local t=$1; shift
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

# --- B. w2048 flagship, full budget (VERDICT r4 item 1) -------------------
if need 16200 "w2048 300k flagship"; then
  CAP=$(( DEADLINE - $(date +%s) - 120 ))
  run "$CAP" "$PY" scripts/sweep_ppo.py --configs base --updates 300000 \
      --torso mlp --mlp-width 2048 --num-envs 4096 --log-every 2000 \
      --seed 0 --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_w2048_full --checkpoint-every 25000 \
      --keep 14 --eval-kept --metrics-jsonl runs/w2048_300k_metrics.jsonl
fi

# --- E. tenten 150k (item 3, opportunistic) --------------------------------
if need 5100 "tenten 150k"; then
  CAP=$(( DEADLINE - $(date +%s) - 120 ))
  run "$CAP" "$PY" scripts/sweep_ppo.py --configs base --updates 150000 \
      --torso mlp --preset tenten --num-envs 2048 --log-every 10000 \
      --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_tenten150k --checkpoint-every 25000 \
      --keep 10 --eval-kept --metrics-jsonl runs/tenten150k_metrics.jsonl
fi

# --- tail hook (short probes authored mid-session) -------------------------
if [ -f scripts/r5_session_tail.sh ]; then
  bash scripts/r5_session_tail.sh
fi

echo "=== R5 SESSION CHAIN DONE $(date +%H:%M:%S) (deadline $(date -u -d @"$DEADLINE" +%H:%M:%S))"
