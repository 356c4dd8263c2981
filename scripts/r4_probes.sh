#!/bin/bash
# Round-4 TPU probe chain (run serially — ONE TPU process at a time):
#   1. Determinism probe (VERDICT r3 item 3): four 20k-update mlp PPO runs,
#      same seed, differing ONLY in host cadence (log-every / checkpoint),
#      plus one exact repeat; full-precision metrics streams compared
#      bit-exactly by scripts/compare_metrics.py.
#   2. DQN multi-seed (VERDICT r3 item 5): 3 seeds x 20k iters of the
#      383.1-recipe to put error bars on the "DQN ceiling" claim.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 3600 "$PY" "$@"
  echo "=== rc=$? $(date +%H:%M:%S)"
}

SWEEP="scripts/sweep_ppo.py --configs base --updates 20000 --torso mlp --seed 0 --num-envs 4096"

run $SWEEP --log-every 2000  --metrics-jsonl runs/det_d1.jsonl
run $SWEEP --log-every 2000  --metrics-jsonl runs/det_d2.jsonl
run $SWEEP --log-every 10000 --metrics-jsonl runs/det_d3.jsonl
run $SWEEP --log-every 2000  --metrics-jsonl runs/det_d4.jsonl \
    --checkpoint-dir /tmp/det_ckpt_d4 --checkpoint-every 5000 --keep 2

echo "=== determinism compare (d1 vs d2: exact repeat) ==="
"$PY" scripts/compare_metrics.py runs/det_d1.jsonl runs/det_d2.jsonl
echo "=== determinism compare (d1 vs d3: log cadence) ==="
"$PY" scripts/compare_metrics.py runs/det_d1.jsonl runs/det_d3.jsonl
echo "=== determinism compare (d1 vs d4: checkpoint cadence) ==="
"$PY" scripts/compare_metrics.py runs/det_d1.jsonl runs/det_d4.jsonl

for SEED in 0 1 2; do
  run -m blockpuzzle_tpu.cli.train --algo dqn --torso mlp --num-envs 1024 \
      --updates 20000 --eps-decay 12000 --seed "$SEED" \
      --checkpoint-dir "ckpt_dqn_seed$SEED" --checkpoint-every 20000 \
      --log-every 1000
  run -m blockpuzzle_tpu.cli.evaluate --checkpoint-dir "ckpt_dqn_seed$SEED" \
      --algo dqn --torso mlp --greedy --steps 2048 --seed $((100 + SEED))
done
echo "=== ALL PROBES DONE $(date +%H:%M:%S)"
