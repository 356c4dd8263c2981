#!/bin/bash
# Round-4 stage 3 (serial): consistency re-benches under the packed
# default + a 3-seed PPO short-horizon spread.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 3600 "$@"
  echo "=== rc=$? $(date +%H:%M:%S)"
}

for P in tenten woodoku; do
  run env BP_BENCH_PRESET=$P "$PY" bench.py
done
run "$PY" scripts/bench_learner.py --variants mlp
for SEED in 1 2; do
  run "$PY" scripts/sweep_ppo.py --configs base --updates 20000 --torso mlp \
      --seed "$SEED" --num-envs 4096 --log-every 5000
done
run "$PY" bench.py
echo "=== STAGE3 DONE $(date +%H:%M:%S)"
