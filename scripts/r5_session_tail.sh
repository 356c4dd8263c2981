#!/bin/bash
# Round-5 session tail (invoked by r5_session.sh after the flagship):
# 20k-update A/B of the KL-adaptive clip controller — the one quality
# lever RESULTS.md names as untried.  Reference point: seed-0 base 20k
# embed = 363.8 greedy (3-seed band 347.4/355.2/363.8, so only a result
# outside ~±16 is signal).  Own deadline guard: the one-process TPU must
# be free for the driver's end-of-round bench.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
DEADLINE=${R5_DEADLINE:-1787271600}
now=$(date +%s)
if (( now + 1500 > DEADLINE )); then
  echo "=== TAIL SKIPPED (needs 1500s, $(( DEADLINE - now ))s left)"
  exit 0
fi
echo "=== $(date +%H:%M:%S) KL-adaptive clip 20k A/B (target 1.5e-3)"
timeout $(( DEADLINE - now - 60 )) "$PY" scripts/sweep_ppo.py \
    --configs base --updates 20000 --torso mlp --seed 0 --num-envs 4096 \
    --kl-target 1.5e-3 --kl-every 200 --log-every 5000 \
    --metrics-jsonl runs/klclip20k_metrics.jsonl
echo "=== rc=$? $(date +%H:%M:%S)"
