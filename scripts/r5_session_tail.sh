#!/bin/bash
# Round-5 session tail (invoked by r5_session.sh after the flagship and
# the guarded tenten-150k stage).  Cascade by remaining window — the
# one-process TPU must be free for the driver's end-of-round bench:
#
#   1. If the chain's tenten-150k stage was SKIPPED (its 5100s estimate
#      didn't fit) but >=4000s remain: tenten 100k instead — VERDICT r4
#      item 3 at a budget that fits (round-4 60k took ~24 min train;
#      100k ~= 40 min + kept evals).
#   2. Else if >=1500s remain: 20k A/B of the KL-adaptive clip
#      controller — the one quality lever RESULTS.md names as untried.
#      Reference: seed-0 base 20k embed = 363.8 greedy (3-seed band
#      347.4/355.2/363.8, so only a result outside ~±16 is signal).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
DEADLINE=${R5_DEADLINE:-1787271600}
now=$(date +%s)
left=$(( DEADLINE - now ))

if [ ! -d ckpt_ppo_tenten150k ] && (( left >= 4000 )); then
  echo "=== $(date +%H:%M:%S) tenten 100k (tail budget: ${left}s left)"
  timeout $(( left - 120 )) "$PY" scripts/sweep_ppo.py --configs base \
      --updates 100000 --torso mlp --preset tenten --num-envs 2048 \
      --log-every 10000 --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
      --checkpoint-dir ckpt_ppo_tenten100k --checkpoint-every 20000 \
      --keep 10 --eval-kept --metrics-jsonl runs/tenten100k_metrics.jsonl
  echo "=== rc=$? $(date +%H:%M:%S)"
elif (( left >= 1500 )); then
  echo "=== $(date +%H:%M:%S) KL-adaptive clip 20k A/B (target 1.5e-3)"
  timeout $(( left - 60 )) "$PY" scripts/sweep_ppo.py \
      --configs base --updates 20000 --torso mlp --seed 0 --num-envs 4096 \
      --kl-target 1.5e-3 --kl-every 200 --log-every 5000 \
      --metrics-jsonl runs/klclip20k_metrics.jsonl
  echo "=== rc=$? $(date +%H:%M:%S)"
else
  echo "=== TAIL SKIPPED (${left}s left)"
fi
