#!/bin/bash
# Round-4 stage 4: the capacity probe the continuation pointed to —
# mlp_width=2048 with the proven hold-then-cosine recipe.  Launched last
# so the bulk trains into round-5 harvesting time; dense --keep +
# --eval-kept make a cut-short run still evaluable from kept checkpoints.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
echo "=== $(date +%H:%M:%S) w2048 flagship"
timeout 18000 "$PY" scripts/sweep_ppo.py --configs base --updates 140000 \
    --torso mlp --mlp-width 2048 --num-envs 4096 --log-every 2000 \
    --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
    --checkpoint-dir ckpt_ppo_w2048 --checkpoint-every 20000 --keep 12 \
    --eval-kept --metrics-jsonl runs/w2048_metrics.jsonl
echo "=== rc=$? $(date +%H:%M:%S)"
