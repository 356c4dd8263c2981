#!/bin/bash
# Round-4 TPU stage 2 (serial — one TPU process at a time):
#   1. Variant preset + actor benches under the new bitboard default.
#   2. Fresh step profile + roofline under bitboard.
#   3. Flagship continuation: resume the 400k greedy peak (776.3) at a
#      constant near-peak LR for 100k more updates, then greedy-eval every
#      kept checkpoint (is the post-400k decline LR-band- or
#      update-count-driven? either answer is recordable).
#   4. Woodoku/tenten budget extensions with the proven hold-then-cosine
#      LR recipe and peak selection.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python

run() {
  echo "=== $(date +%H:%M:%S) $*"
  timeout 7200 "$@"
  echo "=== rc=$? $(date +%H:%M:%S)"
}

run env BP_BENCH_STATE_IMPL=packed "$PY" bench.py
for P in tenten woodoku big; do
  run env BP_BENCH_PRESET=$P "$PY" bench.py
done
run "$PY" scripts/bench_actor.py --torsos mlp --policies greedy sample
run "$PY" scripts/profile_step.py --num-envs 49152 --top 20
run "$PY" scripts/roofline.py

# --- flagship continuation from the 400k peak --------------------------
rm -rf ckpt_ppo_push && mkdir -p ckpt_ppo_push
cp -r ckpt_ppo_lranneal/400000 ckpt_ppo_push/400000
run "$PY" -m blockpuzzle_tpu.cli.train --algo ppo --torso mlp \
    --num-envs 4096 --updates 500000 --resume --seed 0 \
    --lr 1e-4 --entropy-coef 0.01 \
    --checkpoint-dir ckpt_ppo_push --checkpoint-every 25000 \
    --log-every 5000
for S in 425000 450000 475000 500000; do
  run "$PY" -m blockpuzzle_tpu.cli.evaluate --checkpoint-dir ckpt_ppo_push \
      --step $S --greedy --steps 1024 --num-envs 2048 --seed 20000
done

# --- variant budget extensions ------------------------------------------
run "$PY" scripts/sweep_ppo.py --configs base --updates 150000 --torso mlp \
    --preset woodoku --num-envs 2048 --log-every 5000 \
    --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
    --checkpoint-dir ckpt_ppo_woodoku150k --checkpoint-every 25000 \
    --keep 10 --eval-kept --metrics-jsonl runs/woodoku150k_metrics.jsonl
run "$PY" scripts/sweep_ppo.py --configs base --updates 60000 --torso mlp \
    --preset tenten --num-envs 2048 --log-every 5000 \
    --lr1 3e-5 --lr-decay-start 0.5 --lr-shape cosine \
    --checkpoint-dir ckpt_ppo_tenten60k --checkpoint-every 10000 \
    --keep 10 --eval-kept --metrics-jsonl runs/tenten60k_metrics.jsonl

echo "=== STAGE2 DONE $(date +%H:%M:%S)"
