#!/bin/bash
# Round-5 tail (invoked by r5_chain.sh after the main stages if the
# deadline window allows): hardware measurement of the sampler-folding
# prototypes (VERDICT r4 item 8 — measure-before-believing).
#
# Own hard cutoff (review finding: the chain's tail hook had no need()
# guard, so a stage finishing just before the chain DEADLINE could hold
# the one-process TPU through the driver's end-of-round bench window):
# start only before 02:35 local (epoch 1787279700), cap at 1500 s.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
if [ "$(date +%s)" -ge 1787279700 ]; then
  echo "=== TAIL SKIPPED (past 02:35 cutoff; leaving the chip free)"
  exit 0
fi
echo "=== $(date +%H:%M:%S) bench_words (sampler-folding candidates)"
timeout 1500 "$PY" scripts/bench_words.py --windows 2 --iters 4
echo "=== rc=$? $(date +%H:%M:%S)"
