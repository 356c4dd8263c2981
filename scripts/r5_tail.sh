#!/bin/bash
# Round-5 tail (invoked by r5_chain.sh after the main stages if the
# deadline window allows): hardware measurement of the sampler-folding
# prototypes (VERDICT r4 item 8 — measure-before-believing).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PY=/opt/venv/bin/python
echo "=== $(date +%H:%M:%S) bench_words (sampler-folding candidates)"
timeout 2700 "$PY" scripts/bench_words.py
echo "=== rc=$? $(date +%H:%M:%S)"
