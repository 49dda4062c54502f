#!/bin/bash
# Round-5 queue D: MXU-prescreen novelty A/B + 9.4M-pose scale attempt.
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "D1 production sn2, MXU-prescreen novelty filter"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  timeout 2400 python bench_suite.py sn2_string 2>&1
sleep 30

log "D2 scale attempt: 512 confs = 9,437,184 poses (pallas lane)"
TSCODE_BENCH_CONFS=512 TSCODE_USE_PALLAS_CLASH=1 TSCODE_BENCH_VERBOSE=1 \
  TSCODE_BENCH_RUN_TIMEOUT=5400 timeout 5400 python bench.py --pipeline-only 2>&1

log "QUEUE D DONE"
