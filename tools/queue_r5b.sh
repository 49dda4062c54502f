#!/bin/bash
# Round-5 queue B: TFD block-size A/B + cyclical XL attribution.
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "B1 production sn2, device TFD block=4096"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  TSCODE_TFD_BLOCK=4096 timeout 2400 python bench_suite.py sn2_string 2>&1
sleep 30

log "B2 production sn2, device TFD block=8192"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  TSCODE_TFD_BLOCK=8192 timeout 2400 python bench_suite.py sn2_string 2>&1
sleep 30

log "B3 da_cyclical_xl at 62 confs (1.107M poses), sweep trace"
TSCODE_SUITE_REPS=2 TSCODE_SWEEP_TRACE=1 \
  timeout 3600 python bench_suite.py da_cyclical_xl 2>&1

log "QUEUE B DONE"
