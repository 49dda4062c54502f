#!/bin/bash
# Round-5 queue F (FINAL device session): TFD und0-cond measure + final headline.
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "F1 production sn2, device TFD with und0 cond gate"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  timeout 2400 python bench_suite.py sn2_string 2>&1
sleep 30

log "F2 final headline bench.py (A/B refresh, cache left warm for the driver)"
timeout 2700 python bench.py 2>&1

log "QUEUE F DONE"
