#!/bin/bash
# Round-5 queue C: re-measure with vectorized assemble + tfd block default.
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "C1 production sn2, new defaults (tfd block 4096)"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  timeout 2400 python bench_suite.py sn2_string 2>&1
sleep 30

log "C2 da_cyclical_xl (62 confs), embed+sweep trace, vectorized assemble"
TSCODE_SUITE_REPS=2 TSCODE_SWEEP_TRACE=1 TSCODE_EMBED_TRACE=1 \
  timeout 3600 python bench_suite.py da_cyclical_xl 2>&1

log "QUEUE C DONE"
