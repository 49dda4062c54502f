#!/bin/bash
# Round-5 on-chip measurement queue: ONE TPU process at a time,
# generous timeouts, 30 s gaps (CLAUDE.md one-client rule).
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "STEP1 headline bench.py (A/B, 416k poses)"
timeout 2700 python bench.py 2>&1
sleep 30

log "STEP2 tier-2 end-to-end (152 confs, pallas lane)"
TSCODE_BENCH_CONFS=152 TSCODE_USE_PALLAS_CLASH=1 TSCODE_BENCH_VERBOSE=1 \
  timeout 2400 python bench.py --pipeline-only 2>&1
sleep 30

log "STEP3 tier-2 stage budget (prof_stages, 152 confs)"
TSCODE_BENCH_CONFS=152 timeout 2400 python tools/prof_stages.py 2>&1
sleep 30

log "STEP4 4.72M-pose point (256 confs, pallas lane)"
TSCODE_BENCH_CONFS=256 TSCODE_USE_PALLAS_CLASH=1 TSCODE_BENCH_VERBOSE=1 \
  timeout 3600 python bench.py --pipeline-only 2>&1
sleep 30

log "STEP5a production sn2 at bench scale, device TFD lane"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  timeout 2400 python bench_suite.py sn2_string 2>&1
sleep 30

log "STEP5b production sn2 at bench scale, host TFD lane"
TSCODE_SUITE_CONFS=76 TSCODE_SUITE_REPS=2 TSCODE_EMBED_TRACE=1 \
  TSCODE_DEVICE_TFD=0 timeout 1800 python bench_suite.py sn2_string 2>&1
sleep 30

log "STEP6 bench-scale cyclical (da_cyclical_xl, 1.08M poses)"
TSCODE_SUITE_REPS=2 timeout 3600 python bench_suite.py da_cyclical_xl 2>&1

log "QUEUE DONE"
