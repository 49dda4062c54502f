#!/bin/bash
# Round-5 queue E: full production-suite warm table.
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
log "E1 full suite (16 confs, 2 reps)"
TSCODE_SUITE_REPS=2 timeout 3600 python bench_suite.py 2>&1
log "QUEUE E DONE"
