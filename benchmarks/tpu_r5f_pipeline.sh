#!/bin/bash
# Round-5f unattended TPU pipeline (single v5e chip, serialized), after
# r5d ADOPTED gl2 (167,310 rays/s/chip) and r5e REJECTED both gd arms:
#   1. abl gl3 table-completeness rerun (died on a tunnel error in r5d;
#      decision-irrelevant — gl2 already adopted — recorded for PERF.md)
#   2. live bench.py at the new headline op point -> /tmp/tpu_r5f/bench.json
#   3. fresh step attribution at the gl2 op point (--forward-arms and
#      --misc-arms) for PERF.md's "what remains" table
# Steps are skipped if their results already exist (safe to re-run).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5d /tmp/tpu_r5f
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5f/pipeline.log; }

ABL="python benchmarks/micro_step_ablation.py --batch 8192 --single-pass \
  --occupancy --sgrad 1 --fwd 1 --fast-cdf --ns 8 --ni 16 --levels 12 \
  --extra-dense 1"

abl() { # logfile extra-args...
  local f="$1"; shift
  if grep -q "rays/s" "$f" 2>/dev/null; then log "abl $f already present"; return; fi
  timeout 2400 $ABL "$@" > "$f" 2>&1
  log "abl $f rc=$?"
}

log "phase 1: abl gl3 table-completeness rerun"
abl /tmp/tpu_r5d/abl_gl3.log --only-full --grad-levels 3

log "phase 2: live bench at the gl2 headline op point"
if [ ! -s /tmp/tpu_r5f/bench.json ]; then
  timeout 3600 python bench.py > /tmp/tpu_r5f/bench.json 2>/tmp/tpu_r5f/bench.err
  log "bench rc=$?"
fi

log "phase 3: step attribution at the gl2 op point"
abl /tmp/tpu_r5f/attr_fwd.log --forward-arms --grad-levels 2
abl /tmp/tpu_r5f/attr_misc.log --misc-arms --grad-levels 2

log "r5f pipeline done"
