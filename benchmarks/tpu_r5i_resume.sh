#!/bin/bash
# Round-5 resume orchestrator (after the 2026-08-20 session interruption):
# the r5g sg ablations are done (ctrl 167,137 / sg64 179,862 (+7.6%, gate
# FAIL) / sg32 189,172 (+13.2%, gate PASS)) — so per r5g_decision.py's
# pre-registered rule only sg32 needs parity. This script:
#   1. parity sg32 seeds 0..2 (skipped per-seed if the row exists)
#   2. chains into tpu_r5h_pipeline.sh (its phase 0 sees the rows and
#      proceeds: decide base via the sg gate, gd-v2 ablations, gd parity
#      if the +10% gate passes).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5g
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5g/pipeline.log; }

have_parity_row() { # arm seed
  python - "$1" "$2" <<'EOF'
import json, sys
rows = json.load(open("benchmarks/psnr_parity.json"))
ok = any(r["arm"] == sys.argv[1] and r["seed"] == int(sys.argv[2])
         and r["scene"] == "sphere" and r["batch"] == 8192
         and r["steps"] == 600 and r.get("nerf_type") == "large"
         and r.get("platform") != "cpu" for r in rows)
sys.exit(0 if ok else 1)
EOF
}

for seed in 0 1 2; do
  if have_parity_row spass12Led1k1f1scns24gl2sg32 "$seed"; then
    log "resume: parity sg32 s$seed already present"; continue
  fi
  timeout 3600 python benchmarks/psnr_parity.py --scene sphere \
    --seed "$seed" --arm spass12Led1k1f1scns24gl2sg32 \
    --nerf-type large --batch 8192 --steps 600 \
    > "/tmp/tpu_r5g/parity_sg32_s${seed}.log" 2>&1
  log "resume: parity sg32 s$seed rc=$?"
done

log "resume: chaining into r5h"
exec bash benchmarks/tpu_r5h_pipeline.sh
