#!/bin/bash
# Round-5e unattended TPU pipeline (single v5e chip, serialized):
#   0. wait for any in-flight parity run (r5d gl2 seed 1) to finish
#   1. finish the r5d PSNR gate: parity gl2 seed 2
#   2. r5e phase 1 — full-step throughput of the dense level-subset
#      backward at the gl2 base op point: gd in {0 (ctrl), 1, 2}
#   3. r5e phase 2 — parity, aggressive-first: gl2gd1 seeds 0..2, then
#      gl2gd2 seeds 0..2 (r5e_decision.py --base-arm spass12Led1k1f1scns24gl2
#      applies the pre-registered rule afterwards)
#   4. table completeness: re-run the abl gl3 arm that died on a tunnel
#      error (decision-irrelevant if gl2 adopts; recorded for the PERF table)
# Every step is skipped if its result already exists, so the script is
# safe to re-run after an interruption.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5d /tmp/tpu_r5e
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5e/pipeline.log; }

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

parity() { # arm seed logfile
  if have_parity_row "$1" "$2"; then log "parity $1 s$2 already present"; return; fi
  timeout 3600 python benchmarks/psnr_parity.py --scene sphere \
    --seed "$2" --arm "$1" --nerf-type large --batch 8192 --steps 600 \
    > "$3" 2>&1
  log "parity $1 s$2 rc=$?"
}

ABL="python benchmarks/micro_step_ablation.py --batch 8192 --single-pass \
  --occupancy --sgrad 1 --fwd 1 --fast-cdf --ns 8 --ni 16 --levels 12 \
  --extra-dense 1 --only-full"

abl() { # logfile extra-args...
  local f="$1"; shift
  if grep -q "rays/s" "$f" 2>/dev/null; then log "abl $f already present"; return; fi
  timeout 1800 $ABL "$@" > "$f" 2>&1
  log "abl $f rc=$?"
}

log "phase 0: wait for in-flight parity (pid file /tmp/r5d_parity.pid if any)"
while pgrep -x python > /dev/null 2>&1 && \
      ps -eo cmd | grep -q "[p]snr_parity.py --scene sphere --seed 1 --arm spass12Led1k1f1scns24gl2"; do
  sleep 30
done

log "phase 1: finish r5d parity (gl2 seed 2)"
parity spass12Led1k1f1scns24gl2 2 /tmp/tpu_r5d/parity_gl2_s2.log

log "phase 2: r5e gd ablations at the gl2 base"
abl /tmp/tpu_r5e/abl_gd0.log --grad-levels 2 --dense-grad-levels 0
abl /tmp/tpu_r5e/abl_gd1.log --grad-levels 2 --dense-grad-levels 1
abl /tmp/tpu_r5e/abl_gd2.log --grad-levels 2 --dense-grad-levels 2

log "phase 3: r5e parity, aggressive-first (gd1 then gd2)"
for seed in 0 1 2; do
  parity spass12Led1k1f1scns24gl2gd1 "$seed" "/tmp/tpu_r5e/parity_gd1_s${seed}.log"
done
for seed in 0 1 2; do
  parity spass12Led1k1f1scns24gl2gd2 "$seed" "/tmp/tpu_r5e/parity_gd2_s${seed}.log"
done

log "phase 4: abl gl3 table-completeness rerun"
abl /tmp/tpu_r5d/abl_gl3.log --grad-levels 3

log "r5e pipeline done"
