#!/bin/bash
# Round-5g unattended TPU pipeline (single v5e chip, serialized):
#   0. wait for any in-flight micro_step_ablation run (r5f attribution)
#   1. phase 1 — full-step throughput of occ_segments at the adopted gl2
#      base: sg in {128 (ctrl), 64, 32}
#   2. phase 2 — parity, aggressive-first: gl2sg32 seeds 0..2, then
#      gl2sg64 seeds 0..2 (benchmarks/r5g_decision.py applies the
#      pre-registered rule afterwards)
# Steps are skipped if their results already exist (safe to re-run).
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

parity() { # arm seed logfile
  if have_parity_row "$1" "$2"; then log "parity $1 s$2 already present"; return; fi
  timeout 3600 python benchmarks/psnr_parity.py --scene sphere \
    --seed "$2" --arm "$1" --nerf-type large --batch 8192 --steps 600 \
    > "$3" 2>&1
  log "parity $1 s$2 rc=$?"
}

ABL="python benchmarks/micro_step_ablation.py --batch 8192 --single-pass \
  --occupancy --sgrad 1 --fwd 1 --fast-cdf --ns 8 --ni 16 --levels 12 \
  --extra-dense 1 --only-full --grad-levels 2"

abl() { # logfile extra-args...
  local f="$1"; shift
  if grep -q "rays/s" "$f" 2>/dev/null; then log "abl $f already present"; return; fi
  timeout 1800 $ABL "$@" > "$f" 2>&1
  log "abl $f rc=$?"
}

log "phase 0: wait for in-flight ablation runs (r5f attribution)"
while ps -eo cmd | grep -q "[m]icro_step_ablation"; do
  sleep 30
done

log "phase 1: sg ablations at the gl2 base"
abl /tmp/tpu_r5g/abl_sg128.log --segments 128
abl /tmp/tpu_r5g/abl_sg64.log --segments 64
abl /tmp/tpu_r5g/abl_sg32.log --segments 32

log "phase 2: parity, aggressive-first (sg32 then sg64)"
for seed in 0 1 2; do
  parity spass12Led1k1f1scns24gl2sg32 "$seed" "/tmp/tpu_r5g/parity_sg32_s${seed}.log"
done
for seed in 0 1 2; do
  parity spass12Led1k1f1scns24gl2sg64 "$seed" "/tmp/tpu_r5g/parity_sg64_s${seed}.log"
done
log "r5g pipeline done"
