#!/bin/bash
# Resume of tpu_r5d_pipeline.sh after the 20:44 session interruption:
# abl_gl0 (62.1 ms ctrl) and abl_gl4 (54.1 ms, +14.8%) completed; gl3 was
# cut off mid-run. Runs the remaining phase-1 arms (gl3, gl2), then the
# phase-2 parity runs aggressive-first per r5d_decision.py's rule.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5d
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5d/pipeline.log; }

ABL="python benchmarks/micro_step_ablation.py --batch 8192 --single-pass \
  --occupancy --sgrad 1 --fwd 1 --fast-cdf --ns 8 --ni 16 --levels 12 \
  --extra-dense 1 --only-full"

log "resume: phase 1 remaining arms gl in {3,2}"
for gl in 3 2; do
  timeout 1800 $ABL --grad-levels "$gl" \
    > "/tmp/tpu_r5d/abl_gl${gl}.log" 2>&1
  log "abl gl=${gl} rc=$?"
done

log "phase 2: parity, aggressive-first"
for gl in 2 3; do
  for seed in 0 1 2; do
    timeout 3600 python benchmarks/psnr_parity.py --scene sphere \
      --seed "$seed" --arm "spass12Led1k1f1scns24gl${gl}" \
      --nerf-type large --batch 8192 --steps 600 \
      > "/tmp/tpu_r5d/parity_gl${gl}_s${seed}.log" 2>&1
    log "parity gl=${gl} seed=${seed} rc=$?"
  done
done
log "resume pipeline done"
