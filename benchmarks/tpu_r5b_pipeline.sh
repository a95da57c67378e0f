#!/bin/bash
# Unattended TPU pipeline, round 5b: PSNR gates for the step-profile levers
# that measured as wins in /tmp/tpu_r5 phase 2 (ctrl 134.4 ms / 60,944
# rays/s same-session):
#   ed1  (drop the res-122 dense promotion)      114.1 ms  +17.8%
#   ns32 (single-pass 48 -> 32 samples)           94.4 ms  +42%
#   ns24 (single-pass 48 -> 24 samples)           75.2 ms  +79%
# plus the two combo throughput arms (ed1+ns32, ed1+ns24) and 3-seed
# benched-shape parity for each candidate arm. Decision rule pre-registered
# in benchmarks/r5b_decision.py BEFORE these parity runs started.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5b
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5b/pipeline.log; }

ABL="python benchmarks/micro_step_ablation.py --batch 8192 --single-pass --occupancy --sgrad 1 --fwd 1 --fast-cdf --only-full"

log "phase 1: combo throughput arms"
timeout 1800 $ABL --ns 16 --ni 16 --levels 12 --extra-dense 1 \
  > /tmp/tpu_r5b/abl_ed1s32.log 2>&1
log "ed1s32 rc=$?"
timeout 1800 $ABL --ns 8 --ni 16 --levels 12 --extra-dense 1 \
  > /tmp/tpu_r5b/abl_ed1s24.log 2>&1
log "ed1s24 rc=$?"

log "phase 2: parity, candidate arms x 3 seeds"
for arm in spass12Led1k1f1sc spass12Led2k1f1scns32 spass12Led1k1f1scns32 spass12Led1k1f1scns24; do
  for s in 0 1 2; do
    log "parity $arm seed $s start"
    timeout 3600 python benchmarks/psnr_parity.py --scene sphere --seed $s \
      --arm $arm --nerf-type large --batch 8192 --steps 600 \
      > /tmp/tpu_r5b/parity_${arm}_s$s.log 2>&1
    log "parity $arm seed $s rc=$?"
  done
done
log "pipeline done"
