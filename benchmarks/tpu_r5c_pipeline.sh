#!/bin/bash
# Unattended TPU pipeline, round 5c (after r5b): extraction headroom +
# fresh step attribution at the adopted ns24 op point.
#
# Phase 1: extraction headroom arms (r4-full / dens / dens-ss1) with
#          volume-equality gates on the real sc checkpoint — the re-run
#          of the r5 phase 4 that failed on a stale checkpoint path;
#          feeds r5_decision.py's pre-registered ss1-default gate.
# Phase 2: the same arms on the new ns24 (ed1) checkpoint — does the
#          adopted model diet speed extraction too?
# Phase 3: step attribution at the ns24 op point (--forward-arms +
#          --misc-arms): where do the 62 ms live now, and what is the
#          achieved ns/idx for bench.py's bound_utilization?
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5c
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5c/pipeline.log; }

log "phase 1: extraction arms, sc checkpoint (ed2)"
timeout 5400 python benchmarks/extract_tuned.py \
  > /tmp/tpu_r5c/extract_sc.log 2>&1
log "extract sc rc=$?"

log "phase 2: extraction arms, ns24 checkpoint (ed1)"
timeout 5400 python benchmarks/extract_tuned.py \
  --ckpt benchmarks/out/parity/sphere_s0_spass12Led1k1f1scns24_large_b8192/checkpoints/nerf_final.pth \
  --extra-dense 1 --out-tag _ed1 \
  > /tmp/tpu_r5c/extract_ed1.log 2>&1
log "extract ed1 rc=$?"

log "phase 3: attribution at ns24 op point"
timeout 3600 python benchmarks/micro_step_ablation.py --batch 8192 \
  --single-pass --occupancy --sgrad 1 --fwd 1 --fast-cdf \
  --ns 8 --ni 16 --levels 12 --extra-dense 1 --forward-arms \
  > /tmp/tpu_r5c/abl_fwd_ns24.log 2>&1
log "fwd-arms rc=$?"
timeout 3600 python benchmarks/micro_step_ablation.py --batch 8192 \
  --single-pass --occupancy --sgrad 1 --fwd 1 --fast-cdf \
  --ns 8 --ni 16 --levels 12 --extra-dense 1 --misc-arms \
  > /tmp/tpu_r5c/abl_misc_ns24.log 2>&1
log "misc-arms rc=$?"
log "pipeline done"
