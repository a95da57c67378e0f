#!/bin/bash
# Unattended TPU pipeline, round 5. Runs AFTER tpu_r4b_pipeline.sh (one
# chip; phases serialize). Covers the round-4 verdict items:
#
# Phase 0: re-run the occupancy-update micro (fixed KeyError: 'table') —
#          prices full vs 1/4-partition refresh for the p4 decision.
# Phase 1: re-run the sc parity seed 1 (died on a transient TPU
#          FAILED_PRECONDITION in the r4b run).
# Phase 2: step-profile throughput levers at the benched shape, all with
#          the sc sampler on (same-session ctrl first):
#            ctrl  = f1 + sc                  (the r4b sc arm)
#            dc1   = + hash_dense_corners=1   (stochastic dense levels)
#            s32   = ctrl at 16+16 samples    (48 -> 32)
#            s24   = ctrl at 8+16 samples     (48 -> 24)
#            ed1/ed0 = dense-level diet re-probe at the f1+sc point
#            10L   = 10 levels + ed2 re-probe
#          plus dc1+misc combinations if dc1 wins.
# Phase 3: grass photometric seeds 1,2 x both arms (verdict #3 — the n=1
#          "wins outright under corruption" claim needs 3 seeds).
# Phase 4: extraction headroom arms (r4-full / dens / dens-ss1) with
#          volume-equality gates on the real checkpoint (verdict #5).
# Phase 5: dc1 PSNR parity, sphere 3 seeds at the benched shape (gate for
#          adopting dc1; pre-registered rule in r5_decision.py).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r5
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_r5/pipeline.log; }

ABL="python benchmarks/micro_step_ablation.py --batch 8192 --single-pass --occupancy --sgrad 1 --fwd 1 --fast-cdf --only-full"

log "phase 0: occupancy-update micro (fixed)"
timeout 1800 python benchmarks/micro_occ_update.py --res 128 --partitions 4 \
  > /tmp/tpu_r5/occ_update.log 2>&1
log "occ_update rc=$?"

log "phase 1: re-run sc parity seed 1"
timeout 3600 python benchmarks/psnr_parity.py --scene sphere --seed 1 \
  --arm spass12Led2k1f1sc --nerf-type large --batch 8192 --steps 600 \
  > /tmp/tpu_r5/parity_sc_s1.log 2>&1
log "parity sc s1 rc=$?"

log "phase 2: throughput levers"
timeout 1800 $ABL --ns 16 --ni 32 --levels 12 --extra-dense 2 \
  > /tmp/tpu_r5/abl_ctrl.log 2>&1
log "ctrl rc=$?"
timeout 1800 $ABL --ns 16 --ni 32 --levels 12 --extra-dense 2 --dense-corners 1 \
  > /tmp/tpu_r5/abl_dc1.log 2>&1
log "dc1 rc=$?"
timeout 1800 $ABL --ns 16 --ni 16 --levels 12 --extra-dense 2 \
  > /tmp/tpu_r5/abl_s32.log 2>&1
log "s32 rc=$?"
timeout 1800 $ABL --ns 8 --ni 16 --levels 12 --extra-dense 2 \
  > /tmp/tpu_r5/abl_s24.log 2>&1
log "s24 rc=$?"
timeout 1800 $ABL --ns 16 --ni 32 --levels 12 --extra-dense 1 \
  > /tmp/tpu_r5/abl_ed1.log 2>&1
log "ed1 rc=$?"
timeout 1800 $ABL --ns 16 --ni 32 --levels 12 --extra-dense 0 \
  > /tmp/tpu_r5/abl_ed0.log 2>&1
log "ed0 rc=$?"
timeout 1800 $ABL --ns 16 --ni 32 --levels 10 --extra-dense 2 \
  > /tmp/tpu_r5/abl_10L.log 2>&1
log "10L rc=$?"
timeout 1800 $ABL --ns 16 --ni 32 --levels 12 --extra-dense 2 --dense-corners 1 \
  --misc-arms > /tmp/tpu_r5/abl_dc1_misc.log 2>&1
log "dc1+misc rc=$?"

log "phase 3: grass photometric seeds 1,2"
for s in 1 2; do
  timeout 3600 python benchmarks/psnr_parity.py --scene grass --seed $s \
    --photometric --arm uniform --nerf-type medium --batch 2048 \
    > /tmp/tpu_r5/photo_grass_uni_s$s.log 2>&1
  log "photo grass uniform s$s rc=$?"
  timeout 3600 python benchmarks/psnr_parity.py --scene grass --seed $s \
    --photometric --arm spass12Led2k1f1 --nerf-type medium --batch 2048 --steps 600 \
    > /tmp/tpu_r5/photo_grass_tuned_s$s.log 2>&1
  log "photo grass tuned s$s rc=$?"
done

log "phase 4: extraction headroom arms"
timeout 3600 python benchmarks/extract_tuned.py \
  > /tmp/tpu_r5/extract_tuned.log 2>&1
log "extract rc=$?"

log "phase 5: dc1 parity (3 seeds)"
for s in 0 1 2; do
  timeout 3600 python benchmarks/psnr_parity.py --scene sphere --seed $s \
    --arm spass12Led2k1f1scdc1 --nerf-type large --batch 8192 --steps 600 \
    > /tmp/tpu_r5/parity_dc1_s$s.log 2>&1
  log "parity dc1 s$s rc=$?"
done
log "pipeline done"
