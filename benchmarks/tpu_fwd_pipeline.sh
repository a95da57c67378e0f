#!/bin/bash
# Unattended TPU measurement pipeline for the stochastic-forward lever
# (docs/PERF.md "Round 3 (late): stochastic forward corners").
#
# Phase 1: throughput of the tuned op point at hash_fwd_corners = 8/2/1
#          (micro_step_ablation --only-full arms at the benched shape).
# Phase 2: benched-shape PSNR parity arms, 3 seeds x f2.
# Phase 3: same, f1.
#
# Decision rule (pre-registered in docs/PERF.md): adopt f<k> into the
# tuned op point only if the 3-seed benched-shape PSNR is in-spread with
# spass12Led2k1 AND the measured throughput gain is >= +20%.
#
# Every step is bounded by timeout so a mid-run tunnel hang cannot wedge
# the pipeline; logs land in /tmp/tpu_run/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_run
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_run/pipeline.log; }

log "phase 1: throughput arms"
for f in 8 2 1; do
  log "ablation --fwd $f start"
  timeout 1800 python benchmarks/micro_step_ablation.py \
    --batch 8192 --ns 16 --ni 32 --single-pass --occupancy \
    --levels 12 --extra-dense 2 --sgrad 1 --fwd $f --only-full \
    > /tmp/tpu_run/abl_fwd$f.log 2>&1
  log "ablation --fwd $f rc=$?"
done

log "phase 2: benched-shape parity f2 (3 seeds)"
for s in 0 1 2; do
  log "parity f2 seed $s start"
  timeout 3600 python benchmarks/psnr_parity.py --scene sphere --seed $s \
    --arm spass12Led2k1f2 --nerf-type large --batch 8192 --steps 600 \
    > /tmp/tpu_run/parity_f2_s$s.log 2>&1
  log "parity f2 seed $s rc=$?"
done

log "phase 3: benched-shape parity f1 (3 seeds)"
for s in 0 1 2; do
  log "parity f1 seed $s start"
  timeout 3600 python benchmarks/psnr_parity.py --scene sphere --seed $s \
    --arm spass12Led2k1f1 --nerf-type large --batch 8192 --steps 600 \
    > /tmp/tpu_run/parity_f1_s$s.log 2>&1
  log "parity f1 seed $s rc=$?"
done
log "pipeline done"
