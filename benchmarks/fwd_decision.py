"""Apply the pre-registered stochastic-forward decision rule.

Reads benchmarks/psnr_parity.json (benched-shape arms) and the phase-1
throughput logs from benchmarks/tpu_fwd_pipeline.sh, and prints the
adopt/reject verdict for hash_fwd_corners = 2 and 1 per the rule in
docs/PERF.md "Round 3 (late)":

  adopt f<k> only if (a) its 3-seed benched-shape (NGP-large, batch 8192,
  600 steps, sphere) PSNR mean is within the spass12Led2k1 baseline's
  seed spread widened by its half-range, AND (b) the measured full-step
  throughput gain over fwd=8 is >= +20%.

Usage: python benchmarks/fwd_decision.py [--parity PATH] [--run-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

BASE_ARM = "spass12Led2k1"
CAND_ARMS = ["spass12Led2k1f2", "spass12Led2k1f1"]


def benched_rows(rows: list[dict], arm: str) -> list[dict]:
    """Rows at the exact benched shape: NGP-large, batch 8192, 600 steps,
    sphere, measured ON the TPU — CPU side studies and medium-model rows
    must not satisfy the pre-registered rule."""
    return [
        r
        for r in rows
        if r["arm"] == arm
        and r["scene"] == "sphere"
        and r["batch"] == 8192
        and r["steps"] == 600
        and (r.get("nerf_type") or "medium") == "large"
        and r.get("platform", "tpu") not in ("cpu",)
    ]


def throughput(run_dir: pathlib.Path, fwd: int) -> float | None:
    """rays/s for the 'full' arm from an abl_fwd<k>.log, if present."""
    p = run_dir / f"abl_fwd{fwd}.log"
    if not p.exists():
        return None
    # micro_step_ablation prints lines like: "full  ...  <ms> ms  <rays/s> rays/s"
    best = None
    for line in p.read_text().splitlines():
        m = re.search(r"full\b.*?([\d_.,]+)\s*rays/s", line)
        if m:
            best = float(m.group(1).replace(",", "").replace("_", ""))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", default="benchmarks/psnr_parity.json")
    ap.add_argument("--run-dir", default="/tmp/tpu_run")
    args = ap.parse_args()

    rows = json.load(open(args.parity))
    base = benched_rows(rows, BASE_ARM)
    if not base:
        raise SystemExit(f"no benched-shape rows for baseline arm {BASE_ARM}")
    bp = [r["eval_psnr"] for r in base]
    if len(bp) < 3:
        # The pre-registered rule demands the same evidence bar on both
        # sides: 3 benched-shape seeds for the baseline spread as for the
        # candidates (round-3 advisor finding — no n=1 fallback spread).
        raise SystemExit(
            f"baseline arm {BASE_ARM} has only {len(bp)} benched-shape "
            "rows; the pre-registered rule requires >= 3 seeds"
        )
    mean_b = sum(bp) / len(bp)
    half_range = (max(bp) - min(bp)) / 2
    lo = min(bp) - half_range
    print(
        f"baseline {BASE_ARM}: n={len(bp)} psnr={[round(v, 2) for v in bp]} "
        f"mean={mean_b:.2f} in-spread floor={lo:.2f}"
    )

    run_dir = pathlib.Path(args.run_dir)
    t8 = throughput(run_dir, 8)
    print(f"throughput fwd=8 (full arm): {t8}")

    for arm, fwd in zip(CAND_ARMS, (2, 1)):
        cand = benched_rows(rows, arm)
        cp = [r["eval_psnr"] for r in cand]
        tput = throughput(run_dir, fwd)
        gain = (tput / t8 - 1) if (tput and t8) else None
        psnr_ok = len(cp) >= 3 and (sum(cp) / len(cp)) >= lo
        tput_ok = gain is not None and gain >= 0.20
        verdict = "ADOPT" if (psnr_ok and tput_ok) else "reject/incomplete"
        print(
            f"{arm}: n={len(cp)} psnr={[round(v, 2) for v in cp]} "
            f"mean={sum(cp)/len(cp):.2f}" if cp else f"{arm}: n=0",
        )
        print(
            f"  throughput={tput} gain={None if gain is None else f'{gain:+.1%}'} "
            f"psnr_ok={psnr_ok} tput_ok={tput_ok} -> {verdict}"
        )


if __name__ == "__main__":
    main()
