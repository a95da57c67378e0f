"""Pre-registered round-5g decision rule (written BEFORE the measurements
ran — mirrors fwd_decision.py / r4b/r5b/r5d/r5e_decision.py).

Lever: occ_segments=M — the per-ray piecewise-constant CDF resolution
(ops/occupancy.py segment_weights / _sample_cdf_fast). At the adopted gl2
op point (49 ms) the round-5c attribution prices the two M-linear streams
at ~20 ms: occupancy-CDF sampling 12.4 ms (the [B, n, M] compare-sum) +
occupancy-grid lookups 7.6 ms (B*M random gathers), so M 128->64/32
projects to roughly +25%/+44% step throughput. The cost is coarser
empty-space skipping: occupied-region resolution (far-near)/M along the
ray — the PSNR gate decides whether the proposal distribution still
concentrates well enough.

Rule (applied mechanically):

  * Throughput gate: the sg arm's full-step throughput, measured
    same-session against an sg128 control at the gl2 op point
    (micro_step_ablation --only-full --grad-levels 2 --segments M), must
    gain >= +10%.

  * PSNR gate: the spass12Led1k1f1scns24gl2sg<M> arm needs >= 3
    benched-shape rows (NGP-large, batch 8192, 600 steps, sphere) in
    psnr_parity.json with mean >= the gl2 base arm's in-spread floor
    (min - half_range over its 3 seeds = 32.05 from the recorded
    32.955/32.352/32.617).

  * Selection: among candidates passing BOTH gates, adopt the one with
    the highest measured throughput (parity runs cover the most
    aggressive candidate first; a candidate without parity rows is
    "incomplete", not rejected).

  * On adopt: cfg/blender_scene_tuned.yml gains occ_segments, bench.py
    gains the knob in its headline op point + LAST_MEASURED refresh, and
    docs/PERF.md records the arm table. On reject: the knob stays as a
    measured-and-rejected record like dc1/gd.

Usage: python benchmarks/r5g_decision.py
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

BASE_ARM = "spass12Led1k1f1scns24gl2"
CANDIDATES = ("spass12Led1k1f1scns24gl2sg32", "spass12Led1k1f1scns24gl2sg64")


def benched_rows(rows: list[dict], arm: str) -> list[dict]:
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


def throughput(path: pathlib.Path) -> float | None:
    if not path.exists():
        return None
    best = None
    for line in path.read_text().splitlines():
        m = re.search(r"full\b.*?([\d_.,]+)\s*rays/s", line)
        if m:
            best = float(m.group(1).replace(",", "").replace("_", ""))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", default="benchmarks/psnr_parity.json")
    ap.add_argument("--run-dir", default="/tmp/tpu_r5g")
    args = ap.parse_args()

    rows = json.load(open(args.parity))
    bp = [r["eval_psnr"] for r in benched_rows(rows, BASE_ARM)]
    if len(bp) < 3:
        raise SystemExit(
            f"base arm {BASE_ARM} has only {len(bp)} benched-shape rows"
        )
    mean_b = sum(bp) / len(bp)
    half_range = (max(bp) - min(bp)) / 2
    lo = min(bp) - half_range
    print(
        f"base {BASE_ARM}: n={len(bp)} psnr={[round(v, 2) for v in bp]} "
        f"mean={mean_b:.2f} in-spread floor={lo:.2f}"
    )

    run_dir = pathlib.Path(args.run_dir)
    t_ctrl = throughput(run_dir / "abl_sg128.log")
    print(f"ctrl (sg=128) same-session throughput: {t_ctrl}")

    winner, winner_t = None, 0.0
    for cand in CANDIDATES:
        sg = cand.rsplit("sg", 1)[1]
        t = throughput(run_dir / f"abl_sg{sg}.log")
        gain = (t / t_ctrl - 1) if (t and t_ctrl) else None
        cp = [r["eval_psnr"] for r in benched_rows(rows, cand)]
        psnr_ok = len(cp) >= 3 and (sum(cp) / len(cp)) >= lo
        tput_ok = gain is not None and gain >= 0.10
        status = (
            "ADOPTABLE" if (psnr_ok and tput_ok)
            else "incomplete" if (tput_ok and len(cp) < 3)
            else "reject"
        )
        print(
            f"{cand}: tput={t} gain="
            f"{None if gain is None else f'{gain:+.1%}'} "
            f"psnr(n={len(cp)})={[round(v, 2) for v in cp]}"
            + (f" mean={sum(cp)/len(cp):.2f}" if cp else "")
            + f" -> {status}"
        )
        if psnr_ok and tput_ok and t and t > winner_t:
            winner, winner_t = cand, t

    print(f"DECISION: {'ADOPT ' + winner if winner else 'no adoptable arm'}")


if __name__ == "__main__":
    main()
