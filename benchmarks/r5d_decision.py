"""Pre-registered round-5d decision rule (written BEFORE the measurements
ran — mirrors fwd_decision.py / r4b_decision.py / r5b_decision.py).

Lever: hash_grad_levels=gl — unbiased per-point LEVEL subsampling of the
hash backward (scatter only gl of the Lh=7 hashed levels' gradients per
point, scaled Lh/gl; ops/hash_encode.py::_level_subsample). At the ns24
op point the k=1 hash scatter is 19.5 ms of the 62 ms step (round-5c
attribution), so gl in {4, 3, 2} projects to roughly +14/+18/+23% step
throughput if the scatter scales per-index.

Rule (applied mechanically):

  * Throughput gate: the gl arm's full-step throughput, measured
    same-session against a gl=0 control at the ns24 op point
    (micro_step_ablation --only-full), must gain >= +10%.

  * PSNR gate: the spass12Led1k1f1scns24gl<gl> arm needs >= 3 benched-shape
    rows (NGP-large, batch 8192, 600 steps, sphere) in psnr_parity.json
    with mean >= the spass12Led1k1f1scns24 baseline's in-spread floor
    (min - half_range over its 3 seeds = 32.15 from the recorded
    33.14/32.66/32.48).

  * Selection: among candidates passing BOTH gates, adopt the one with
    the highest measured throughput (parity runs may cover only the most
    aggressive candidate first; a candidate without parity rows is
    "incomplete", not rejected).

  * On adopt: cfg/blender_scene_tuned.yml gains hash_grad_levels, bench.py
    gains the knob in its headline op point + LAST_MEASURED refresh, and
    docs/PERF.md records the arm table. On reject: the knob stays as a
    measured-and-rejected record like dc1.

Usage: python benchmarks/r5d_decision.py [--parity PATH] [--run-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

BASE_ARM = "spass12Led1k1f1scns24"
CANDIDATES = ("spass12Led1k1f1scns24gl4", "spass12Led1k1f1scns24gl3",
              "spass12Led1k1f1scns24gl2")


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
    ap.add_argument("--run-dir", default="/tmp/tpu_r5d")
    args = ap.parse_args()

    rows = json.load(open(args.parity))
    bp = [r["eval_psnr"] for r in benched_rows(rows, BASE_ARM)]
    if len(bp) < 3:
        raise SystemExit(
            f"baseline arm {BASE_ARM} has only {len(bp)} benched-shape rows"
        )
    mean_b = sum(bp) / len(bp)
    half_range = (max(bp) - min(bp)) / 2
    lo = min(bp) - half_range
    print(
        f"baseline {BASE_ARM}: n={len(bp)} psnr={[round(v, 2) for v in bp]} "
        f"mean={mean_b:.2f} in-spread floor={lo:.2f}"
    )

    run_dir = pathlib.Path(args.run_dir)
    t_ctrl = throughput(run_dir / "abl_gl0.log")
    print(f"ctrl (gl=0) same-session throughput: {t_ctrl}")

    winner, winner_t = None, 0.0
    for cand in CANDIDATES:
        gl = cand.rsplit("gl", 1)[1]
        t = throughput(run_dir / f"abl_gl{gl}.log")
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
