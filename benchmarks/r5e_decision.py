"""Pre-registered round-5e decision rule (written BEFORE the measurements
ran — mirrors r4b_decision.py / r5b_decision.py / r5d_decision.py).

Lever: hash_dense_grad_levels=gd — unbiased per-point LEVEL subsampling of
the DENSE backward (exact forward; scatter only gd of the Ld=5 dense
levels' cell-row gradients per point, scaled Ld/gd;
ops/hash_encode.py::_dense_levels_encode_glv). At the ns24 op point the
dense-row backward is 11.6 ms of the 62 ms step (round-5c attribution) and
prices per index, so gd in {2, 1} projects to roughly +12/+18% step
throughput on the pre-gl step — more on a post-gl step if r5d adopts.

Rule (applied mechanically):

  * Base arm: whatever r5d_decision.py adopted (spass12Led1k1f1scns24gl<g>)
    or, if r5d rejected, the ns24 arm itself. Passed via --base-arm; the
    gd candidates are <base>gd2 and <base>gd1.

  * Throughput gate: the gd arm's full-step throughput, measured
    same-session against a gd=0 control at the base op point
    (micro_step_ablation --only-full), must gain >= +10%.

  * PSNR gate: the <base>gd<gd> arm needs >= 3 benched-shape rows
    (NGP-large, batch 8192, 600 steps, sphere) in psnr_parity.json with
    mean >= the BASE arm's in-spread floor (min - half_range over its
    3 seeds).

  * Selection: among candidates passing BOTH gates, adopt the one with the
    highest measured throughput (a candidate without parity rows is
    "incomplete", not rejected).

  * On adopt: cfg/blender_scene_tuned.yml gains hash_dense_grad_levels,
    bench.py gains the knob in its headline op point + LAST_MEASURED
    refresh, and docs/PERF.md records the arm table. On reject: the knob
    stays as a measured-and-rejected record like dc1.

Usage: python benchmarks/r5e_decision.py --base-arm spass12Led1k1f1scns24gl2
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re


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
    ap.add_argument("--run-dir", default="/tmp/tpu_r5e")
    ap.add_argument("--base-arm", default="spass12Led1k1f1scns24")
    args = ap.parse_args()

    rows = json.load(open(args.parity))
    bp = [r["eval_psnr"] for r in benched_rows(rows, args.base_arm)]
    if len(bp) < 3:
        raise SystemExit(
            f"base arm {args.base_arm} has only {len(bp)} benched-shape rows"
        )
    mean_b = sum(bp) / len(bp)
    half_range = (max(bp) - min(bp)) / 2
    lo = min(bp) - half_range
    print(
        f"base {args.base_arm}: n={len(bp)} psnr={[round(v, 2) for v in bp]} "
        f"mean={mean_b:.2f} in-spread floor={lo:.2f}"
    )

    run_dir = pathlib.Path(args.run_dir)
    t_ctrl = throughput(run_dir / "abl_gd0.log")
    print(f"ctrl (gd=0) same-session throughput: {t_ctrl}")

    winner, winner_t = None, 0.0
    for gd in (2, 1):
        cand = f"{args.base_arm}gd{gd}"
        t = throughput(run_dir / f"abl_gd{gd}.log")
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
