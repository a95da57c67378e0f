"""Apply the pre-registered round-5 decision rules (written BEFORE the
measurements ran — mirrors fwd_decision.py / r4b_decision.py).

Levers and rules:

  * dc1 (hash_dense_corners=1, stochastic dithered-trilinear dense levels):
    ADOPT into the tuned op point only if (a) the spass12Led2k1f1scdc1
    3-seed benched-shape (NGP-large, batch 8192, 600 steps, sphere) PSNR
    mean >= the spass12Led2k1f1sc baseline's in-spread floor
    (min - half_range), AND (b) the same-session full-step throughput gain
    over the sc control is >= +10% (lower than sc's +20% gate because the
    dense lever carries quality risk that the PSNR gate already prices;
    a >=10% step win with in-spread PSNR is strictly better hardware use).

  * extraction dens-ss1 (coarse_supersample=1): make it the DEFAULT only
    if benchmarks/out/extract_tuned.json shows occupancy_equal AND
    rgb_equal AND threshold_equal vs the r4-full arm on the real
    checkpoint AND it saves >= 5 s warm. The density-only coarse pass
    (dens) is already the default under sparse fetch — its sigma is
    bit-identical by construction; the json's equality block is the
    regression check of that claim.

  * sample-count arms (s32/s24) are REPORTED only: adopting a different
    sample count changes the quality operating point and needs its own
    parity arms first (they do not share the spass12Led2k1 quality
    evidence).

Usage: python benchmarks/r5_decision.py [--parity PATH] [--run-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

BASE_ARM = "spass12Led2k1f1sc"
DC_ARM = "spass12Led2k1f1scdc1"


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
    ap.add_argument("--run-dir", default="/tmp/tpu_r5")
    ap.add_argument("--extract", default="benchmarks/out/extract_tuned.json")
    args = ap.parse_args()

    rows = json.load(open(args.parity))
    bp = [r["eval_psnr"] for r in benched_rows(rows, BASE_ARM)]
    if len(bp) < 3:
        raise SystemExit(
            f"baseline arm {BASE_ARM} has only {len(bp)} benched-shape rows; "
            "the pre-registered rule requires >= 3 seeds"
        )
    mean_b = sum(bp) / len(bp)
    half_range = (max(bp) - min(bp)) / 2
    lo = min(bp) - half_range
    print(
        f"baseline {BASE_ARM}: n={len(bp)} psnr={[round(v, 2) for v in bp]} "
        f"mean={mean_b:.2f} in-spread floor={lo:.2f}"
    )

    run_dir = pathlib.Path(args.run_dir)
    t_ctrl = throughput(run_dir / "abl_ctrl.log")
    t_dc1 = throughput(run_dir / "abl_dc1.log")
    gain = (t_dc1 / t_ctrl - 1) if (t_dc1 and t_ctrl) else None
    print(f"throughput: ctrl={t_ctrl} dc1={t_dc1} "
          f"gain={None if gain is None else f'{gain:+.1%}'}")

    cp = [r["eval_psnr"] for r in benched_rows(rows, DC_ARM)]
    psnr_ok = len(cp) >= 3 and (sum(cp) / len(cp)) >= lo
    tput_ok = gain is not None and gain >= 0.10
    print(
        f"{DC_ARM}: n={len(cp)} psnr={[round(v, 2) for v in cp]}"
        + (f" mean={sum(cp)/len(cp):.2f}" if cp else "")
    )
    print(f"  psnr_ok={psnr_ok} tput_ok={tput_ok} -> "
          f"{'ADOPT dc1' if (psnr_ok and tput_ok) else 'reject/incomplete'}")

    ex = pathlib.Path(args.extract)
    if ex.exists():
        data = json.loads(ex.read_text())
        eq = data.get("equality", {})
        warm = {
            r["arm"]: r["wall_s"]
            for r in data.get("rows", [])
            if r.get("run") == "warm"
        }
        ss1 = eq.get("dens-ss1", {})
        ss1_equal = all(
            ss1.get(k) for k in ("occupancy_equal", "rgb_equal", "threshold_equal")
        )
        saving = (
            (warm.get("dens", 1e9) - warm.get("dens-ss1", 1e9))
            if ("dens" in warm and "dens-ss1" in warm)
            else None
        )
        print(f"extract warm walls: {warm}; dens-ss1 equality={ss1}; "
              f"ss1 saving={saving}")
        print(
            "  -> "
            + (
                "ADOPT ss1 default"
                if (ss1_equal and saving is not None and saving >= 5.0)
                else "keep ss=2 default (ss1 stays opt-in)"
            )
        )
    else:
        print(f"extract results not found at {ex}")


if __name__ == "__main__":
    main()
