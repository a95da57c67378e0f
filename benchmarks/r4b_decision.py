"""Apply the pre-registered round-4b decision rule (sampler + partition).

Reads benchmarks/psnr_parity.json and the phase-1 throughput logs from
benchmarks/tpu_r4b_pipeline.sh, and prints adopt/reject for:

  * occ_fast_cdf ("sc"): adopt only if (a) the spass12Led2k1f1sc 3-seed
    benched-shape (NGP-large, batch 8192, 600 steps, sphere) PSNR mean is
    >= the spass12Led2k1f1 baseline's in-spread floor (min - half_range),
    AND (b) the same-session full-step throughput gain is >= +20%.
  * occ_update_partitions=4 ("p4"): adopt additionally only if the
    spass12Led2k1f1scp4 3-seed mean also clears the same floor (its win is
    amortized update cost — phase 0 — not step time, so no tput gate).

Usage: python benchmarks/r4b_decision.py [--parity PATH] [--run-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

BASE_ARM = "spass12Led2k1f1"
SC_ARM = "spass12Led2k1f1sc"
P4_ARM = "spass12Led2k1f1scp4"


def benched_rows(rows: list[dict], arm: str) -> list[dict]:
    """Benched-shape TPU rows only (same filter as fwd_decision.py)."""
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
    ap.add_argument("--run-dir", default="/tmp/tpu_r4b")
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
    t_sc = throughput(run_dir / "abl_sc.log")
    gain = (t_sc / t_ctrl - 1) if (t_sc and t_ctrl) else None
    print(f"throughput: ctrl={t_ctrl} sc={t_sc} "
          f"gain={None if gain is None else f'{gain:+.1%}'}")

    cp = [r["eval_psnr"] for r in benched_rows(rows, SC_ARM)]
    sc_psnr_ok = len(cp) >= 3 and (sum(cp) / len(cp)) >= lo
    sc_tput_ok = gain is not None and gain >= 0.20
    print(
        f"{SC_ARM}: n={len(cp)} psnr={[round(v, 2) for v in cp]}"
        + (f" mean={sum(cp)/len(cp):.2f}" if cp else "")
    )
    print(f"  psnr_ok={sc_psnr_ok} tput_ok={sc_tput_ok} -> "
          f"{'ADOPT sc' if (sc_psnr_ok and sc_tput_ok) else 'reject/incomplete'}")

    pp = [r["eval_psnr"] for r in benched_rows(rows, P4_ARM)]
    p4_ok = len(pp) >= 3 and (sum(pp) / len(pp)) >= lo
    print(
        f"{P4_ARM}: n={len(pp)} psnr={[round(v, 2) for v in pp]}"
        + (f" mean={sum(pp)/len(pp):.2f}" if pp else "")
    )
    print(f"  psnr_ok={p4_ok} -> "
          f"{'ADOPT p4 (on top of sc)' if (p4_ok and sc_psnr_ok and sc_tput_ok) else 'reject/incomplete'}")


if __name__ == "__main__":
    main()
