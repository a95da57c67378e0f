"""Apply the pre-registered round-5b decision rule (dense diet + sample
count), written BEFORE the parity runs started (same discipline as
fwd_decision.py / r4b_decision.py / r5_decision.py).

Baseline: the just-adopted sc op point (spass12Led2k1f1sc), 3 benched-shape
seeds. Floor = min - half_range (the in-spread rule every prior adoption
used).

Rules:
  * ed1 (spass12Led1k1f1sc — drop the res-122 dense promotion): ADOPT iff
    3-seed benched-shape mean >= floor AND same-session throughput gain
    >= +10% (measured +17.8% in /tmp/tpu_r5/abl_ed1.log before this file
    was written; the gate is the PSNR).
  * ns32 (spass12Led2k1f1scns32 — 48 -> 32 samples): ADOPT iff mean >=
    floor AND gain >= +10% (measured +42%). A sample-count cut changes the
    quality op point, so the floor gate carries all the weight.
  * combo (spass12Led1k1f1scns32): becomes the tuned op point iff BOTH
    individual arms adopt AND the combo's own 3-seed mean >= floor.
  * ns24 (spass12Led1k1f1scns24): considered only if the combo adopts;
    same floor rule. Tie-break toward FEWER changes when any gate is
    marginal (<0.1 dB above floor).

Usage: python benchmarks/r5b_decision.py [--parity PATH] [--run-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re

BASE_ARM = "spass12Led2k1f1sc"
CANDIDATES = {
    "ed1": "spass12Led1k1f1sc",
    "ns32": "spass12Led2k1f1scns32",
    "combo": "spass12Led1k1f1scns32",
    "ns24": "spass12Led1k1f1scns24",
}


def benched_rows(rows, arm):
    return [
        r for r in rows
        if r["arm"] == arm and r["scene"] == "sphere" and r["batch"] == 8192
        and r["steps"] == 600 and (r.get("nerf_type") or "medium") == "large"
        and r.get("platform", "tpu") not in ("cpu",)
    ]


def throughput(path):
    if not path.exists():
        return None
    best = None
    for line in path.read_text().splitlines():
        m = re.search(r"full\b.*?([\d_.,]+)\s*rays/s", line)
        if m:
            best = float(m.group(1).replace(",", "").replace("_", ""))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", default="benchmarks/psnr_parity.json")
    ap.add_argument("--run-dir", default="/tmp/tpu_r5")
    ap.add_argument("--run-dir-b", default="/tmp/tpu_r5b")
    args = ap.parse_args()

    rows = json.load(open(args.parity))
    bp = [r["eval_psnr"] for r in benched_rows(rows, BASE_ARM)]
    if len(bp) < 3:
        raise SystemExit(f"baseline {BASE_ARM}: only {len(bp)} rows (need 3)")
    floor = min(bp) - (max(bp) - min(bp)) / 2
    print(f"baseline {BASE_ARM}: psnr={[round(v,2) for v in bp]} "
          f"mean={sum(bp)/len(bp):.2f} floor={floor:.2f}")

    r5 = pathlib.Path(args.run_dir)
    r5b = pathlib.Path(args.run_dir_b)
    t_ctrl = throughput(r5 / "abl_ctrl.log")
    tput = {
        "ed1": throughput(r5 / "abl_ed1.log"),
        "ns32": throughput(r5 / "abl_s32.log"),
        "combo": throughput(r5b / "abl_ed1s32.log"),
        "ns24": throughput(r5b / "abl_ed1s24.log"),
    }

    verdicts = {}
    for key, arm in CANDIDATES.items():
        cp = [r["eval_psnr"] for r in benched_rows(rows, arm)]
        mean = sum(cp) / len(cp) if cp else None
        psnr_ok = len(cp) >= 3 and mean >= floor
        t = tput.get(key)
        gain = (t / t_ctrl - 1) if (t and t_ctrl) else None
        tput_ok = gain is not None and gain >= 0.10
        verdicts[key] = psnr_ok and tput_ok
        print(f"{key:5s} ({arm}): n={len(cp)} psnr={[round(v,2) for v in cp]}"
              + (f" mean={mean:.2f}" if mean else "")
              + f" gain={None if gain is None else f'{gain:+.1%}'}"
              f" psnr_ok={psnr_ok} tput_ok={tput_ok}")

    combo_ok = verdicts["ed1"] and verdicts["ns32"] and verdicts["combo"]
    print(f"-> ed1: {'ADOPT' if verdicts['ed1'] else 'reject/incomplete'}")
    print(f"-> ns32: {'ADOPT' if verdicts['ns32'] else 'reject/incomplete'}")
    print(f"-> combo as tuned op point: "
          f"{'ADOPT' if combo_ok else 'reject/incomplete'}")
    print(f"-> ns24: "
          f"{'ADOPT' if (combo_ok and verdicts['ns24']) else 'reject/incomplete'}")


if __name__ == "__main__":
    main()
