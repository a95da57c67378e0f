"""PSNR-parity experiment: uniform reference sampling vs occupancy-culled.

Protocol (VERDICT round-1 item 5: >=3 seeds, >=2 scene geometries, equal
wall-clock comparison):

  * model: Instant-NGP medium (2^17 hash), batch 2048, bf16, v5e-1
  * arm "uniform":   N_samples=64, N_importance=128 (reference sampling,
                     occupancy_grid off) for --steps (default 200)
  * arm "occupancy": 16+32 with the occupancy grid, 3x the uniform arm's
                     steps (default 600) — chosen so its wall clock lands at
                     or below the uniform arm's (the round-1 finding)
  * arm "sgrad2":    occupancy 16+32 PLUS hash_grad_corners=2 (unbiased
                     stochastic corner gradients) at the same 3x steps —
                     validates that the 2x-faster backward holds PSNR
  * arm "spass2":    sgrad2 PLUS single_pass (all 48 samples from the
                     occupancy CDF, no coarse network pass)
  * arm "spass1":    single_pass with hash_grad_corners=1 (maximum
                     stochastic-gradient throughput)
  * arm "spass8":    single_pass with the EXACT backward — isolates the
                     single-pass effect from gradient stochasticity
  * arm "spass12L":  spass2 with hash_n_levels=12 (drops the 4 finest hash
                     levels, whose res exceeds any extractable detail) —
                     validates the round-3 throughput op point holds PSNR
  * arm "spass12L32": spass12L at 32 samples/ray (16+16) — probes whether
                     the sample count can drop another 33% at held PSNR
  * arm "spass12Led2": spass12L plus hash_extra_dense_levels=2 (the res-81
                     and res-122 levels stored dense/collision-free as
                     cell-rows) — the round-3 fastest measured op point
  * arm "spass12Led2k1": spass12Led2 with hash_grad_corners=1 — the step
                     ablation at the tuned point measures k=1 at +10.4%
                     throughput (305.7 vs 337.6 ms/step); this arm tests
                     whether the noisier 1-corner gradient holds PSNR
  * arm "spass10Led2": spass12Led2 with hash_n_levels=10 — also drops the
                     res-923/1385 levels (923 is marginal for a 512^3
                     extraction's ~2/512 Nyquist, 1385 above it); +20%
                     throughput measured (micro_tuned_probes.json) IF the
                     PSNR holds, which this arm tests
  * scenes: the analytic "sphere" and "boxes" geometries, plus "grass" —
    a high-frequency thin-blade field (the reference's demonstrated
    real-photo use case, procedurally; tests/synthetic.py) used to test
    whether the single-pass/occupancy advantage survives geometry with
    structure near the finest hash levels' scale
  * eval: held-out rays (unseen seed), rendered with the SAME uniform
    64+128 sampler for both arms, PSNR vs the numpy ray-march oracle

Each run appends one row to benchmarks/psnr_parity.json. `--suite` runs all
2 scenes x 3 seeds x 2 arms sequentially (skipping rows already present).

Usage:
  python benchmarks/psnr_parity.py --scene sphere --seed 0 --arm uniform
  python benchmarks/psnr_parity.py --suite
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).parent
REPO = HERE.parent
OUT = HERE / "out"
RESULTS = HERE / "psnr_parity.json"

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

STEPS_PER_EPOCH = 50
EVAL_SEED = 9999
EVAL_RAYS = 4096


def _cfg(tag: str, arm: str, batch: int, steps: int, rays_file: Path,
         nerf_type: str = "medium"):
    import re

    from nerfjax.config import ConfigNode, with_defaults

    # Composable suffixes on any arm (applied right-to-left):
    #   "f<k>"  = hash_fwd_corners=k (stochastic dithered-trilinear forward;
    #             leader+residual for k>=2)
    #   "sc"    = occ_fast_cdf=true (stratified arithmetic inverse-CDF
    #             sampler — ops.occupancy._sample_cdf_fast)
    #   "p<P>"  = occ_update_partitions=P (rotating 1/P grid refresh)
    #   "dc<k>" = hash_dense_corners=k (stochastic dithered-trilinear DENSE
    #             levels: pair gathers + k-corner scatter)
    #   "ns<n>" = total single-pass sample count: ns32 = 16+16, ns24 = 8+16
    #             (the base occupancy arms fix 16+32 = 48)
    #   "gl<n>" = hash_grad_levels=n (unbiased per-point level-subset
    #             backward: scatter only n of the hashed levels' grads,
    #             scaled Lh/n — requires a stochastic backward arm)
    #   "gd<n>" = hash_dense_grad_levels=n (unbiased per-point level-subset
    #             DENSE backward: exact forward, scatter only n of the
    #             dense levels' row grads, scaled Ld/n)
    #   "sg<M>" = occ_segments=M (per-ray piecewise-CDF resolution; the
    #             grid-lookup stream and fast-CDF compare-sum are linear
    #             in M — the base arms fix 128)
    # The base arm fixes every other knob.
    fast_cdf = False
    partitions = 1
    fwd_corners = 8
    dense_corners = 8
    grad_levels = 0
    dense_grad_levels = 0
    segments = 128
    ns_override = None
    while True:
        m = re.fullmatch(r"(.+?)sg([0-9]+)", arm)
        if m:
            arm, segments = m.group(1), int(m.group(2))
            continue
        m = re.fullmatch(r"(.+?)gd([1-9][0-9]?)", arm)
        if m:
            arm, dense_grad_levels = m.group(1), int(m.group(2))
            continue
        m = re.fullmatch(r"(.+?)gl([1-9][0-9]?)", arm)
        if m:
            arm, grad_levels = m.group(1), int(m.group(2))
            continue
        m = re.fullmatch(r"(.+?)ns(32|24)", arm)
        if m:
            arm = m.group(1)
            ns_override = {"32": (16, 16), "24": (8, 16)}[m.group(2)]
            continue
        m = re.fullmatch(r"(.+?)dc([1-7])", arm)
        if m:
            arm, dense_corners = m.group(1), int(m.group(2))
            continue
        m = re.fullmatch(r"(.+?)p([0-9]+)", arm)
        if m:
            arm, partitions = m.group(1), int(m.group(2))
            continue
        m = re.fullmatch(r"(.+?)sc", arm)
        if m:
            arm, fast_cdf = m.group(1), True
            continue
        m = re.fullmatch(r"(.+?)f([1-7])", arm)
        if m:
            arm, fwd_corners = m.group(1), int(m.group(2))
            continue
        break

    # Guard against the stripper silently consuming a future base arm whose
    # NAME happens to end in "sc"/"p<digits>"/"f<k>" (ADVICE round 4): the
    # residual must be a registered base arm, never a truncated one.
    known_base = ("uniform", "occupancy", "sgrad2", "spass2", "spass1",
                  "spass8", "spass12L", "spass12L32", "spass12Led2",
                  "spass10Led2", "spass12Led2k1", "spass12Led1k1")
    if arm not in known_base:
        raise ValueError(
            f"arm suffix stripping left unknown base arm {arm!r}; "
            f"register it in known_base before adding suffixed variants"
        )

    occupancy = arm in ("occupancy", "sgrad2", "spass2", "spass1", "spass8",
                        "spass12L", "spass12L32", "spass12Led2", "spass10Led2",
                        "spass12Led2k1", "spass12Led1k1")
    out_dir = OUT / "parity" / tag
    return with_defaults(
        ConfigNode(
            {
                "scene_name": tag,
                "ngp": True,
                "nerf_type": nerf_type,
                "batch_size": batch,
                "num_epochs": steps // STEPS_PER_EPOCH,
                "lr": 5e-4,
                "N_samples": (
                    ns_override[0] if (occupancy and ns_override)
                    else 16 if occupancy else 64
                ),
                "N_importance": (
                    ns_override[1] if (occupancy and ns_override)
                    else 16 if arm == "spass12L32" else 32 if occupancy else 128
                ),
                "precision": "bf16",
                "occupancy_grid": occupancy,
                "hash_grad_corners": {"sgrad2": 2, "spass2": 2, "spass1": 1,
                                      "spass12L": 2, "spass12L32": 2,
                                      "spass12Led2": 2,
                                      "spass10Led2": 2,
                                      "spass12Led2k1": 1,
                                      "spass12Led1k1": 1}.get(arm, 8),
                "single_pass": arm in ("spass2", "spass1", "spass8", "spass12L",
                                       "spass12L32", "spass12Led2", "spass10Led2",
                                       "spass12Led2k1", "spass12Led1k1"),
                "hash_n_levels": (
                    10
                    if arm == "spass10Led2"
                    else 12
                    if arm in ("spass12L", "spass12L32", "spass12Led2",
                               "spass12Led2k1", "spass12Led1k1")
                    else 16
                ),
                "hash_extra_dense_levels": (
                    1 if arm == "spass12Led1k1"
                    else 2 if arm in ("spass12Led2", "spass10Led2",
                                      "spass12Led2k1") else 0
                ),
                "hash_fwd_corners": fwd_corners,
                "hash_dense_corners": dense_corners,
                "hash_grad_levels": grad_levels,
                "hash_dense_grad_levels": dense_grad_levels,
                "occ_fast_cdf": fast_cdf,
                "occ_update_partitions": partitions,
                "occ_segments": segments,
                "rays_file": str(rays_file),
                "output_dir": str(out_dir),
                "checkpoint_dir": str(out_dir / "checkpoints"),
            }
        )
    )


def _ensure_rays(
    scene: str, n_rays: int, seed: int, photometric: bool = False
) -> Path:
    import numpy as np

    from synthetic import make_photometric_ray_npz, make_ray_npz

    OUT.mkdir(parents=True, exist_ok=True)
    suffix = "_photo" if photometric else ""
    path = OUT / f"rays_{scene}{suffix}_s{seed}_{n_rays}.npz"
    if not path.exists():
        if photometric:
            # corrupted-capture robustness arm (round-3 verdict #4): the
            # TRAINING targets carry per-frame exposure drift, sensor
            # noise, and angular blur; eval stays against the clean oracle
            make_photometric_ray_npz(path, n_rays=n_rays, seed=seed, scene=scene)
        else:
            make_ray_npz(path, n_rays=n_rays, seed=seed, scene=scene)
    return path


def _eval_psnr(cfg, params, scene: str) -> float:
    """Held-out PSNR with uniform 64+128 sampling (identical for both arms)."""
    import jax
    import numpy as np

    from nerfjax.render import render_rays
    from nerfjax.train import _split_params, build_fields
    from synthetic import make_ray_npz

    eval_path = OUT / f"eval_{scene}_{EVAL_SEED}.npz"
    if eval_path.exists():
        with np.load(eval_path) as d:
            data = {k: d[k] for k in d}
    else:
        data = make_ray_npz(eval_path, n_rays=EVAL_RAYS, seed=EVAL_SEED, scene=scene)

    fc, ff, _ = build_fields(cfg)
    pc, pf = _split_params(params)
    out = render_rays(
        fc, pc, ff, pf,
        jax.random.PRNGKey(0),
        data["rays_o"], data["rays_d"], data["t_near"], data["t_far"],
        n_samples=64, n_importance=128,
    )
    pred = np.asarray(out["rgb_fine"], np.float32)
    mse = float(np.mean((pred - data["rgbs"]) ** 2))
    return -10.0 * float(np.log10(mse))


def run_one(scene: str, seed: int, arm: str, steps: int, batch: int,
            nerf_type: str = "medium", photometric: bool = False) -> dict:
    from nerfjax.train import train
    from nerfjax.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    tag = f"{scene}_s{seed}_{arm}"
    if nerf_type != "medium":
        tag = f"{tag}_{nerf_type}_b{batch}"
    if photometric:
        tag = f"{tag}_photo"
    rays = _ensure_rays(scene, batch * STEPS_PER_EPOCH, seed,
                        photometric=photometric)
    cfg = _cfg(tag, arm, batch, steps, rays, nerf_type=nerf_type)
    t0 = time.perf_counter()
    result = train(cfg, seed=seed, log_every=100)
    wall = time.perf_counter() - t0
    psnr = _eval_psnr(cfg, result["params"], scene)
    import jax

    row = {
        "scene": scene,
        "seed": seed,
        "arm": arm,
        "nerf_type": nerf_type,
        "steps": steps,
        "batch": batch,
        "wall_s": round(wall, 1),
        "rays_per_sec": round(result["rays_per_sec"], 1),
        "eval_psnr": round(psnr, 3),
        "platform": jax.default_backend(),
    }
    if photometric:
        row["photometric"] = True
    print(json.dumps(row))
    existing = json.loads(RESULTS.read_text()) if RESULTS.exists() else []
    existing = [
        r for r in existing
        if not (
            r["scene"] == scene
            and r["seed"] == seed
            and r["arm"] == arm
            # early rows recorded nerf_type as None (= the medium default)
            and (r.get("nerf_type") or "medium") == nerf_type
            and r.get("batch", 2048) == batch
            and bool(r.get("photometric")) == photometric
        )
    ]
    existing.append(row)
    RESULTS.write_text(json.dumps(existing, indent=2) + "\n")
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", choices=["sphere", "boxes", "grass"],
                   default="sphere")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arm",
                   choices=["uniform", "occupancy", "sgrad2", "spass2", "spass1",
                            "spass8", "spass12L", "spass12L32", "spass12Led2",
                            "spass10Led2", "spass12Led2k1",
                            # stochastic-forward probes of the tuned arm
                            # (f<k> suffix = hash_fwd_corners=k)
                            "spass12Led2k1f2", "spass12Led2k1f1",
                            # round-4 sampler/update probes (sc = stratified
                            # fast CDF; p<P> = partitioned grid refresh)
                            "spass12Led2k1f1sc", "spass12Led2k1f1scp4",
                            # round-5 stochastic-dense probe (dc<k> =
                            # hash_dense_corners=k)
                            "spass12Led2k1f1scdc1",
                            # round-5 dense-diet + sample-count probes
                            "spass12Led1k1f1sc", "spass12Led2k1f1scns32",
                            "spass12Led1k1f1scns32", "spass12Led1k1f1scns24",
                            # round-5d level-subset backward probes (gl<n> =
                            # hash_grad_levels=n)
                            "spass12Led1k1f1scns24gl4",
                            "spass12Led1k1f1scns24gl3",
                            "spass12Led1k1f1scns24gl2",
                            # round-5e DENSE level-subset backward probes
                            # (gd<n> = hash_dense_grad_levels=n), on either
                            # r5d outcome base
                            "spass12Led1k1f1scns24gd2",
                            "spass12Led1k1f1scns24gd1",
                            "spass12Led1k1f1scns24gl4gd2",
                            "spass12Led1k1f1scns24gl4gd1",
                            "spass12Led1k1f1scns24gl3gd2",
                            "spass12Led1k1f1scns24gl3gd1",
                            "spass12Led1k1f1scns24gl2gd2",
                            "spass12Led1k1f1scns24gl2gd1",
                            # round-5g CDF-resolution probes (sg<M> =
                            # occ_segments=M) on the adopted gl2 base
                            "spass12Led1k1f1scns24gl2sg64",
                            "spass12Led1k1f1scns24gl2sg32",
                            # round-5h reworked-dense-backward probes on
                            # either r5g outcome base
                            "spass12Led1k1f1scns24gl2sg32gd1",
                            "spass12Led1k1f1scns24gl2sg32gd2"],
                   default="uniform")
    p.add_argument("--nerf-type", choices=["small", "medium", "large"],
                   default="medium")
    p.add_argument("--photometric", action="store_true",
                   help="train on photometrically corrupted targets "
                        "(per-frame exposure drift + sensor noise + angular "
                        "blur; tests/synthetic.py make_photometric_ray_npz); "
                        "eval stays against the clean oracle")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--uniform-steps", type=int, default=200)
    p.add_argument("--suite", action="store_true")
    p.add_argument("--out", type=Path, default=None,
                   help="append rows to this JSON instead of "
                        "psnr_parity.json (e.g. CPU-platform side studies)")
    args = p.parse_args()
    if args.out is not None:
        global RESULTS
        RESULTS = args.out

    if args.suite:
        # rows are multi-shape: key the dedup on the SAME shape the suite
        # runs at (medium + args.batch), or benched-shape rows would mark
        # suite cells done
        done = (
            {
                (r["scene"], r["seed"], r["arm"],
                 r.get("nerf_type") or "medium", r.get("batch", 2048))
                for r in json.loads(RESULTS.read_text())
            }
            if RESULTS.exists()
            else set()
        )
        for scene in ("sphere", "boxes", "grass"):
            for seed in (0, 1, 2):
                arms = (
                    ("uniform", "spass2", "spass12Led2k1")
                    if scene == "grass"
                    else ("uniform", "occupancy", "sgrad2", "spass2", "spass1",
                          "spass8")
                )
                for arm in arms:
                    if (scene, seed, arm, "medium", args.batch) in done:
                        print(f"skip {scene} s{seed} {arm} (done)")
                        continue
                    steps = (
                        args.uniform_steps
                        if arm == "uniform"
                        else 3 * args.uniform_steps
                    )
                    run_one(scene, seed, arm, steps, args.batch)
        return

    steps = args.steps or (
        args.uniform_steps if args.arm == "uniform" else 3 * args.uniform_steps
    )
    run_one(args.scene, args.seed, args.arm, steps, args.batch,
            nerf_type=args.nerf_type, photometric=args.photometric)


if __name__ == "__main__":
    main()
