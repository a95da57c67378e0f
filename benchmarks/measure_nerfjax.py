"""Measure nerfjax on the SAME workload as measure_reference.py (CPU apples
-to-apples), plus held-out-ray PSNR evaluation of any checkpoint — including
reference(torch)-produced ones, which exercises the vanilla state-dict
interop on a real torch file.

Usage:
  python benchmarks/measure_nerfjax.py --mode timing
  python benchmarks/measure_nerfjax.py --mode psnr
  python benchmarks/measure_nerfjax.py --mode eval --checkpoint <path.pth>
Results accumulate in benchmarks/nerfjax_cpu.json (timing/psnr) or print
(eval).
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

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def _force_cpu() -> None:
    # The axon sitecustomize force-registers the TPU and ignores
    # JAX_PLATFORMS=cpu from the env; the config update works.
    import jax

    jax.config.update("jax_platforms", "cpu")


def _cfg(tag: str, batch_size: int, num_epochs: int):
    from nerfjax.config import ConfigNode, with_defaults

    out_dir = OUT / tag
    return with_defaults(
        ConfigNode(
            {
                "scene_name": tag,
                "ngp": False,
                "nerf_type": "large",
                "pos_L": 10,
                "dir_L": 4,
                "hidden_dim": 256,
                "batch_size": batch_size,
                "num_epochs": num_epochs,
                "lr": 5e-4,
                "N_samples": 64,
                "N_importance": 128,
                "white_bg": False,
                "use_memmap": False,
                "chunk_size": 32768,
                # reference-parity sampling + precision (fp32 = no-AMP twin)
                "occupancy_grid": False,
                "precision": "fp32",
                "dist_last": 1e6,
                "grad_clip": 1.0,
                "rays_file": str(OUT / "rays.npz"),
                "output_dir": str(out_dir),
                "checkpoint_dir": str(out_dir / "checkpoints"),
            }
        )
    )


def _ensure_rays(n_rays: int, seed: int = 0) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "rays.npz"
    import numpy as np

    if path.exists():
        with np.load(path) as d:
            if len(d["rays_o"]) == n_rays:
                return
    from synthetic import make_ray_npz

    make_ray_npz(path, n_rays=n_rays, seed=seed)


def mode_timing(args) -> dict:
    _force_cpu()
    from nerfjax.train import train

    batch, spe = args.batch_size, args.steps_per_epoch
    _ensure_rays(batch * spe)

    t0 = time.perf_counter()
    train(_cfg("nj_timing_short", batch, 1), log_every=10_000)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    train(_cfg("nj_timing_long", batch, 1 + args.extra_epochs), log_every=10_000)
    t_long = time.perf_counter() - t0

    extra_steps = args.extra_epochs * spe
    per_step = (t_long - t_short) / extra_steps
    return {
        "mode": "timing",
        "batch_size": batch,
        "steps_per_epoch": spe,
        "extra_steps": extra_steps,
        "wall_1_epoch_s": round(t_short, 2),
        "wall_total_s": round(t_long, 2),
        "sec_per_step": round(per_step, 3),
        "rays_per_sec": round(batch / per_step, 1),
    }


def mode_psnr(args) -> dict:
    _force_cpu()
    from nerfjax.train import train

    batch, spe = args.batch_size, args.steps_per_epoch
    _ensure_rays(batch * spe)
    cfg = _cfg("nj_psnr", batch, args.epochs)
    t0 = time.perf_counter()
    result = train(cfg, log_every=50, seed=args.seed)
    wall = time.perf_counter() - t0
    return {
        "mode": "psnr",
        "batch_size": batch,
        "steps_per_epoch": spe,
        "epochs": args.epochs,
        "seed": args.seed,
        "wall_s": round(wall, 2),
        "final_train_psnr": round(result["metrics"].get("psnr", float("nan")), 3),
        "final_checkpoint": str(Path(cfg.checkpoint_dir) / "nerf_final.pth"),
    }


def eval_checkpoint(ckpt_path: str, n_rays: int = 2048, seed: int = 1234) -> dict:
    """Held-out-ray PSNR: render fresh analytic-scene rays (unseen seed) with
    the fine model from `ckpt_path` and compare to the numpy oracle. Works on
    both nerfjax- and torch/reference-produced vanilla checkpoints."""
    _force_cpu()
    import jax
    import numpy as np

    from nerfjax import checkpoint as ckpt
    from nerfjax.render import render_rays
    from nerfjax.train import build_fields
    from synthetic import make_ray_npz

    eval_npz = OUT / f"eval_rays_{seed}.npz"
    data = make_ray_npz(eval_npz, n_rays=n_rays, seed=seed)

    cfg = _cfg("nj_eval", 1, 1)
    params = ckpt.load_field_params(ckpt_path, cfg, which="fine")
    coarse = ckpt.load_field_params(ckpt_path, cfg, which="coarse")
    fc, ff, _ = build_fields(cfg)
    out = render_rays(
        fc,
        coarse.get("coarse", coarse.get("model")),
        ff,
        params.get("fine", params.get("model")),
        jax.random.PRNGKey(0),
        data["rays_o"],
        data["rays_d"],
        data["t_near"],
        data["t_far"],
        n_samples=64,
        n_importance=128,
        dist_last=1e6,
    )
    pred = np.asarray(out["rgb_fine"])
    mse = float(np.mean((pred - data["rgbs"]) ** 2))
    psnr = -10.0 * np.log10(mse)
    return {
        "mode": "eval",
        "checkpoint": str(ckpt_path),
        "n_eval_rays": n_rays,
        "eval_seed": seed,
        "mse": mse,
        "psnr": round(psnr, 3),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["timing", "psnr", "eval"], required=True)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--steps-per-epoch", type=int, default=6)
    p.add_argument("--extra-epochs", type=int, default=2)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", type=str, default=None)
    args = p.parse_args()

    if args.mode == "eval":
        result = eval_checkpoint(args.checkpoint)
        print(json.dumps(result))
        return

    result = mode_timing(args) if args.mode == "timing" else mode_psnr(args)
    result["device"] = "cpu-1core"
    out_path = HERE / "nerfjax_cpu.json"
    existing = json.loads(out_path.read_text()) if out_path.exists() else {}
    key = args.mode if args.mode != "psnr" else f"psnr_seed{args.seed}"
    existing[key] = result
    out_path.write_text(json.dumps(existing, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
