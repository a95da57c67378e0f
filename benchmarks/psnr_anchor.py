"""Training-quality anchor: reference-vanilla vs nerfjax --fp32, same NPZ.

The parity tests prove same-math at the unit level; this experiment anchors
END-TO-END training quality against a curve the reference itself produced:

  1. ``measure_reference.py --mode psnr`` runs the UNMODIFIED reference
     ``train_no_amp.py`` (vanilla path, torch-CPU) on the synthetic ray NPZ
     and records its own every-100-step PSNR console logs
     (reference scripts/train_no_amp.py:319,337).
  2. ``--mode nerfjax`` here runs nerfjax's fp32 twin (precision=fp32,
     dist_last=1e6, grad_clip=1.0 — the train_no_amp deltas) on the SAME
     NPZ with the same batch/step protocol and records the same curve.
  3. ``--mode crosseval`` loads BOTH final checkpoints through nerfjax's
     torch-free .pth reader and evaluates full-dataset PSNR with one
     identical fp32 renderer (train=False, shared key) — an optimizer- and
     logging-independent final-quality number.

Results accumulate in benchmarks/psnr_anchor.json; the table lands in
docs/PERF.md ("Training-quality anchor").

Usage (after measure_reference.py --mode psnr has produced its curve):
  python benchmarks/psnr_anchor.py --mode nerfjax
  python benchmarks/psnr_anchor.py --mode crosseval
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import re
import sys
import time
from pathlib import Path

HERE = Path(__file__).parent
REPO = HERE.parent
OUT = HERE / "out"

sys.path.insert(0, str(REPO))

_PSNR_RE = re.compile(
    r"Epoch:\s*(\d+)\s*\|\s*Iteration:\s*(\d+).*?PSNR:\s*([-\d.]+)"
)


def _nerfjax_cfg(batch_size: int, num_epochs: int):
    from nerfjax.config import ConfigNode, with_defaults

    out_dir = OUT / "anchor_nerfjax"
    return with_defaults(
        ConfigNode(
            {
                "scene_name": "anchor",
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
                # the fp32 twin (reference train_no_amp.py deltas)
                "precision": "fp32",
                "dist_last": 1e6,
                "grad_clip": 1.0,
                "occupancy_grid": False,
                "rays_file": str(OUT / "rays.npz"),
                "output_dir": str(out_dir),
                "checkpoint_dir": str(out_dir / "checkpoints"),
            }
        )
    )


def mode_nerfjax(args) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")  # same hardware as the reference

    from nerfjax.train import train

    rays = OUT / "rays.npz"
    assert rays.exists(), "run measure_reference.py --mode psnr first"
    import numpy as np

    with np.load(rays) as d:
        n_rays = len(d["rays_o"])
    steps_per_epoch = n_rays // args.batch_size
    cfg = _nerfjax_cfg(args.batch_size, args.epochs)

    buf = io.StringIO()

    class _Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    t0 = time.perf_counter()
    with contextlib.redirect_stdout(_Tee()):
        train(cfg, seed=args.seed, log_every=100)
    wall = time.perf_counter() - t0

    curve = []
    for m in _PSNR_RE.finditer(buf.getvalue()):
        epoch, idx, psnr = int(m.group(1)), int(m.group(2)), float(m.group(3))
        curve.append({"step": (epoch - 1) * steps_per_epoch + idx, "psnr": psnr})
    return {
        "mode": "nerfjax",
        "batch_size": args.batch_size,
        "steps_per_epoch": steps_per_epoch,
        "epochs": args.epochs,
        "seed": args.seed,
        "wall_s": round(wall, 2),
        "psnr_curve": curve,
        "final_checkpoint": str(Path(cfg.checkpoint_dir) / "nerf_final.pth"),
    }


def _eval_checkpoint(ckpt_path: Path, chunk: int = 4096) -> float:
    """Full-dataset PSNR of a vanilla checkpoint under one shared renderer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfjax import pth
    from nerfjax.checkpoint import params_from_state_dicts
    from nerfjax.render import render_rays
    from nerfjax.train import build_fields

    cfg = _nerfjax_cfg(256, 1)
    obj = pth.load(ckpt_path)
    params = params_from_state_dicts(
        cfg, obj["nerf_coarse_state_dict"], obj["nerf_fine_state_dict"]
    )
    fc, ff, _ = build_fields(cfg)

    with np.load(OUT / "rays.npz") as d:
        rays_o = d["rays_o"].astype(np.float32)
        rays_d = d["rays_d"].astype(np.float32)
        rgbs = d["rgbs"].astype(np.float32)
        t_near = d["t_near"].astype(np.float32)
        t_far = d["t_far"].astype(np.float32)

    @jax.jit
    def render_chunk(pc, pf, o, dr, tn, tf):
        out = render_rays(
            fc, pc, ff, pf, jax.random.PRNGKey(0),
            o, dr, tn, tf, n_samples=64, n_importance=128,
            train=False, dist_last=1e6,
        )
        return out["rgb_fine"]

    pc, pf = params["coarse"], params["fine"]
    n = len(rays_o)
    n_use = (n // chunk) * chunk
    sq_err = 0.0
    for i in range(0, n_use, chunk):
        sl = slice(i, i + chunk)
        pred = np.asarray(
            render_chunk(
                pc, pf,
                jnp.asarray(rays_o[sl]), jnp.asarray(rays_d[sl]),
                jnp.asarray(t_near[sl]), jnp.asarray(t_far[sl]),
            )
        )
        sq_err += float(np.sum((pred - rgbs[sl]) ** 2))
    mse = sq_err / (n_use * 3)
    return -10.0 * float(np.log10(mse))


def mode_crosseval(args) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    anchor_path = HERE / "psnr_anchor.json"
    ref_json = HERE / "reference_cpu.json"
    anchor = json.loads(anchor_path.read_text()) if anchor_path.exists() else {}
    ref = json.loads(ref_json.read_text())
    ref_ckpt = Path(ref["psnr"]["final_checkpoint"])
    nj_ckpt = Path(anchor["nerfjax"]["final_checkpoint"])
    assert ref_ckpt.exists(), ref_ckpt
    assert nj_ckpt.exists(), nj_ckpt

    return {
        "mode": "crosseval",
        "renderer": "nerfjax fp32, train=False, N=64+128, full dataset",
        "reference_final_psnr": round(_eval_checkpoint(ref_ckpt), 3),
        "nerfjax_final_psnr": round(_eval_checkpoint(nj_ckpt), 3),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["nerfjax", "crosseval"], required=True)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    result = mode_nerfjax(args) if args.mode == "nerfjax" else mode_crosseval(args)

    out_path = HERE / "psnr_anchor.json"
    existing = {}
    if out_path.exists():
        existing = json.loads(out_path.read_text())
    existing[args.mode] = result
    out_path.write_text(json.dumps(existing, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
