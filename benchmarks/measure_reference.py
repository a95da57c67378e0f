"""Measure the PyTorch reference implementation (CPU) on the synthetic scene.

Runs /root/reference/scripts/train_no_amp.py's train() UNMODIFIED (vanilla
NeRF path; tiny-cuda-nn is CUDA-only) on the same procedural scene nerfjax's
tests/bench use, and records:

  * steady-state rays/s (run-differencing: wall(e epochs) - wall(1 epoch)
    cancels dataset load, worker spawn, and model init)
  * PSNR-vs-step from the reference's own 100-step console logs
  * the final checkpoint path (for cross-evaluation through nerfjax)

Usage:
  python benchmarks/measure_reference.py --mode timing
  python benchmarks/measure_reference.py --mode psnr
Artifacts land in benchmarks/out/ (gitignored) and results in
benchmarks/reference_cpu.json.
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
REF_SCRIPTS = "/root/reference/scripts"
OUT = HERE / "out"

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(HERE / "_stubs"))  # omegaconf + tinycudann shims
sys.path.insert(0, REF_SCRIPTS)


def _base_cfg(tag: str, batch_size: int, num_epochs: int) -> "object":
    from omegaconf import OmegaConf  # the stub

    out_dir = OUT / tag
    return OmegaConf.create(
        {
            # vanilla path: the only reference model runnable without CUDA
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
            "rays_file": str(OUT / "rays.npz"),
            "output_dir": str(out_dir),
            "checkpoint_dir": str(out_dir / "checkpoints"),
        }
    )


def _ensure_rays(n_rays: int, seed: int = 0) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "rays.npz"
    import numpy as np

    if path.exists():
        with np.load(path) as d:
            if len(d["rays_o"]) == n_rays:
                return
    sys.path.insert(0, str(REPO / "tests"))
    from synthetic import make_ray_npz

    make_ray_npz(path, n_rays=n_rays, seed=seed)


def _run_reference_train(cfg) -> tuple[float, str]:
    """Call the reference train(cfg); return (wall_seconds, captured stdout)."""
    import train_no_amp as ref

    assert ref.__file__.startswith(REF_SCRIPTS), ref.__file__
    ref.cfg = cfg  # forward_pass reads the module-global cfg (train_no_amp.py:148)
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
        ref.train(cfg)
    return time.perf_counter() - t0, buf.getvalue()


def mode_timing(args) -> dict:
    """Steady-state rays/s by run differencing."""
    batch = args.batch_size
    steps_per_epoch = args.steps_per_epoch
    _ensure_rays(batch * steps_per_epoch)

    t_short, _ = _run_reference_train(_base_cfg("timing_short", batch, 1))
    t_long, _ = _run_reference_train(
        _base_cfg("timing_long", batch, 1 + args.extra_epochs)
    )
    extra_steps = args.extra_epochs * steps_per_epoch
    per_step = (t_long - t_short) / extra_steps
    rays_per_s = batch / per_step
    return {
        "mode": "timing",
        "batch_size": batch,
        "steps_per_epoch": steps_per_epoch,
        "extra_steps": extra_steps,
        "wall_1_epoch_s": round(t_short, 2),
        "wall_total_s": round(t_long, 2),
        "sec_per_step": round(per_step, 3),
        "rays_per_sec": round(rays_per_s, 1),
    }


_PSNR_RE = re.compile(
    r"Epoch:\s*(\d+)\s*\|\s*Iteration:\s*(\d+).*?PSNR:\s*([\d.]+)"
)


def mode_psnr(args) -> dict:
    """PSNR-vs-step curve from the reference's own logs + final checkpoint."""
    batch = args.batch_size
    steps_per_epoch = args.steps_per_epoch
    _ensure_rays(batch * steps_per_epoch)
    cfg = _base_cfg("psnr", batch, args.epochs)
    wall, log = _run_reference_train(cfg)
    curve = []
    for m in _PSNR_RE.finditer(log):
        epoch, idx, psnr = int(m.group(1)), int(m.group(2)), float(m.group(3))
        curve.append({"step": (epoch - 1) * steps_per_epoch + idx, "psnr": psnr})
    return {
        "mode": "psnr",
        "batch_size": batch,
        "steps_per_epoch": steps_per_epoch,
        "epochs": args.epochs,
        "wall_s": round(wall, 2),
        "psnr_curve": curve,
        "final_checkpoint": str(Path(cfg.checkpoint_dir) / "nerf_final.pth"),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["timing", "psnr"], required=True)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--steps-per-epoch", type=int, default=6)
    p.add_argument("--extra-epochs", type=int, default=2, help="timing mode")
    p.add_argument("--epochs", type=int, default=4, help="psnr mode")
    args = p.parse_args()

    import torch

    result = mode_timing(args) if args.mode == "timing" else mode_psnr(args)
    result["torch_version"] = torch.__version__
    result["torch_threads"] = torch.get_num_threads()
    result["device"] = "cpu-1core"

    out_path = HERE / "reference_cpu.json"
    existing = {}
    if out_path.exists():
        existing = json.loads(out_path.read_text())
    existing[args.mode] = result
    out_path.write_text(json.dumps(existing, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
