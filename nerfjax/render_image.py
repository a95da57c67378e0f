"""Full-frame rendering and PSNR evaluation.

The reference never renders images after training (its only quality signal
is train-batch PSNR, scripts/train.py:319). This module renders complete
frames from camera poses with the same hierarchical sampler — enabling
held-out-view PSNR, the metric that anchors "parity" claims.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nerfjax.rays import get_rays, ray_cube_intersection
from nerfjax.render import render_rays_planar


def render_image(
    field,
    params,
    K: np.ndarray,
    c2w: np.ndarray,
    H: int,
    W: int,
    *,
    n_samples: int = 64,
    n_importance: int = 128,
    white_bg: bool = False,
    chunk_rays: int = 16384,
    key: jax.Array | None = None,
    dtype=jnp.bfloat16,
) -> np.ndarray:
    """Render one [H, W, 3] frame from a camera pose (cube-clipped rays;
    non-intersecting pixels get the background color)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(K, jnp.float32), jnp.asarray(c2w, jnp.float32)[None])
    ro = np.asarray(rays_o).reshape(-1, 3)
    rd = np.asarray(rays_d).reshape(-1, 3)
    hit, tn, tf = ray_cube_intersection(jnp.asarray(ro), jnp.asarray(rd))
    hit = np.asarray(hit)
    tn = np.asarray(tn)
    tf = np.asarray(tf)

    bg = 1.0 if white_bg else 0.0
    out = np.full((H * W, 3), bg, np.float32)
    idx = np.where(hit)[0]
    if len(idx) == 0:
        return out.reshape(H, W, 3)

    render = jax.jit(
        lambda k, o, d, n, f: render_rays_planar(
            field, params, field, params, k, o, d, n, f,
            n_samples, n_importance, white_bg=white_bg, train=False, dtype=dtype,
        )["rgb_fine"]
    )

    n_pad = -(-len(idx) // chunk_rays) * chunk_rays
    idx_pad = np.concatenate([idx, np.repeat(idx[:1], n_pad - len(idx))])
    rendered = np.empty((n_pad, 3), np.float32)
    for s in range(0, n_pad, chunk_rays):
        sel = idx_pad[s : s + chunk_rays]
        rendered[s : s + chunk_rays] = np.asarray(
            render(
                jax.random.fold_in(key, s),
                jnp.asarray(ro[sel]),
                jnp.asarray(rd[sel]),
                jnp.asarray(tn[sel]),
                jnp.asarray(tf[sel]),
            ),
            np.float32,
        )
    out[idx] = rendered[: len(idx)]
    return out.reshape(H, W, 3)


def orbit_poses(
    n: int,
    *,
    radius: float = 2.5,
    height: float = 1.2,
    target: np.ndarray | None = None,
) -> np.ndarray:
    """[n, 4, 4] OpenGL c2w look-at poses on a horizontal circle around the
    scene (novel views for turntable renders; same convention as the
    transforms JSON frames — camera looks down −Z, +Z world up)."""
    target = np.zeros(3) if target is None else np.asarray(target, np.float64)
    poses = np.empty((n, 4, 4), np.float32)
    for i in range(n):
        ang = 2 * np.pi * i / n
        cam = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        fwd = target - cam
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        if np.linalg.norm(right) < 1e-8:  # looking straight up/down
            right = np.array([1.0, 0.0, 0.0])
        right = right / np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = true_up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = cam
        poses[i] = c2w
    return poses


def eval_psnr(
    field,
    params,
    transforms_path: str | Path,
    *,
    n_frames: int | None = None,
    n_samples: int = 64,
    n_importance: int = 128,
    white_bg: bool = False,
    dtype=jnp.bfloat16,
    verbose: bool = True,
) -> dict:
    """Render frames of a transforms JSON and report PSNR against the
    ground-truth images."""
    from PIL import Image

    with open(transforms_path, "r") as f:
        meta = json.load(f)
    H, W = int(meta["h"]), int(meta["w"])
    K = np.array(meta["K"], np.float32)
    frames = meta["frames"][:n_frames] if n_frames else meta["frames"]

    psnrs = []
    for i, frame in enumerate(frames):
        gt = np.asarray(Image.open(frame["file_path"]).convert("RGB"), np.float32) / 255.0
        pred = render_image(
            field, params, K, np.array(frame["transform_matrix"], np.float32),
            H, W, n_samples=n_samples, n_importance=n_importance,
            white_bg=white_bg, key=jax.random.PRNGKey(i), dtype=dtype,
        )
        mse = float(np.mean((pred - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        psnrs.append(psnr)
        if verbose:
            print(f"frame {i}: PSNR {psnr:.2f}")
    result = {"psnr_mean": float(np.mean(psnrs)), "psnr_per_frame": psnrs}
    if verbose:
        print(f"mean PSNR over {len(psnrs)} frames: {result['psnr_mean']:.2f}")
    return result
