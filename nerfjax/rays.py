"""Ray generation and ray/cube intersection.

Jitted batch reimplementation of the reference's NumPy ray precompute
(reference: scripts/precompute_rays.py:10-120). The same functions serve both
the offline precompute CLI and on-device render-time ray generation.

File contract preserved: ``<scene>_ray_data.npz`` with keys
``rays_o[N,3] f32, rays_d[N,3] f32 (normalized), rgbs[N,3] f32 in [0,1],
t_near[N] f32, t_far[N] f32`` keeping only cube-intersecting rays
(reference: scripts/precompute_rays.py:216-227).
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("cube_min", "cube_max"))
def ray_cube_intersection(
    rays_o: jax.Array,
    rays_d: jax.Array,
    cube_min: float = -1.0,
    cube_max: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Slab-method intersection of rays with the axis-aligned cube.

    Mirrors reference behavior (scripts/precompute_rays.py:10-64) including the
    epsilon guard against zero direction components and clamping t_near >= 0.

    Returns (intersects[N] bool, t_near[N], t_far[N]).
    """
    eps = 1e-8
    d = jnp.where(jnp.abs(rays_d) < eps, jnp.sign(rays_d) * eps, rays_d)
    # sign(0) == 0 would still divide by zero; pin those to +eps.
    d = jnp.where(d == 0.0, eps, d)

    t0 = (cube_min - rays_o) / d
    t1 = (cube_max - rays_o) / d
    t_min = jnp.minimum(t0, t1)
    t_max = jnp.maximum(t0, t1)

    t_near = jnp.max(t_min, axis=-1)
    t_far = jnp.min(t_max, axis=-1)

    intersects = (t_near <= t_far) & (t_far >= 0.0)
    t_near = jnp.maximum(t_near, 0.0)
    return intersects, t_near, t_far


@partial(jax.jit, static_argnames=("H", "W", "opencv_to_opengl", "normalize"))
def get_rays(
    H: int,
    W: int,
    K: jax.Array,
    c2w: jax.Array,
    opencv_to_opengl: bool = True,
    normalize: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Pinhole rays for every pixel of every camera.

    Args:
      H, W: image size.
      K: [3,3] intrinsics.
      c2w: [M,4,4] camera-to-world poses (OpenGL/NeRF convention after the
        flip; the flip `diag(1,-1,-1)` converts OpenCV pixel rays).

    Returns:
      rays_o, rays_d: [M, H, W, 3].

    Parity: reference scripts/precompute_rays.py:67-120 (K^-1 pixels -> F flip
    -> c2w rotation; origins broadcast from camera centers).
    """
    K_inv = jnp.linalg.inv(K)
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # [H, W] each; matches np.meshgrid default
    pix = jnp.stack([uu.ravel(), vv.ravel(), jnp.ones(H * W, jnp.float32)], axis=0)

    dirs = K_inv @ pix  # [3, H*W], camera frame (OpenCV: +z forward)
    if opencv_to_opengl:
        F = jnp.diag(jnp.array([1.0, -1.0, -1.0], jnp.float32))
        dirs = F @ dirs
    if normalize:
        n = jnp.linalg.norm(dirs, axis=0, keepdims=True)
        dirs = dirs / jnp.clip(n, 1e-8, None)

    R = c2w[:, :3, :3]  # [M,3,3]
    t = c2w[:, :3, 3]  # [M,3]
    rays_d = jnp.einsum("mij,jn->min", R, dirs)  # [M,3,H*W]
    rays_d = rays_d.transpose(0, 2, 1).reshape(-1, H, W, 3)
    rays_o = jnp.broadcast_to(t[:, None, None, :], rays_d.shape)
    return rays_o, rays_d


def precompute_rays_for_scene(
    transforms_path: str | Path,
    image_loader=None,
    batch_frames: int = 16,
) -> dict[str, np.ndarray]:
    """Full ray precompute: transforms JSON -> filtered ray arrays.

    Decodes images on host, generates rays in jitted batches of frames to
    bound memory, intersects with the unit cube, and keeps surviving rays.

    Returns dict with the NPZ contract keys.
    """
    transforms_path = Path(transforms_path)
    with open(transforms_path, "r") as f:
        meta = json.load(f)

    H, W = int(meta["h"]), int(meta["w"])
    K = jnp.asarray(np.array(meta["K"], dtype=np.float32))

    if image_loader is None:
        from PIL import Image

        def image_loader(p: str) -> np.ndarray:
            img = np.asarray(Image.open(p).convert("RGB"), dtype=np.float32)
            return img / 255.0

    frames = meta["frames"]
    out_o, out_d, out_rgb, out_tn, out_tf = [], [], [], [], []

    for start in range(0, len(frames), batch_frames):
        chunk = frames[start : start + batch_frames]
        poses = jnp.asarray(
            np.array([f["transform_matrix"] for f in chunk], dtype=np.float32)
        )
        imgs = np.stack([image_loader(f["file_path"]) for f in chunk])  # [m,H,W,3]
        rays_o, rays_d = get_rays(H, W, K, poses)
        ro = np.asarray(rays_o).reshape(-1, 3)
        rd = np.asarray(rays_d).reshape(-1, 3)
        rgb = imgs.reshape(-1, 3).astype(np.float32)

        hit, t_near, t_far = ray_cube_intersection(jnp.asarray(ro), jnp.asarray(rd))
        hit = np.asarray(hit)
        out_o.append(ro[hit])
        out_d.append(rd[hit])
        out_rgb.append(rgb[hit])
        out_tn.append(np.asarray(t_near)[hit])
        out_tf.append(np.asarray(t_far)[hit])

    return {
        "rays_o": np.concatenate(out_o).astype(np.float32),
        "rays_d": np.concatenate(out_d).astype(np.float32),
        "rgbs": np.concatenate(out_rgb).astype(np.float32),
        "t_near": np.concatenate(out_tn).astype(np.float32),
        "t_far": np.concatenate(out_tf).astype(np.float32),
    }


def save_ray_data(data: dict[str, np.ndarray], filename: str | Path) -> None:
    """Write the compressed ray NPZ (reference: precompute_rays.py:227)."""
    # rays_file commonly points inside output_dir, which nothing has
    # created yet when precompute_rays is the first pipeline stage run
    Path(filename).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        filename,
        rays_o=data["rays_o"],
        rays_d=data["rays_d"],
        rgbs=data["rgbs"],
        t_near=data["t_near"],
        t_far=data["t_far"],
    )


def load_ray_data(filename: str | Path, use_memmap: bool = False) -> dict[str, np.ndarray]:
    """Read a ray NPZ (reference: scripts/dataset.py:38-53)."""
    mmap = "r" if use_memmap else None
    data = np.load(filename, mmap_mode=mmap)
    return {k: data[k] for k in ("rays_o", "rays_d", "rgbs", "t_near", "t_far")}
