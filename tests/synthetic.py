"""Procedural synthetic scene fixture.

The reference repo ships no data (data/ is gitignored), so tests use an
analytic scene: a soft colored sphere of radius 0.5 at the origin inside the
[-1,1]^3 cube. Ground-truth ray colors come from dense numpy ray marching of
the analytic field with the same compositing math — a deterministic target a
NeRF can actually fit.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def analytic_density(pts: np.ndarray, scene: str = "sphere") -> np.ndarray:
    """Analytic density field.

    scene="sphere": soft sphere, sigma=25 inside r<0.5, smooth falloff.
    scene="boxes": two offset soft boxes + a thin vertical bar — a second
    geometry (sharp edges, disconnected components) for multi-scene
    PSNR-parity experiments.
    """
    if scene == "sphere":
        r = np.linalg.norm(pts, axis=-1)
        return 25.0 / (1.0 + np.exp((r - 0.5) * 40.0))
    if scene == "boxes":
        def soft_box(p, center, half):
            d = np.abs(p - center) - half
            sdf = np.linalg.norm(np.maximum(d, 0.0), axis=-1) + np.minimum(
                np.max(d, axis=-1), 0.0
            )
            return 25.0 / (1.0 + np.exp(sdf * 60.0))

        s = soft_box(pts, np.array([-0.35, -0.2, -0.1]), np.array([0.25, 0.3, 0.15]))
        s = s + soft_box(pts, np.array([0.4, 0.25, 0.2]), np.array([0.2, 0.2, 0.3]))
        s = s + soft_box(pts, np.array([0.0, -0.3, 0.3]), np.array([0.06, 0.06, 0.45]))
        return np.minimum(s, 25.0)
    if scene == "grass":
        # High-frequency geometry class: the reference's demonstrated use is
        # real grass/forest photographs (reference README.md:115-196). This
        # is its procedural stand-in — a ground slab plus a jittered grid of
        # thin vertical blades (pitch 0.1, radius ~0.02, per-cell height),
        # structure well below the sphere/boxes feature scale.
        def sig(a):  # overflow-safe logistic (float32 exp caps at ~e^88)
            return 1.0 / (1.0 + np.exp(np.clip(a, -80.0, 80.0)))

        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        ground = sig((z + 0.7) * 60.0)
        pitch = 0.1
        ix = np.floor(x / pitch).astype(np.int64)
        iy = np.floor(y / pitch).astype(np.int64)
        # deterministic per-cell hash -> jitter/height/radius (same primes as
        # the hash encoding; values in [0,1))
        h1 = (((ix * 374761393) ^ (iy * 668265263)) & 0x7FFFFFFF) / 2147483648.0
        h2 = (((ix * 2654435761) ^ (iy * 805459861)) & 0x7FFFFFFF) / 2147483648.0
        cx = (ix + 0.2 + 0.6 * h1) * pitch
        cy = (iy + 0.2 + 0.6 * h2) * pitch
        r = np.hypot(x - cx, y - cy)
        radius = 0.018 + 0.012 * h2
        top = -0.2 + 0.5 * h1  # blade tops in [-0.2, 0.3]
        blade = (
            sig((r - radius) * 400.0)
            * sig((z - top) * 40.0)
            * sig(-(z + 0.7) * 60.0)
        )
        patch = (np.abs(x) < 0.8) & (np.abs(y) < 0.8)
        return np.minimum(25.0 * (ground + blade * patch), 25.0)
    raise ValueError(f"unknown scene {scene!r}")


def analytic_rgb(pts: np.ndarray, scene: str = "sphere") -> np.ndarray:
    """Position-coded color in [0,1]."""
    if scene == "boxes":
        # checker-modulated color: higher-frequency target than the sphere
        checker = 0.5 + 0.5 * np.sign(
            np.sin(pts[..., :1] * 9.0) * np.sin(pts[..., 1:2] * 9.0)
        )
        base = np.clip(pts * 0.5 + 0.5, 0.0, 1.0)
        return np.clip(base * (0.4 + 0.6 * checker), 0.0, 1.0)
    if scene == "grass":
        # green blades with per-blade hue variation, brown ground below
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        ix = np.floor(x / 0.1).astype(np.int64)
        iy = np.floor(y / 0.1).astype(np.int64)
        h1 = (((ix * 374761393) ^ (iy * 668265263)) & 0x7FFFFFFF) / 2147483648.0
        t = np.clip((z + 0.7) / 1.0, 0.0, 1.0)  # height blend above ground
        grn = np.stack(
            [0.15 + 0.25 * h1, 0.45 + 0.4 * h1 * t, 0.1 + 0.1 * (1 - h1)], -1
        )
        brown = np.broadcast_to(np.array([0.35, 0.25, 0.12]), grn.shape)
        w = (1.0 / (1.0 + np.exp(np.clip(-(z + 0.68) * 80.0, -80.0, 80.0))))[
            ..., None
        ]
        return np.clip(brown * (1 - w) + grn * w, 0.0, 1.0)
    return np.clip(pts * 0.5 + 0.5, 0.0, 1.0)


def march_rays(
    rays_o: np.ndarray, rays_d: np.ndarray, t_near: np.ndarray, t_far: np.ndarray,
    n_steps: int = 256, scene: str = "sphere",
) -> np.ndarray:
    """Dense deterministic ray march of the analytic field (numpy oracle)."""
    t = np.linspace(0.0, 1.0, n_steps, dtype=np.float32)[None]
    z = t_near[:, None] * (1 - t) + t_far[:, None] * t  # [N,S]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    sigma = analytic_density(pts, scene)
    rgb = analytic_rgb(pts, scene)
    dists = np.diff(z, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[:, :1], 1e10)], -1)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], -1), -1
    )[:, :-1]
    w = alpha * trans
    return (w[..., None] * rgb).sum(1).astype(np.float32)


def make_ray_npz(
    path: str | Path, n_rays: int = 8192, seed: int = 0, scene: str = "sphere"
) -> dict:
    """Random inward rays from a shell, with analytic target colors."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays * 2, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    target = rng.uniform(-0.4, 0.4, size=(n_rays * 2, 3)).astype(np.float32)
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    # slab intersection with [-1,1]^3
    eps = 1e-8
    dd = np.where(np.abs(d) < eps, eps, d)
    t0 = (-1 - o) / dd
    t1 = (1 - o) / dd
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf >= 0)
    o, d, tn, tf = o[hit][:n_rays], d[hit][:n_rays], tn[hit][:n_rays], tf[hit][:n_rays]
    tn = np.maximum(tn, 0.0)

    # thin-structure scenes need a finer oracle march than the 256 default
    # (grass blade radius ~0.02 vs ~0.017 step at 256 over a 4.5-unit ray)
    rgb = march_rays(o, d, tn, tf, scene=scene,
                     n_steps=768 if scene == "grass" else 256)
    data = {
        "rays_o": o.astype(np.float32),
        "rays_d": d.astype(np.float32),
        "rgbs": rgb,
        "t_near": tn.astype(np.float32),
        "t_far": tf.astype(np.float32),
    }
    np.savez_compressed(path, **data)
    return data


def make_photometric_ray_npz(
    path: str | Path,
    n_rays: int = 8192,
    seed: int = 0,
    scene: str = "sphere",
    n_frames: int = 16,
    exposure_range: float = 0.2,
    noise_sigma: float = 0.015,
    blur_angle: float = 0.004,
    blur_taps: int = 4,
) -> dict:
    """Photometrically corrupted variant of :func:`make_ray_npz`.

    The reference's demonstrated use case is real grass/forest photo sets
    (reference README.md:115-196); real captures carry per-frame exposure
    variation, sensor noise, and mild defocus/motion blur that the clean
    analytic fixtures don't. This generator models all three on top of the
    same oracle, in ray space:

    * **blur**: each target color is the mean over ``blur_taps`` extra
      oracle marches whose directions are jittered by a Gaussian of
      ``blur_angle`` radians — a point-spread function applied in the
      angular domain, which is what defocus/motion blur does to the
      radiance a pixel integrates;
    * **exposure**: rays are grouped into ``n_frames`` contiguous
      "frames", each scaled by a factor drawn uniformly from
      ``[1 - exposure_range, 1 + exposure_range]`` (auto-exposure drift
      between shots);
    * **noise**: iid Gaussian sensor noise of ``noise_sigma`` added per
      channel, then clipped to [0, 1] (sensor saturation).

    The corruption is applied to TRAINING targets only — robustness runs
    evaluate against the clean oracle (`make_ray_npz` eval sets), so the
    metric is "how well does training survive a corrupted capture", not
    "can the model memorise noise".
    """
    rng = np.random.default_rng(seed + 777_000)
    clean = make_ray_npz(path, n_rays=n_rays, seed=seed, scene=scene)
    o, d = clean["rays_o"], clean["rays_d"]
    tn, tf = clean["t_near"], clean["t_far"]
    n = len(o)
    n_steps = 768 if scene == "grass" else 256

    # angular-PSF blur: average the clean oracle with jittered-direction
    # marches (slab bounds re-derived per tap so the march stays inside the
    # cube; the jitter is ~0.2°, so bounds barely move)
    acc = clean["rgbs"].astype(np.float64).copy()
    for _ in range(blur_taps):
        jd = d + rng.normal(scale=blur_angle, size=d.shape).astype(np.float32)
        jd = jd / np.linalg.norm(jd, axis=-1, keepdims=True)
        eps = 1e-8
        dd = np.where(np.abs(jd) < eps, eps, jd)
        t0 = (-1 - o) / dd
        t1 = (1 - o) / dd
        jtn = np.maximum(np.minimum(t0, t1).max(-1), 0.0).astype(np.float32)
        jtf = np.maximum(t0, t1).min(-1).astype(np.float32)
        bad = jtn > jtf  # jitter pushed the ray off the cube: reuse central
        jd[bad], jtn[bad], jtf[bad] = d[bad], tn[bad], tf[bad]
        acc += march_rays(o, jd, jtn, jtf, n_steps=n_steps, scene=scene)
    rgb = (acc / (1 + blur_taps)).astype(np.float32)

    # per-frame exposure: contiguous chunks stand in for frames (the rays
    # of one shot are stored together by the precompute pipeline)
    exposures = rng.uniform(
        1.0 - exposure_range, 1.0 + exposure_range, size=n_frames
    ).astype(np.float32)
    frame_of = (np.arange(n) * n_frames // n).astype(np.int32)
    rgb = rgb * exposures[frame_of][:, None]

    # sensor noise + saturation clip
    rgb = rgb + rng.normal(scale=noise_sigma, size=rgb.shape).astype(np.float32)
    rgb = np.clip(rgb, 0.0, 1.0).astype(np.float32)

    data = dict(clean)
    data["rgbs"] = rgb
    np.savez_compressed(path, **data)
    return data


def make_image_scene(scene_dir: str | Path, scene_name: str, n_frames: int = 4,
                     H: int = 32, W: int = 32) -> Path:
    """Full image-based synthetic scene: posed PNG renders + transforms JSON
    (the C5 output contract), for exercising the precompute/train CLIs."""
    from PIL import Image

    scene_dir = Path(scene_dir)
    scene_dir.mkdir(parents=True, exist_ok=True)
    f = 0.8 * W
    K = [[f, 0.0, W / 2], [0.0, f, H / 2], [0.0, 0.0, 1.0]]

    frames = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        cam_pos = np.array([2.5 * np.cos(ang), 2.5 * np.sin(ang), 1.2])
        # look-at origin (OpenGL: camera looks down -z)
        fwd = -cam_pos / np.linalg.norm(cam_pos)  # view direction
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = true_up
        c2w[:3, 2] = -fwd  # -z is forward in OpenGL
        c2w[:3, 3] = cam_pos

        # render the frame analytically through the same ray model
        Kinv = np.linalg.inv(np.array(K))
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        pix = np.stack([u.ravel(), v.ravel(), np.ones(H * W)], 0)
        dirs = np.diag([1.0, -1.0, -1.0]) @ (Kinv @ pix)
        dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
        world_d = (c2w[:3, :3] @ dirs).T.astype(np.float32)
        world_o = np.tile(cam_pos[None].astype(np.float32), (H * W, 1))

        dd = np.where(np.abs(world_d) < 1e-8, 1e-8, world_d)
        t0 = (-1 - world_o) / dd
        t1 = (1 - world_o) / dd
        tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        tf = np.maximum(t0, t1).min(-1)
        ok = tn <= tf
        rgb = np.zeros((H * W, 3), np.float32)
        if ok.any():
            rgb[ok] = march_rays(world_o[ok], world_d[ok], tn[ok], tf[ok])
        img = (rgb.reshape(H, W, 3) * 255).astype(np.uint8)
        img_path = scene_dir / f"frame_{i:03d}.png"
        Image.fromarray(img).save(img_path)
        frames.append(
            {"file_path": str(img_path), "transform_matrix": c2w.tolist()}
        )

    meta = {
        "w": W,
        "h": H,
        "fl_x": f,
        "fl_y": f,
        "k1": 0.0, "k2": 0.0, "k3": 0.0, "k4": 0.0, "p1": 0.0, "p2": 0.0,
        "cx": W / 2, "cy": H / 2,
        "is_fisheye": False,
        "K": K,
        "frames": frames,
        "scene_aabb": {
            "aabb_min": [-0.8, -0.8, -0.8],
            "aabb_max": [0.8, 0.8, 0.8],
            "aabb_center": [0.0, 0.0, 0.0],
            "aabb_size": [1.6, 1.6, 1.6],
            "aabb_volume": 1.6**3,
            "volume_efficiency": 1.0,
            "percentile_bounds": {"lower": 1.0, "upper": 99.0},
            "padding": 0.05,
            "num_points": 0,
            "aabb_remove_below": -0.8,
            "aabb_remove_above": 0.8,
        },
        "normalization": {"center": [0.0, 0.0, 0.0], "scale": 1.0},
    }
    tj = scene_dir / f"transforms_{scene_name}.json"
    tj.write_text(json.dumps(meta))
    return tj
