import json

import jax.numpy as jnp
import numpy as np

from nerfjax.rays import (
    get_rays,
    load_ray_data,
    precompute_rays_for_scene,
    ray_cube_intersection,
    save_ray_data,
)


def _numpy_slab(ro, rd, lo=-1.0, hi=1.0):
    """Independent NumPy oracle (same slab method as the reference)."""
    eps = 1e-8
    rd = np.where(np.abs(rd) < eps, np.sign(rd) * eps, rd)
    rd = np.where(rd == 0, eps, rd)
    t0 = (lo - ro) / rd
    t1 = (hi - ro) / rd
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmin <= tmax) & (tmax >= 0)
    return hit, np.maximum(tmin, 0.0), tmax


def test_ray_cube_intersection_matches_oracle():
    rng = np.random.default_rng(0)
    ro = rng.normal(size=(5000, 3)).astype(np.float32) * 3
    rd = rng.normal(size=(5000, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    hit, tn, tf = ray_cube_intersection(jnp.asarray(ro), jnp.asarray(rd))
    ohit, otn, otf = _numpy_slab(ro, rd)
    np.testing.assert_array_equal(np.asarray(hit), ohit)
    np.testing.assert_allclose(np.asarray(tn)[ohit], otn[ohit], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tf)[ohit], otf[ohit], rtol=1e-4, atol=1e-4)


def test_ray_inside_cube():
    ro = jnp.zeros((1, 3))
    rd = jnp.array([[1.0, 0.0, 0.0]])
    hit, tn, tf = ray_cube_intersection(ro, rd)
    assert bool(hit[0])
    assert float(tn[0]) == 0.0
    np.testing.assert_allclose(float(tf[0]), 1.0, rtol=1e-5)


def test_get_rays_geometry():
    H = W = 8
    f = 10.0
    K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    # Identity pose at origin: center pixel ray should point along -z (OpenGL).
    c2w = jnp.eye(4)[None]
    rays_o, rays_d = get_rays(H, W, K, c2w)
    assert rays_o.shape == (1, H, W, 3)
    assert rays_d.shape == (1, H, W, 3)
    center = np.asarray(rays_d[0, H // 2, W // 2])
    assert center[2] < 0  # looking down -z after OpenCV->OpenGL flip
    np.testing.assert_allclose(np.linalg.norm(center), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0, atol=1e-7)

    # Translated pose moves all origins.
    c2w2 = c2w.at[0, :3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    rays_o2, _ = get_rays(H, W, K, c2w2)
    np.testing.assert_allclose(
        np.asarray(rays_o2[0, 0, 0]), [1.0, 2.0, 3.0], rtol=1e-6
    )


def test_get_rays_rotation():
    H = W = 4
    K = jnp.array([[5.0, 0, 2.0], [0, 5.0, 2.0], [0, 0, 1]], jnp.float32)
    # Rotate camera 180 degrees about x: -z becomes +z.
    R = np.diag([1.0, -1.0, -1.0])
    c2w = np.eye(4)
    c2w[:3, :3] = R
    _, rays_d = get_rays(H, W, K, jnp.asarray(c2w, jnp.float32)[None])
    center = np.asarray(rays_d[0, 2, 2])
    assert center[2] > 0


def test_precompute_roundtrip(tmp_path):
    # Tiny synthetic scene: 2 frames, 4x4 images, camera 3 units back on +z.
    H = W = 4
    f = 4.0
    K = [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]
    pose = np.eye(4)
    pose[2, 3] = 3.0

    img = (np.arange(H * W * 3).reshape(H, W, 3) % 255).astype(np.uint8)
    from PIL import Image

    img_path = tmp_path / "im0.png"
    Image.fromarray(img).save(img_path)

    meta = {
        "h": H,
        "w": W,
        "K": K,
        "frames": [
            {"file_path": str(img_path), "transform_matrix": pose.tolist()},
            {"file_path": str(img_path), "transform_matrix": pose.tolist()},
        ],
    }
    tj = tmp_path / "transforms_t.json"
    tj.write_text(json.dumps(meta))

    data = precompute_rays_for_scene(tj)
    assert data["rays_o"].shape[1] == 3
    assert data["rays_o"].shape[0] > 0
    assert data["rays_o"].dtype == np.float32
    # directions normalized
    np.testing.assert_allclose(
        np.linalg.norm(data["rays_d"], axis=-1), 1.0, rtol=1e-5
    )
    assert (data["t_far"] >= data["t_near"]).all()
    assert (data["rgbs"] >= 0).all() and (data["rgbs"] <= 1).all()

    npz = tmp_path / "t_ray_data.npz"
    save_ray_data(data, npz)
    back = load_ray_data(npz)
    for k in data:
        np.testing.assert_array_equal(back[k], data[k])


def test_orbit_poses_look_at_origin():
    from nerfjax.render_image import orbit_poses

    poses = orbit_poses(8, radius=2.5, height=1.2)
    assert poses.shape == (8, 4, 4)
    for c2w in poses:
        R = c2w[:3, :3]
        # orthonormal rotation
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99
        # camera sits on the orbit
        np.testing.assert_allclose(
            np.linalg.norm(c2w[:2, 3]), 2.5, rtol=1e-5
        )
        np.testing.assert_allclose(c2w[2, 3], 1.2, rtol=1e-5)
        # -Z (OpenGL forward) points at the origin
        fwd = -R[:, 2]
        to_origin = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        np.testing.assert_allclose(fwd, to_origin, atol=1e-5)
