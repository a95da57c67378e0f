"""The procedural scene fixtures themselves: every geometry the parity
protocol trains on must be deterministic, bounded, and shaped as designed.

The "grass" scene is the high-frequency geometry class (the reference's
demonstrated use is real grass/forest photographs, reference
README.md:115-196); its blades must be thin relative to the sphere/boxes
feature scale or the scene-class claim it supports is empty.
"""

import numpy as np
import pytest

from tests.synthetic import analytic_density, analytic_rgb, make_ray_npz

SCENES = ["sphere", "boxes", "grass"]


@pytest.mark.parametrize("scene", SCENES)
def test_density_bounded_and_deterministic(scene):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(50_000, 3)).astype(np.float32)
    d1 = analytic_density(pts, scene)
    d2 = analytic_density(pts.copy(), scene)
    np.testing.assert_array_equal(d1, d2)
    assert np.isfinite(d1).all()
    assert d1.min() >= 0.0 and d1.max() <= 25.0 + 1e-6
    c = analytic_rgb(pts, scene)
    assert np.isfinite(c).all()
    assert c.min() >= 0.0 and c.max() <= 1.0


def test_grass_structure_scale():
    """Blades are thin (sub-0.05 xy autocorrelation) and rooted: dense at
    the ground slab, sparse-but-present in the blade band, empty above."""
    rng = np.random.default_rng(1)
    n = 200_000
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    d = analytic_density(pts, "grass")
    ground = pts[:, 2] < -0.75
    band = (pts[:, 2] > -0.6) & (pts[:, 2] < -0.2)
    sky = pts[:, 2] > 0.5
    assert (d[ground] > 12).mean() > 0.9  # solid ground slab
    frac_band = (d[band] > 1).mean()
    assert 0.02 < frac_band < 0.3  # thin blades: sparse, not empty
    assert (d[sky] > 1).mean() < 0.01  # above the tallest blade

    # thin structure: shifting xy by half a blade radius flips most
    # in-blade points out (the field decorrelates below the 0.1 pitch)
    band_pts = pts[band & (d > 1)]
    if band_pts.shape[0] > 100:
        shifted = band_pts + np.array([0.05, 0.0, 0.0], np.float32)
        d_shift = analytic_density(shifted, "grass")
        assert (d_shift > 1).mean() < 0.5


def test_grass_ray_npz(tmp_path):
    data = make_ray_npz(tmp_path / "g.npz", n_rays=1024, seed=0, scene="grass")
    assert data["rays_o"].shape == (1024, 3)
    assert np.isfinite(data["rgbs"]).all()
    # green channel dominates (grass-colored targets, not gray noise)
    mean = data["rgbs"].mean(0)
    assert mean[1] > mean[0] > mean[2]
    # color variance exists (blade/ground structure reaches the targets)
    assert data["rgbs"].std() > 0.03


def test_photometric_ray_npz(tmp_path):
    """The corrupted-capture generator (round-3 verdict #4): same rays as
    the clean fixture, targets degraded by per-frame exposure drift,
    sensor noise, and angular blur — deterministic, bounded, and actually
    different from the clean targets."""
    from tests.synthetic import make_photometric_ray_npz

    clean = make_ray_npz(tmp_path / "c.npz", n_rays=512, seed=3)
    photo = make_photometric_ray_npz(tmp_path / "p.npz", n_rays=512, seed=3)
    photo2 = make_photometric_ray_npz(tmp_path / "p2.npz", n_rays=512, seed=3)

    # geometry identical (same rays, same bounds) — only the targets change
    for k in ("rays_o", "rays_d", "t_near", "t_far"):
        np.testing.assert_array_equal(clean[k], photo[k])
    # deterministic in the seed
    np.testing.assert_array_equal(photo["rgbs"], photo2["rgbs"])
    # bounded like a saturating sensor
    assert photo["rgbs"].min() >= 0.0 and photo["rgbs"].max() <= 1.0
    # corruption is material but not destructive: mean |delta| within
    # (noise_sigma/2, 0.2) of the clean targets
    delta = np.abs(photo["rgbs"] - clean["rgbs"]).mean()
    assert 0.0075 < delta < 0.2, delta
    # exposure drift is per-frame: frame-chunk mean brightness ratios vary
    n_frames = 16
    frame_of = (np.arange(512) * n_frames // 512)
    bright = np.array([
        photo["rgbs"][frame_of == i].mean() / max(clean["rgbs"][frame_of == i].mean(), 1e-6)
        for i in range(n_frames)
    ])
    assert bright.std() > 0.02, bright
