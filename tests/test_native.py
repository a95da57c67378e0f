"""Native C++ kernels must build in this image and agree with numpy."""

import numpy as np
import pytest

from nerfjax.colmap.outliers import knn_mean_distances
from nerfjax.native import knn_mean_distances_native, load, voxelize_native


def test_native_builds():
    assert load() is not None, "g++ toolchain present in image; build must work"


def test_knn_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    ref = knn_mean_distances(pts, 20)
    nat = knn_mean_distances_native(pts, 20)
    assert nat is not None
    np.testing.assert_allclose(nat, ref, rtol=1e-4, atol=1e-5)


def test_knn_edge_cases():
    pts = np.zeros((5, 3), np.float32)
    nat = knn_mean_distances_native(pts, 20)  # k > n-1 clamps
    np.testing.assert_allclose(nat, 0.0, atol=1e-7)


def test_voxelize_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(10_000, 3)).astype(np.float32)
    rgbs = rng.uniform(0, 1, size=(10_000, 3)).astype(np.float32)
    nat = voxelize_native(pts, rgbs, 32)
    assert nat is not None
    b_nat, r_nat = nat

    # numpy oracle (same math as postprocess fallback)
    binary = np.zeros((32,) * 3, np.uint8)
    rgb = np.zeros((32,) * 3 + (3,), np.uint8)
    idx = np.clip(((pts + 1.0) * 0.5 * 31).astype(int), 0, 31)
    binary[idx[:, 0], idx[:, 1], idx[:, 2]] = 255
    rgb[idx[:, 0], idx[:, 1], idx[:, 2]] = (rgbs * 255).astype(np.uint8)

    np.testing.assert_array_equal(b_nat, binary)
    # last-write-wins voxels match except float-rounding of the rgb byte
    assert np.abs(r_nat.astype(int) - rgb.astype(int)).max() <= 1


@pytest.mark.slow
def test_native_speedup_is_real():
    """The point of going native: meaningfully faster than numpy brute force."""
    import time

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(20_000, 3)).astype(np.float32)
    t0 = time.perf_counter()
    knn_mean_distances_native(pts, 20)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    knn_mean_distances(pts, 20)
    t_np = time.perf_counter() - t0
    assert t_nat < t_np, (t_nat, t_np)
