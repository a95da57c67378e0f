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


def test_gather_ray_batch_matches_numpy(tmp_path):
    """The native data-loader gather must produce batches identical to the
    numpy fancy-indexing path, for both in-RAM and memmapped sources."""
    import numpy as np

    from nerfjax.data import RayDataset
    from nerfjax.native import gather_ray_batch_native, load

    rng = np.random.default_rng(0)
    n = 1000
    path = tmp_path / "rays.npz"
    np.savez(
        path,
        rays_o=rng.normal(size=(n, 3)).astype(np.float32),
        rays_d=rng.normal(size=(n, 3)).astype(np.float32),
        rgbs=rng.uniform(size=(n, 3)).astype(np.float32),
        t_near=rng.uniform(0, 1, n).astype(np.float32),
        t_far=rng.uniform(2, 3, n).astype(np.float32),
    )
    if load() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    for memmap in (False, True):
        ds = RayDataset(path, use_memmap=memmap, verbose=False)
        idx = rng.integers(0, n, size=256)
        arrays = {
            "rays_o": np.ascontiguousarray(ds.rays_o, np.float32),
            "rays_d": np.ascontiguousarray(ds.rays_d, np.float32),
            "rgbs": np.ascontiguousarray(ds.rgbs, np.float32),
            "t_near": np.ascontiguousarray(ds.t_near, np.float32),
            "t_far": np.ascontiguousarray(ds.t_far, np.float32),
        }
        batch = gather_ray_batch_native(arrays, idx)
        np.testing.assert_array_equal(batch["rays_o"], ds.rays_o[idx])
        np.testing.assert_array_equal(batch["rgb"], ds.rgbs[idx])
        np.testing.assert_array_equal(batch["t_near"], ds.t_near[idx])

    # epoch_batches (whatever path it picks) matches the pure-numpy gather
    ds = RayDataset(path, verbose=False)
    perm = np.random.default_rng(7).permutation(n)
    got = next(iter(ds.epoch_batches(128, seed=7)))
    np.testing.assert_array_equal(got["rays_o"], ds.rays_o[perm[:128]])
    np.testing.assert_array_equal(got["t_far"], ds.t_far[perm[:128]])
