"""Statistical outlier removal on point clouds — numpy, no Open3D.

Implements the same algorithm as open3d's remove_statistical_outlier used by
the reference (reference: colmap2nerf_corrected.py:157-167,
normalize_with_aabb.py:467-476): for each point, the mean distance to its k
nearest neighbours; points whose mean distance exceeds
(global mean + std_ratio * global std) are dropped.

SfM clouds are <= a few 10^5 points, so chunked brute-force kNN is fast and
exact (reference strategy per SURVEY.md §2 C7).
"""

from __future__ import annotations

import numpy as np


def knn_mean_distances(
    points: np.ndarray, k: int, chunk: int = 2048
) -> np.ndarray:
    """Mean distance of each point to its k nearest neighbours (excluding
    itself), brute force in chunks."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    k = min(k, n - 1)
    if k <= 0:
        return np.zeros(n)
    sq = np.sum(pts * pts, axis=1)
    out = np.empty(n)
    for start in range(0, n, chunk):
        block = pts[start : start + chunk]
        d2 = sq[start : start + chunk, None] + sq[None, :] - 2.0 * (block @ pts.T)
        np.maximum(d2, 0.0, out=d2)
        # k+1 smallest includes the point itself (distance 0)
        idx = np.argpartition(d2, k, axis=1)[:, : k + 1]
        dists = np.sqrt(np.take_along_axis(d2, idx, axis=1))
        out[start : start + chunk] = dists.sum(axis=1) / k  # self contributes 0
    return out


def remove_statistical_outliers(
    points: np.ndarray, nb_neighbors: int = 20, std_ratio: float = 2.0
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (filtered_points, keep_indices) — open3d-compatible semantics.

    Uses the OpenMP C++ kernel (nerfjax.native) when available, exact numpy
    brute force otherwise."""
    points = np.asarray(points)
    if len(points) <= nb_neighbors:
        return points, np.arange(len(points))
    try:
        from nerfjax.native import knn_mean_distances_native

        mean_d = knn_mean_distances_native(points, nb_neighbors)
    except Exception:
        mean_d = None
    if mean_d is None:
        mean_d = knn_mean_distances(points, nb_neighbors)
    mu = mean_d.mean()
    sigma = mean_d.std()
    keep = np.where(mean_d <= mu + std_ratio * sigma)[0]
    return points[keep], keep


def filter_radius_outliers(
    points: np.ndarray, radius: float, min_neighbors: int = 5, chunk: int = 2048
) -> tuple[np.ndarray, np.ndarray]:
    """Radius outlier removal: keep points with >= min_neighbors within
    `radius` (reference: normalize_with_aabb_improved.py:485 uses open3d's
    remove_radius_outlier)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n == 0:
        return points, np.arange(0)
    sq = np.sum(pts * pts, axis=1)
    r2 = radius * radius
    counts = np.empty(n, np.int64)
    for start in range(0, n, chunk):
        block = pts[start : start + chunk]
        d2 = sq[start : start + chunk, None] + sq[None, :] - 2.0 * (block @ pts.T)
        counts[start : start + chunk] = (d2 <= r2).sum(axis=1) - 1  # minus self
    keep = np.where(counts >= min_neighbors)[0]
    return points[keep], keep
