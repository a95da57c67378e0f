import numpy as np

from nerfjax.colmap.outliers import filter_radius_outliers


def test_radius_filter():
    rng = np.random.default_rng(0)
    cluster = rng.normal(scale=0.1, size=(300, 3))
    lonely = np.array([[10.0, 10, 10], [-9, 4, 2]])
    pts = np.concatenate([cluster, lonely])
    filtered, keep = filter_radius_outliers(pts, radius=0.5, min_neighbors=5)
    assert len(filtered) == 300
    assert 300 not in keep and 301 not in keep


def test_radius_filter_empty():
    pts = np.zeros((0, 3))
    filtered, keep = filter_radius_outliers(pts, 0.5)
    assert len(filtered) == 0
