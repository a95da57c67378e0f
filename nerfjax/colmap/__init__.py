from nerfjax.colmap.model_io import (
    read_cameras_txt,
    read_images_txt,
    read_points3d_txt,
    write_images_txt,
    write_points3d_txt,
)
from nerfjax.colmap.outliers import remove_statistical_outliers
from nerfjax.colmap.normalize import (
    compute_percentile_bbox,
    robust_bbox_computation,
    scene_normalization,
)
from nerfjax.colmap.convert import colmap_to_nerf, write_transforms_json
from nerfjax.colmap.quaternion import quat_to_matrix, matrix_to_quat

__all__ = [
    "read_cameras_txt",
    "read_images_txt",
    "read_points3d_txt",
    "write_images_txt",
    "write_points3d_txt",
    "remove_statistical_outliers",
    "compute_percentile_bbox",
    "robust_bbox_computation",
    "scene_normalization",
    "colmap_to_nerf",
    "write_transforms_json",
    "quat_to_matrix",
    "matrix_to_quat",
]
