"""Native C++ host kernels, built on demand and loaded via ctypes.

Provides OpenMP-parallel exact kNN mean distances (the Open3D-C++ role in
the reference) and a voxelizer. Callers fall back to numpy when the
toolchain is unavailable; `load()` returns None in that case.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_SRC = _HERE / "knn.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _lib_path() -> Path:
    # Key the artifact on the source content hash: no prebuilt binary is
    # shipped (a committed .so is unauditable and -march=native makes it
    # machine-specific), and editing knn.cpp always triggers a rebuild.
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    return _HERE / f"libnerfjax_native.{digest}.so"


def _build(lib_path: Path) -> bool:
    tmp = lib_path.with_suffix(".so.tmp")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(tmp),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            print(f"[nerfjax.native] build failed: {res.stderr[:500]}")
            return False
        tmp.replace(lib_path)
        for stale in _HERE.glob("libnerfjax_native*.so"):
            if stale != lib_path:
                stale.unlink(missing_ok=True)
        return True
    except Exception as e:  # g++ missing etc.
        print(f"[nerfjax.native] build unavailable: {e}")
        return False


def load():
    """Return the ctypes library handle, building it if necessary; None if
    the native path is unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        lib_path = _lib_path()
        if not lib_path.exists() and not _build(lib_path):
            return None
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError as e:
            print(f"[nerfjax.native] load failed: {e}")
            return None
        lib.knn_mean_distances.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.voxelize_points.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        fp = ctypes.POINTER(ctypes.c_float)
        lib.gather_ray_batch.argtypes = [
            fp, fp, fp, fp, fp,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            fp, fp, fp, fp, fp,
        ]
        _lib = lib
        return _lib


def knn_mean_distances_native(points, k: int):
    """numpy [n,3] f32 -> [n] mean kNN distance, or None if unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    lib.knn_mean_distances(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)),
        ctypes.c_int(int(k)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def gather_ray_batch_native(arrays: dict, idx):
    """One-pass parallel gather of a shuffled ray batch.

    arrays: dict with contiguous float32 'rays_o'/'rays_d'/'rgbs' [n,3] and
    't_near'/'t_far' [n] (in-RAM or memmapped). idx: [b] integer array.
    Returns the batch dict (train-step key names) or None if the native
    library is unavailable.
    """
    import numpy as np

    lib = load()
    if lib is None:
        return None
    b = len(idx)
    idx = np.ascontiguousarray(idx, np.int64)
    o_out = np.empty((b, 3), np.float32)
    d_out = np.empty((b, 3), np.float32)
    rgb_out = np.empty((b, 3), np.float32)
    tn_out = np.empty((b,), np.float32)
    tf_out = np.empty((b,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gather_ray_batch(
        arrays["rays_o"].ctypes.data_as(fp),
        arrays["rays_d"].ctypes.data_as(fp),
        arrays["rgbs"].ctypes.data_as(fp),
        arrays["t_near"].ctypes.data_as(fp),
        arrays["t_far"].ctypes.data_as(fp),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(b),
        o_out.ctypes.data_as(fp),
        d_out.ctypes.data_as(fp),
        rgb_out.ctypes.data_as(fp),
        tn_out.ctypes.data_as(fp),
        tf_out.ctypes.data_as(fp),
    )
    return {
        "rays_o": o_out,
        "rays_d": d_out,
        "rgb": rgb_out,
        "t_near": tn_out,
        "t_far": tf_out,
    }


def voxelize_native(points, rgbs, grid_size: int, fill: int = 255):
    """numpy points/rgbs -> (binary [g,g,g] u8, rgb [g,g,g,3] u8), or None."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    cols = np.ascontiguousarray(rgbs, np.float32)
    binary = np.zeros((grid_size,) * 3, np.uint8)
    rgb = np.zeros((grid_size,) * 3 + (3,), np.uint8)
    lib.voxelize_points(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)),
        ctypes.c_int(int(grid_size)),
        ctypes.c_uint8(fill),
        binary.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return binary, rgb
