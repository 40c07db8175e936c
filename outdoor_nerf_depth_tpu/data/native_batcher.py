"""ctypes bridge to the native (C++) batch-assembly dataplane.

Builds `native/dataplane.cpp` on first use (g++ -O3 -shared, cached beside
the source) and exposes `NativeRayBatcher`, a drop-in producer of host-cast
`Batch` pytrees: fused random-pixel gather + ray casting in multithreaded
C++. Falls back cleanly when no toolchain is available — callers check
`is_available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from outdoor_nerf_depth_tpu.data import rays as rays_lib

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_SRC = os.path.join(_REPO_ROOT, "native", "dataplane.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libdataplane.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", None) or str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_LIB)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.sample_ray_batch.argtypes = [
            f32p, f32p, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int,
            f32p, f32p, f32p, f32p, f32p, f32p, f32p, i32p,
        ]
        lib.sample_ray_batch.restype = None
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeRayBatcher:
    """Produces host-cast Batches from a RayDataset via the C++ dataplane.

    Requires shared [3,3] intrinsics (the driving-scene case). Per-call
    output buffers are reused; callers consume each batch before requesting
    the next (the PrefetchIterator double-buffers by deep-copying).
    """

    def __init__(self, dataset, seed: int = 0, num_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native dataplane unavailable: {_build_error}")
        if dataset.pixtocams.ndim != 2:
            raise ValueError("native batcher needs shared intrinsics [3,3]")
        self._lib = lib
        self._ds = dataset
        self._seed = np.uint64(seed + 1)
        self._threads = num_threads
        self._images = np.ascontiguousarray(dataset.images, np.float32)
        self._depth_gt = (
            None
            if dataset.depth_gt is None
            else np.ascontiguousarray(dataset.depth_gt, np.float32)
        )
        self._depth_sup = (
            None
            if dataset.depth_sup is None
            else np.ascontiguousarray(dataset.depth_sup, np.float32)
        )
        self._pixtocams = np.ascontiguousarray(dataset.pixtocams, np.float32)
        self._camtoworlds = np.ascontiguousarray(dataset.camtoworlds, np.float32)

    def sample_batch(self) -> rays_lib.Batch:
        n = self._ds.batch_size
        f32 = np.float32
        rgb = np.empty((n, 3), f32)
        depth_gt = np.empty((n,), f32)
        depth_sup = np.empty((n,), f32)
        origins = np.empty((n, 3), f32)
        directions = np.empty((n, 3), f32)
        viewdirs = np.empty((n, 3), f32)
        radii = np.empty((n, 1), f32)
        cam_idx = np.empty((n,), np.int32)

        ptr = lambda a: (
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if a is not None
            else ctypes.POINTER(ctypes.c_float)()
        )
        self._seed = np.uint64(
            (int(self._seed) * 6364136223846793005 + 1442695040888963407)
            % 2**64
        )
        self._lib.sample_ray_batch(
            ptr(self._images), ptr(self._depth_gt), ptr(self._depth_sup),
            ptr(self._pixtocams), ptr(self._camtoworlds),
            self._ds.n_images, self._ds.height, self._ds.width, n,
            ctypes.c_uint64(int(self._seed)), self._threads,
            ptr(rgb), ptr(depth_gt), ptr(depth_sup),
            ptr(origins), ptr(directions), ptr(viewdirs), ptr(radii),
            cam_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )

        ones = np.ones((n, 1), f32)
        ray = rays_lib.Rays(
            origins=origins,
            directions=directions,
            viewdirs=viewdirs,
            radii=radii,
            imageplane=np.zeros((n, 2), f32),
            lossmult=ones,
            near=np.full((n, 1), self._ds.near, f32),
            far=np.full((n, 1), self._ds.far, f32),
            cam_idx=cam_idx[:, None],
        )
        return rays_lib.Batch(
            rays=ray,
            rgb=rgb,
            depth_gt=None if self._depth_gt is None else depth_gt,
            depth_sup=None if self._depth_sup is None else depth_sup,
        )
