"""ctypes bindings for the native host runtime (native/ C++ library).

The device compute path is JAX/XLA; the host-side scene pipeline (OBJ
parsing, LBVH construction, BMP output — the parts the reference wrote
in Rust) has a C++ implementation for production-size scenes, with
pure-Python fallbacks producing bit-identical tables (tests assert
parity).  The library auto-builds on first use when a toolchain is
present; set ``RAY_TPU_NO_NATIVE=1`` to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libv4raynative.so")
_lib = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (fallbacks take over)."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or os.environ.get("RAY_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None

    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_i32_p = ctypes.POINTER(ctypes.c_int32)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)

    lib.rt_obj_load.restype = ctypes.c_void_p
    lib.rt_obj_load.argtypes = [ctypes.c_char_p]
    lib.rt_obj_free.argtypes = [ctypes.c_void_p]
    lib.rt_obj_n_models.restype = ctypes.c_int
    lib.rt_obj_n_models.argtypes = [ctypes.c_void_p]
    lib.rt_obj_model_name.restype = ctypes.c_char_p
    lib.rt_obj_model_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rt_obj_n_triangles.restype = ctypes.c_int64
    lib.rt_obj_n_triangles.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rt_obj_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_int, c_float_p, c_float_p, c_float_p,
    ]
    lib.rt_morton_order.argtypes = [c_float_p, c_float_p, ctypes.c_int64, c_i32_p]
    lib.rt_lbvh_max_nodes.restype = ctypes.c_int64
    lib.rt_lbvh_max_nodes.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.rt_lbvh_build.restype = ctypes.c_int64
    lib.rt_lbvh_build.argtypes = [
        c_float_p, c_float_p, ctypes.c_int64, ctypes.c_int32,
        c_float_p, c_float_p, c_i32_p, c_i32_p, c_i32_p,
    ]
    lib.rt_write_bmp.restype = ctypes.c_int
    lib.rt_write_bmp.argtypes = [
        ctypes.c_char_p, c_u8_p, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def obj_triangles(
    path: str, model=None
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native OBJ -> (pts (F,3,3), normals (F,3,3), uvs (F,3,2)) with the
    reference's mesh semantics; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.rt_obj_load(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        n_models = lib.rt_obj_n_models(handle)
        if model is None:
            midx = 0
        elif isinstance(model, int):
            # bounds-check HERE: C++ models[model] is UB out of range,
            # and list[-1] semantics must match the Python fallback
            midx = model if model >= 0 else n_models + model
            if not 0 <= midx < n_models:
                raise IndexError(
                    f"model index {model} out of range ({n_models} models)"
                )
        else:
            names = [
                lib.rt_obj_model_name(handle, i).decode() for i in range(n_models)
            ]
            if model not in names:
                raise KeyError(f"cannot find the model {model!r}")
            midx = names.index(model)
        f = lib.rt_obj_n_triangles(handle, midx)
        pts = np.empty((f, 3, 3), np.float32)
        nrm = np.empty((f, 3, 3), np.float32)
        uv = np.empty((f, 3, 2), np.float32)
        lib.rt_obj_fill(handle, midx, _fp(pts), _fp(nrm), _fp(uv))
        return pts, nrm, uv
    finally:
        lib.rt_obj_free(handle)


def morton_order(tmin: np.ndarray, tmax: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    n = tmin.shape[0]
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    order = np.empty(n, np.int32)
    lib.rt_morton_order(_fp(tmin), _fp(tmax), n, _ip(order))
    return order


def lbvh_build(
    tmin: np.ndarray, tmax: np.ndarray, leaf_size: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native build over Morton-sorted AABBs -> (node_min, node_max,
    miss_link, leaf_start, leaf_count) trimmed to the node count."""
    lib = get_lib()
    if lib is None:
        return None
    n = tmin.shape[0]
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    cap = lib.rt_lbvh_max_nodes(n, leaf_size)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    miss = np.empty(cap, np.int32)
    lstart = np.empty(cap, np.int32)
    lcount = np.empty(cap, np.int32)
    m = lib.rt_lbvh_build(
        _fp(tmin), _fp(tmax), n, leaf_size,
        _fp(node_min), _fp(node_max), _ip(miss), _ip(lstart), _ip(lcount),
    )
    return node_min[:m], node_max[:m], miss[:m], lstart[:m], lcount[:m]


def write_bmp(path: str, rgb: np.ndarray) -> bool:
    """Native 24-bit BMP writer; False when unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    rc = lib.rt_write_bmp(
        path.encode(), rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
    )
    return rc == 0
