"""ctypes bindings + on-demand build of the native C++ runtime.

The reference's runtime is native C++ (device management, asset import via
Assimp, driver BLAS builds); our equivalents live in native/*.cpp:
  * mesh_io.cpp  — fast OBJ parsing (production path for big assets)
  * sah_bvh.cpp  — binned SAH BVH builder for static scenes

The library is compiled once with g++ into native/build/ and loaded via
ctypes; every caller has a pure-Python fallback, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_ROOT, "native")
_BUILD_DIR = os.path.join(_SRC_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libdxrtpu_native.so")
_SOURCES = ["mesh_io.cpp", "sah_bvh.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= newest_src:
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        # obj parser
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_error.restype = ctypes.c_char_p
        lib.obj_error.argtypes = [ctypes.c_void_p]
        for fn in ("obj_num_vertices", "obj_num_normals", "obj_num_triangles"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.obj_copy.argtypes = [ctypes.c_void_p] + [
            np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
            for d in (np.float32, np.float32, np.int32, np.int32, np.int32)
        ]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        # sah builder
        lib.sah_build.restype = ctypes.c_void_p
        lib.sah_build.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        for fn in ("sah_num_nodes", "sah_num_refs"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.sah_copy.argtypes = [ctypes.c_void_p] + [
            np.ctypeslib.ndpointer(dtype=d, flags="C_CONTIGUOUS")
            for d in (np.float32, np.float32, np.int32, np.int32)
        ]
        lib.sah_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def parse_obj_native(path: str):
    """Fast OBJ parse. Returns (positions [V,3], normals [N,3],
    face_pos [F,3], face_nrm [F,3], face_mat [F]) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.obj_parse(path.encode())
    try:
        err = lib.obj_error(h)
        if err:
            raise IOError(f"obj_parse({path}): {err.decode()}")
        nv = lib.obj_num_vertices(h)
        nn = lib.obj_num_normals(h)
        nf = lib.obj_num_triangles(h)
        positions = np.empty((nv, 3), np.float32)
        normals = np.empty((nn, 3), np.float32)
        face_pos = np.empty((nf, 3), np.int32)
        face_nrm = np.empty((nf, 3), np.int32)
        face_mat = np.empty((nf,), np.int32)
        lib.obj_copy(h, positions, normals, face_pos, face_nrm, face_mat)
        return positions, normals, face_pos, face_nrm, face_mat
    finally:
        lib.obj_free(h)


def build_sah_native(
    v0: np.ndarray,
    e1: np.ndarray,
    e2: np.ndarray,
    leaf_size: int = 8,
    spatial: bool = False,
):
    """Binned-SAH/SBVH BVH. Returns (nodes_lo [M,3], nodes_hi [M,3],
    child [M,2], order [R]) or None if the native lib is unavailable.
    spatial=True enables SBVH spatial splits: straddling triangles are
    referenced by several leaves, so R >= T (budgeted at 1.5x T)."""
    lib = get_lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = len(v0)
    h = lib.sah_build(v0, e1, e2, n, leaf_size, 1 if spatial else 0)
    try:
        m = lib.sah_num_nodes(h)
        r = lib.sah_num_refs(h)
        nodes_lo = np.empty((m, 3), np.float32)
        nodes_hi = np.empty((m, 3), np.float32)
        child = np.empty((m, 2), np.int32)
        order = np.empty((r,), np.int32)
        lib.sah_copy(h, nodes_lo, nodes_hi, child, order)
        return nodes_lo, nodes_hi, child, order
    finally:
        lib.sah_free(h)
