"""ctypes bindings for the native C++ OBJ parser (native/objparse.cpp).

The native runtime component mandated alongside the Python loader — the
reference's asset import is native (ModelIO/Swift, Model.swift:13-24).  The
library is built on demand with ``make`` (g++) and cached; when unavailable
the pure-Python parser in :mod:`.obj` is used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libobjparse.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_counts.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64)]
        lib.obj_vertices.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_float)] * 3
        lib.obj_submesh_tris.restype = ctypes.c_int64
        lib.obj_submesh_tris.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.obj_submesh_material.restype = ctypes.c_char_p
        lib.obj_submesh_material.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.obj_submesh_indices.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.obj_mtllib_count.restype = ctypes.c_int64
        lib.obj_mtllib_count.argtypes = [ctypes.c_void_p]
        lib.obj_mtllib.restype = ctypes.c_char_p
        lib.obj_mtllib.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeObj:
    """Raw parse result: flat arrays + per-submesh index triples."""

    def __init__(self, positions, normals, texcoords, submeshes, mtllibs,
                 face_count):
        self.positions = positions  # (V, 3) f32
        self.normals = normals  # (VN, 3) f32
        self.texcoords = texcoords  # (VT, 2) f32
        # list of (material_name, tri_pos (T,3), tri_norm (T,3), tri_uv (T,3))
        self.submeshes = submeshes
        self.mtllibs: List[str] = mtllibs
        self.face_count = face_count


def parse_obj_native(path: str) -> Optional[NativeObj]:
    """Parse with the C++ library; None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    handle = lib.obj_parse(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        counts = (ctypes.c_int64 * 6)()
        lib.obj_counts(handle, counts)
        nv, nn, nt, nsub, nfaces, _ = list(counts)
        pos = np.empty((nv, 3), np.float32)
        nrm = np.empty((nn, 3), np.float32)
        uv = np.empty((nt, 2), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.obj_vertices(handle, pos.ctypes.data_as(fp),
                         nrm.ctypes.data_as(fp), uv.ctypes.data_as(fp))
        submeshes = []
        ip = ctypes.POINTER(ctypes.c_int32)
        for i in range(nsub):
            t = int(lib.obj_submesh_tris(handle, i))
            name = lib.obj_submesh_material(handle, i).decode()
            tp = np.empty((t, 3), np.int32)
            tn = np.empty((t, 3), np.int32)
            tu = np.empty((t, 3), np.int32)
            lib.obj_submesh_indices(handle, i, tp.ctypes.data_as(ip),
                                    tn.ctypes.data_as(ip),
                                    tu.ctypes.data_as(ip))
            submeshes.append((name, tp, tn, tu))
        mtllibs = [lib.obj_mtllib(handle, i).decode()
                   for i in range(int(lib.obj_mtllib_count(handle)))]
        return NativeObj(pos, nrm, uv, submeshes, mtllibs, int(nfaces))
    finally:
        lib.obj_free(handle)
