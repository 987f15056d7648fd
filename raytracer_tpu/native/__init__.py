"""ctypes bindings for the native scene-compile runtime (mesh.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every entry point has a pure-Python fallback so the framework runs without a
compiler toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_mesh_native.so"
_SRC = _DIR / "mesh.cpp"

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.obj_count.restype = ctypes.c_int32
        lib.obj_count.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.obj_parse.restype = ctypes.c_int32
        lib.obj_parse.argtypes = [ctypes.c_char_p,
                                  np.ctypeslib.ndpointer(np.float32),
                                  np.ctypeslib.ndpointer(np.int64)]
        lib.obj_count_full.restype = ctypes.c_int32
        lib.obj_count_full.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.obj_parse_full.restype = ctypes.c_int32
        lib.obj_parse_full.argtypes = [ctypes.c_char_p,
                                       np.ctypeslib.ndpointer(np.float32),
                                       np.ctypeslib.ndpointer(np.float32),
                                       np.ctypeslib.ndpointer(np.float32),
                                       np.ctypeslib.ndpointer(np.int64),
                                       np.ctypeslib.ndpointer(np.int64),
                                       np.ctypeslib.ndpointer(np.int64)]
        lib.bvh_build.restype = ctypes.c_int32
        lib.bvh_build.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                  ctypes.c_int64,
                                  np.ctypeslib.ndpointer(np.float32),
                                  np.ctypeslib.ndpointer(np.float32),
                                  np.ctypeslib.ndpointer(np.int32),
                                  np.ctypeslib.ndpointer(np.int32),
                                  np.ctypeslib.ndpointer(np.int32),
                                  np.ctypeslib.ndpointer(np.int32),
                                  np.ctypeslib.ndpointer(np.int32)]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available():
    return _load() is not None


def parse_obj(path):
    """Parse v/f records of an OBJ file -> (verts (V,3) f32, faces (F,3) i64).

    Native fast path; falls back to the Python parser in geometry/primitive.py.
    """
    lib = _load()
    if lib is None:
        from ..geometry.primitive import _parse_obj
        verts, faces = _parse_obj(path)
        return (np.asarray(verts, np.float32).reshape(-1, 3),
                np.asarray(faces, np.int64).reshape(-1, 3))
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    if lib.obj_count(str(path).encode(), ctypes.byref(nv), ctypes.byref(nt)) != 0:
        raise FileNotFoundError(path)
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((max(nt.value, 1), 3), np.int64)
    if lib.obj_parse(str(path).encode(), verts, faces) != 0:
        raise IOError(f"failed to parse {path}")
    return verts, faces[:nt.value]


def parse_obj_full(path):
    """Parse v/vt/vn/f records of an OBJ file.

    Returns (verts (V,3) f32, uvs (VT,2) f32, norms (VN,3) f32,
    faces (F,3) i64, face_uv (F,3) i64, face_n (F,3) i64); face_uv/face_n
    hold -1 where a face corner carries no vt/vn index.  Native fast path
    with a pure-Python fallback (geometry/primitive.py).
    """
    lib = _load()
    if lib is None:
        from ..geometry.primitive import _parse_obj_full
        return _parse_obj_full(path)
    nv = ctypes.c_int64()
    nvt = ctypes.c_int64()
    nvn = ctypes.c_int64()
    nt = ctypes.c_int64()
    if lib.obj_count_full(str(path).encode(), ctypes.byref(nv),
                          ctypes.byref(nvt), ctypes.byref(nvn),
                          ctypes.byref(nt)) != 0:
        raise FileNotFoundError(path)
    verts = np.empty((nv.value, 3), np.float32)
    uvs = np.empty((max(nvt.value, 1), 2), np.float32)
    norms = np.empty((max(nvn.value, 1), 3), np.float32)
    faces = np.empty((max(nt.value, 1), 3), np.int64)
    face_uv = np.empty((max(nt.value, 1), 3), np.int64)
    face_n = np.empty((max(nt.value, 1), 3), np.int64)
    if lib.obj_parse_full(str(path).encode(), verts, uvs, norms, faces,
                          face_uv, face_n) != 0:
        raise IOError(f"failed to parse {path}")
    return (verts, uvs[:nvt.value], norms[:nvn.value], faces[:nt.value],
            face_uv[:nt.value], face_n[:nt.value])


def build_bvh(tri_verts):
    """Binned-SAH BVH over (N, 3, 3) triangle vertices.

    Returns dict of flat arrays: bbox_lo/bbox_hi (M,3), left/right/first/count
    (M,), order (N,).  Internal nodes have count == 0; leaves reference
    order[first:first+count].
    """
    tv = np.ascontiguousarray(tri_verts, np.float32)
    n = tv.shape[0]
    if n == 0:
        raise ValueError("empty mesh")
    lib = _load()
    if lib is None:
        return _py_build_bvh(tv)
    m = 2 * n
    lo = np.empty((m, 3), np.float32)
    hi = np.empty((m, 3), np.float32)
    left = np.empty((m,), np.int32)
    right = np.empty((m,), np.int32)
    first = np.empty((m,), np.int32)
    count = np.empty((m,), np.int32)
    order = np.empty((n,), np.int32)
    wrote = lib.bvh_build(tv.reshape(-1), n, lo, hi, left, right, first, count, order)
    if wrote < 0:
        raise RuntimeError("bvh_build failed")
    return dict(bbox_lo=lo[:wrote], bbox_hi=hi[:wrote], left=left[:wrote],
                right=right[:wrote], first=first[:wrote], count=count[:wrote],
                order=order)


def _py_build_bvh(tv, leaf_size=4):
    """Median-split fallback BVH (numpy)."""
    n = tv.shape[0]
    boxes_lo = tv.min(axis=1)
    boxes_hi = tv.max(axis=1)
    cent = tv.mean(axis=1)
    order = np.arange(n, dtype=np.int32)
    nodes = []

    def rec(ids):
        idx = len(nodes)
        nodes.append(None)
        lo = boxes_lo[ids].min(0)
        hi = boxes_hi[ids].max(0)
        if len(ids) <= leaf_size:
            start = rec.cursor
            order[start:start + len(ids)] = ids
            rec.cursor += len(ids)
            nodes[idx] = (lo, hi, -1, -1, start, len(ids))
            return idx
        axis = int(np.argmax(cent[ids].max(0) - cent[ids].min(0)))
        mid = len(ids) // 2
        part = ids[np.argsort(cent[ids, axis], kind="stable")]
        l = rec(part[:mid])
        r = rec(part[mid:])
        nodes[idx] = (lo, hi, l, r, -1, 0)
        return idx

    rec.cursor = 0
    rec(np.arange(n, dtype=np.int32))
    lo = np.stack([nd[0] for nd in nodes]).astype(np.float32)
    hi = np.stack([nd[1] for nd in nodes]).astype(np.float32)
    return dict(bbox_lo=lo, bbox_hi=hi,
                left=np.asarray([nd[2] for nd in nodes], np.int32),
                right=np.asarray([nd[3] for nd in nodes], np.int32),
                first=np.asarray([nd[4] for nd in nodes], np.int32),
                count=np.asarray([nd[5] for nd in nodes], np.int32),
                order=order)
