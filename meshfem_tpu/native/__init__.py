"""Native C++ host-core bindings (ctypes; numpy fallbacks when the
toolchain is unavailable).  See hostcore.cpp for what lives here and why."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libhostcore.so"
_SRC = _DIR / "hostcore.cpp"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("MESHFEM_TPU_NO_NATIVE") == "1":
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.match_faces.restype = ctypes.c_int
    lib.match_faces.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.unique_edges.restype = ctypes.c_int64
    lib.unique_edges.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    lib.build_scatter_plan.restype = None
    lib.build_scatter_plan.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.morton_codes.restype = None
    lib.morton_codes.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p]
    lib.triangulate_ruppert.restype = ctypes.c_int
    lib.triangulate_ruppert.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,        # pts
        ctypes.c_void_p, ctypes.c_int64,        # segs
        ctypes.c_void_p, ctypes.c_int64,        # holes
        ctypes.c_double, ctypes.c_double,       # min_angle, max_area
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def match_faces(face_verts: np.ndarray):
    """[H, k] -> opp [H] (-1 = boundary); raises on non-manifold.
    Returns None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    fv = np.ascontiguousarray(face_verts, dtype=np.int64)
    H, k = fv.shape
    opp = np.empty(H, dtype=np.int64)
    rc = lib.match_faces(_ptr(fv), H, k, _ptr(opp))
    if rc != 0:
        raise ValueError("non-manifold: face shared by > 2 elements")
    return opp


def unique_edges(pairs: np.ndarray):
    """[M, 2] -> (edge_id [M], unique_pairs [nu, 2]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pairs, dtype=np.int64)
    M = len(p)
    edge_id = np.empty(M, dtype=np.int64)
    buf = np.empty((M, 2), dtype=np.int64)
    nu = lib.unique_edges(_ptr(p), M, _ptr(edge_id), _ptr(buf))
    return edge_id, buf[:nu].copy()


def build_scatter_plan(ids: np.ndarray, num_segments: int, g1: int = 8):
    """-> (gidx1 [P1] int32, gidx2 [N*g2] int32, g2) or None."""
    lib = get_lib()
    if lib is None:
        return None
    ids64 = np.ascontiguousarray(ids, dtype=np.int64)
    sizes = np.zeros(3, dtype=np.int64)
    lib.build_scatter_plan(_ptr(ids64), len(ids64), num_segments, g1,
                           _ptr(sizes), None, None)
    P1, g2, NG = (int(x) for x in sizes)
    gidx1 = np.empty(P1, dtype=np.int32)
    gidx2 = np.empty(num_segments * g2, dtype=np.int32)
    lib.build_scatter_plan(_ptr(ids64), len(ids64), num_segments, g1,
                           _ptr(sizes), _ptr(gidx1), _ptr(gidx2))
    return gidx1, gidx2, g2


def triangulate_ruppert(points, segments, holes=None,
                        min_angle: float = 20.0, max_area: float = 0.0):
    """Quality constrained Delaunay triangulation with Ruppert refinement
    (native; parity with Triangle's quality/area modes, Triangulate.h:83).
    Returns (V [n, 2], F [m, 3]) or None if the library is unavailable.

    Hole semantics match Triangle's: enclosed regions are KEPT unless a
    seed point inside them is passed via ``holes`` (regions are flood
    fills bounded by constrained segments, seeded from the exterior and
    the hole points)."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)[:, :2]
    segs = np.ascontiguousarray(segments, dtype=np.int64)
    hl = np.ascontiguousarray(
        holes if holes is not None and len(holes) else np.zeros((0, 2)),
        dtype=np.float64)
    cap_p, cap_t = 4096, 8192
    for _ in range(8):
        out_p = np.empty((cap_p, 2), dtype=np.float64)
        out_t = np.empty((cap_t, 3), dtype=np.int64)
        n_p = ctypes.c_int64()
        n_t = ctypes.c_int64()
        rc = lib.triangulate_ruppert(
            _ptr(pts), len(pts), _ptr(segs), len(segs), _ptr(hl), len(hl),
            float(min_angle), float(max_area),
            _ptr(out_p), cap_p, ctypes.byref(n_p),
            _ptr(out_t), cap_t, ctypes.byref(n_t))
        if rc == 0:
            return out_p[:n_p.value].copy(), out_t[:n_t.value].copy()
        cap_p = max(cap_p * 2, int(n_p.value) + 1)
        cap_t = max(cap_t * 2, int(n_t.value) + 1)
    raise RuntimeError("triangulate_ruppert: output capacity not converging")
