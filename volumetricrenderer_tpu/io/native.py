"""ctypes bindings for the native ingestion core (native/ingest.cpp).

The reference's asset pipeline (FBX import, mesh processing, baked occlusion)
is native C++ inside Unity; this module gives the framework's ingestion bake
the same treatment. The C++ core mirrors models/voxelize.py bit-exactly
(tests assert equality, not tolerance) and is ~10-100x faster on real
meshes; models/voxelize.py remains the reference implementation and the
automatic fallback when no compiler is available.

The shared library builds on demand with g++ (no pybind11 in this
environment — plain C ABI + ctypes) and is cached next to the source keyed
by a source hash, so a source edit rebuilds and a stale cache never loads.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "ingest.cpp")
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen the ingestion core; None on failure."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        # cache key: source + machine (the .so is arch-specific)
        tag = hashlib.sha256(src + os.uname().machine.encode()) \
            .hexdigest()[:16]
        cache_dir = os.path.join(os.path.dirname(_SRC), ".build")
        os.makedirs(cache_dir, exist_ok=True)
        so = os.path.join(cache_dir, f"libvringest-{tag}.so")
        if not os.path.exists(so):
            # build to a temp name + rename: atomic under concurrent tests
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir)
            os.close(fd)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.vr_voxel_grid.argtypes = [f64p, ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_double, i32p, f32p, f32p]
        lib.vr_voxel_grid.restype = None
        lib.vr_voxelize.argtypes = [f64p, ctypes.c_int64, i32p,
                                    ctypes.c_int64, ctypes.c_int,
                                    ctypes.c_double, i32p, u8p]
        lib.vr_voxelize.restype = None
        lib.vr_greedy_boxes.argtypes = [u8p, i32p, f32p, f32p,
                                        ctypes.c_int32, ctypes.c_double,
                                        ctypes.c_double, f32p]
        lib.vr_greedy_boxes.restype = ctypes.c_int32
        _LIB = lib
    except Exception:  # noqa: BLE001 — no compiler / bad env: numpy fallback
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def voxelize_triangles(verts: np.ndarray, tris: np.ndarray, res: int = 24,
                       pad: float = 0.02):
    """Native voxelize_triangles (same contract as models/voxelize.py)."""
    lib = _build_and_load()
    if lib is None:
        from volumetricrenderer_tpu.models import voxelize
        return voxelize.voxelize_triangles(verts, tris, res, pad)
    # float64, matching models/voxelize.py's np.asarray(verts, np.float64) —
    # the AABB / sample positions must come from the caller's full-precision
    # values or native and fallback bakes diverge near voxel boundaries
    v = np.ascontiguousarray(np.asarray(verts, np.float64))
    t = np.ascontiguousarray(np.asarray(tris, np.int32))
    dims = np.zeros(3, np.int32)
    origin = np.zeros(3, np.float32)
    voxel = np.zeros(3, np.float32)
    lib.vr_voxel_grid(v, v.shape[0], int(res), float(pad), dims, origin,
                      voxel)
    occ = np.zeros(int(dims[0]) * int(dims[1]) * int(dims[2]), np.uint8)
    lib.vr_voxelize(v, v.shape[0], t, t.shape[0], int(res), float(pad),
                    dims, occ)
    return (occ.reshape(tuple(dims)).astype(bool), origin, voxel)


def boxes_from_occupancy(occ: np.ndarray, origin: np.ndarray,
                         voxel: np.ndarray, max_boxes: int = 8,
                         fill_thresh: float = 0.35,
                         coverage: float = 0.92) -> List[Tuple]:
    """Native greedy box cover (same contract as models/voxelize.py)."""
    lib = _build_and_load()
    if lib is None:
        from volumetricrenderer_tpu.models import voxelize
        return voxelize.boxes_from_occupancy(occ, origin, voxel, max_boxes,
                                             fill_thresh, coverage)
    o = np.ascontiguousarray(np.asarray(occ, np.uint8))
    dims = np.asarray(o.shape, np.int32)
    out = np.zeros(max_boxes * 7, np.float32)
    n = lib.vr_greedy_boxes(o.reshape(-1), dims,
                            np.ascontiguousarray(origin, dtype=np.float32),
                            np.ascontiguousarray(voxel, dtype=np.float32),
                            int(max_boxes), float(fill_thresh),
                            float(coverage), out)
    return [(out[i * 7:i * 7 + 3].copy(), out[i * 7 + 3:i * 7 + 6].copy(),
             float(out[i * 7 + 6])) for i in range(n)]


def mesh_to_boxes(verts: np.ndarray, tris: np.ndarray, res: int = 20,
                  max_boxes: int = 8, fill_thresh: float = 0.35):
    """Native triangles -> occupancy -> world boxes (voxelize.mesh_to_boxes)."""
    occ, origin, vox = voxelize_triangles(verts, tris, res)
    return boxes_from_occupancy(occ, origin, vox, max_boxes=max_boxes,
                                fill_thresh=fill_thresh)
