"""Native C++ meshing backend (ctypes; compiled on first use).

The reference's meshing stack is native C++ (Open3D, vdbfusion, PyMCubes,
IsoOctree); this package provides the framework's own native host backend
for isosurface extraction and TSDF integration, with transparent fallback
to the pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = Path(__file__).parent / "meshing.cpp"
    out = Path(__file__).parent / "libmeshing.so"
    try:
        if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", str(src), "-o",
                     str(out)],
                    check=True, capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                # no compiler / failed rebuild: a stale-but-working
                # prebuilt .so beats the numpy fallback
                if not out.exists():
                    raise
        lib = ctypes.CDLL(str(out))
        lib.mt_run.restype = ctypes.c_void_p
        lib.mt_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
        ]
        lib.mt_num_verts.restype = ctypes.c_int64
        lib.mt_num_verts.argtypes = [ctypes.c_void_p]
        lib.mt_num_faces.restype = ctypes.c_int64
        lib.mt_num_faces.argtypes = [ctypes.c_void_p]
        lib.mt_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def marching_tetrahedra_native(
    field: np.ndarray, level: float = 0.0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ marching tetrahedra; None when the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    f = np.ascontiguousarray(field, np.float32)
    nx, ny, nz = f.shape
    h = lib.mt_run(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
    )
    try:
        nv = lib.mt_num_verts(h)
        nf = lib.mt_num_faces(h)
        verts = np.empty((nv, 3), np.float32)
        faces = np.empty((nf, 3), np.int32)
        if nv:
            lib.mt_copy(
                h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        return verts, faces
    finally:
        lib.mt_free(h)
