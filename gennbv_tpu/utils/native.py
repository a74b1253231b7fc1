"""ctypes binding for the native C++ mesh voxelizer (native/voxelizer.cpp).

Builds the shared library on first use (g++ -O3 -shared -fPIC) and caches it
next to the source.  Used by the dataset conversion pipeline
(tools/convert_dataset.py) — never on the TPU training hot path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "voxelizer.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libvoxelizer.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
    )


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.voxelize_obj.restype = ctypes.c_int
    lib.voxelize_obj.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.voxelizer_abi_version.restype = ctypes.c_int
    _lib = lib
    return lib


_MESHER_SRC = os.path.join(_NATIVE_DIR, "mesher.cpp")
_MESHER_LIB = os.path.join(_NATIVE_DIR, "libmesher.so")
_mesher: Optional[ctypes.CDLL] = None


def load_mesher() -> ctypes.CDLL:
    global _mesher
    if _mesher is not None:
        return _mesher
    if (not os.path.exists(_MESHER_LIB)) or (
        os.path.getmtime(_MESHER_LIB) < os.path.getmtime(_MESHER_SRC)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _MESHER_LIB, _MESHER_SRC],
            check=True,
        )
    lib = ctypes.CDLL(_MESHER_LIB)
    lib.mesh_voxels_to_obj.restype = ctypes.c_int64
    lib.mesh_voxels_to_obj.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_char_p,
    ]
    _mesher = lib
    return lib


def mesh_voxels_to_obj(grid: np.ndarray, origin, vsize, path: str) -> int:
    """Write a [G,G,G] {0,1} voxel grid as a quad-mesh OBJ (native/mesher.cpp
    — the export counterpart of the voxelizer).  Returns the quad count."""
    lib = load_mesher()
    g = np.ascontiguousarray(np.asarray(grid) > 0.5).astype(np.uint8)
    assert g.ndim == 3 and g.shape[0] == g.shape[1] == g.shape[2], g.shape
    n = lib.mesh_voxels_to_obj(
        g.reshape(-1), np.int32(g.shape[0]),
        np.asarray(origin, np.float64).copy(),
        np.asarray(vsize, np.float64).copy(),
        path.encode(),
    )
    if n < 0:
        raise RuntimeError(f"mesh_voxels_to_obj failed writing {path}")
    return int(n)


def voxelize_obj(
    path: str,
    res: int,
    scale: float = 1.0,
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    box: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    solid: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Voxelize an OBJ mesh.  Returns (occ [res,res,res] uint8, box_lo, box_hi)."""
    lib = load_library()
    if box is None:
        box_lo = np.zeros(3, np.float64)
        box_hi = np.zeros(3, np.float64)
    else:
        box_lo = np.asarray(box[0], np.float64).copy()
        box_hi = np.asarray(box[1], np.float64).copy()
    occ = np.zeros(res ** 3, np.uint8)
    off = np.asarray(offset, np.float64)
    rc = lib.voxelize_obj(
        path.encode(), res, float(scale), off, box_lo, box_hi,
        1 if solid else 0, occ,
    )
    if rc != 0:
        raise RuntimeError(f"voxelize_obj failed with code {rc} for {path}")
    return occ.reshape(res, res, res), box_lo.astype(np.float32), box_hi.astype(np.float32)
