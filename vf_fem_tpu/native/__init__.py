"""
ctypes loader for the native mesh kernels (``meshkit.cpp``).

Builds the shared library on first use with g++ (cached next to the
source); every entry point has a numpy fallback so the package works
without a toolchain.  Enable/disable with ``VF_FEM_TPU_NATIVE`` (default
on when a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from os import path
from typing import Optional

import numpy as np

_HERE = path.dirname(__file__)
_SRC = path.join(_HERE, "meshkit.cpp")
_LIB_PATH = path.join(_HERE, "_meshkit.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True,
            capture_output=True,
        )
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


def get_lib():
    """Return the loaded native library or None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("VF_FEM_TPU_NATIVE", "1") not in ("1", "true", "on"):
        return None
    if not path.exists(_LIB_PATH) or (
        path.getmtime(_LIB_PATH) < path.getmtime(_SRC)
    ):
        if _build() is None:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.build_facets.restype = ctypes.c_int64
    lib.build_facets.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sort_edge_chain.restype = None
    lib.sort_edge_chain.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def build_facets_native(cells: np.ndarray, dim: int):
    """
    Native facet extraction: returns (facets, facet_cell, facet_local,
    counts) or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    n_cells, nv = cells.shape
    max_f = n_cells * nv
    facets = np.empty((max_f, dim), dtype=np.int32)
    fcell = np.empty(max_f, dtype=np.int32)
    flocal = np.empty(max_f, dtype=np.int32)
    counts = np.empty(max_f, dtype=np.int32)
    n = lib.build_facets(
        _i32p(cells), n_cells, dim, _i32p(facets), _i32p(fcell),
        _i32p(flocal), _i32p(counts),
    )
    return (
        facets[:n].copy(),
        fcell[:n].copy(),
        flocal[:n].copy(),
        counts[:n].copy(),
    )


def sort_edge_chain_native(coords: np.ndarray, origin=None):
    """Native nearest-neighbour chain sort; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    n, gdim = coords.shape
    if origin is None:
        origin = np.zeros(gdim)
    origin = np.ascontiguousarray(origin, dtype=np.float64)[:gdim]
    perm = np.empty(n, dtype=np.int32)
    lib.sort_edge_chain(_f64p(coords), n, gdim, _f64p(origin), _i32p(perm))
    return perm


def _setup_tri_kernels(lib):
    if hasattr(lib, "_tri_setup"):
        return
    lib.points_in_polygon.restype = None
    lib.points_in_polygon.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dist_to_polyline.restype = None
    lib.dist_to_polyline.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib._tri_setup = True


def points_in_polygon_native(pts: np.ndarray, poly: np.ndarray):
    """Native winding-number point-in-polygon; None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "points_in_polygon"):
        return None
    _setup_tri_kernels(lib)
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    poly = np.ascontiguousarray(poly, dtype=np.float64)
    out = np.empty(pts.shape[0], dtype=np.uint8)
    lib.points_in_polygon(
        _f64p(pts), pts.shape[0], _f64p(poly), poly.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def dist_to_polyline_native(pts: np.ndarray, poly: np.ndarray):
    """Native min distance to a closed polygon boundary; None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dist_to_polyline"):
        return None
    _setup_tri_kernels(lib)
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    poly = np.ascontiguousarray(poly, dtype=np.float64)
    out = np.empty(pts.shape[0], dtype=np.float64)
    lib.dist_to_polyline(
        _f64p(pts), pts.shape[0], _f64p(poly), poly.shape[0], _f64p(out)
    )
    return out
