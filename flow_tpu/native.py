# ctypes bindings for the native mesh-topology engine (native/meshkit.cpp).
#
# Auto-builds libmeshkit.so on first use if a compiler is available; every
# entry point has a numpy fallback, so the framework works without the
# native library (it is a setup-time accelerator, not a correctness
# dependency — outputs are bit-identical to the numpy path).
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["build_edges", "rcm_order", "available"]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    so = os.path.join(root, "libmeshkit.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", root, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    lib.meshkit_build_edges.restype = ctypes.c_int64
    lib.meshkit_build_edges.argtypes = [i32p, ctypes.c_int64, i32p, i32p, i8p]
    lib.meshkit_rcm.restype = None
    lib.meshkit_rcm.argtypes = [ctypes.c_int64, i32p, ctypes.c_int64, i32p]
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def build_edges(cells: np.ndarray):
    """(edges [ne,2], cell_edges [nc,3], boundary_edge_ids [nb]) for CCW
    triangle cells [nc,3]. Native when possible, numpy otherwise; outputs
    identical either way (edges sorted lexicographically)."""
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc = len(cells)
    lib = _load()
    if lib is not None and nc > 0:
        edges_buf = np.empty((3 * nc, 2), dtype=np.int32)
        cell_edges = np.empty((nc, 3), dtype=np.int32)
        bnd = np.empty(3 * nc, dtype=np.int8)
        ne = lib.meshkit_build_edges(cells, nc, edges_buf, cell_edges, bnd)
        edges = edges_buf[:ne].copy()
        bnd_ids = np.where(bnd[:ne] == 1)[0].astype(np.int32)
        return edges, cell_edges, bnd_ids

    # numpy fallback (the original Mesh.__init__ path)
    e_all = np.concatenate(
        [cells[:, [1, 2]], cells[:, [2, 0]], cells[:, [0, 1]]], axis=0
    )
    e_sorted = np.sort(e_all, axis=1)
    edges, inverse, counts = np.unique(
        e_sorted, axis=0, return_inverse=True, return_counts=True
    )
    cell_edges = inverse.reshape(3, nc).T.astype(np.int32)
    bnd_ids = np.where(counts == 1)[0].astype(np.int32)
    return edges.astype(np.int32), cell_edges, bnd_ids


def rcm_order(n_vertices: int, edges: np.ndarray):
    """Reverse Cuthill-McKee permutation (perm[i] = old id at new slot i):
    bandwidth-reducing dof ordering that improves gather locality of the
    assembled operators on TPU."""
    edges = np.ascontiguousarray(edges, dtype=np.int32)
    lib = _load()
    if lib is not None:
        perm = np.empty(n_vertices, dtype=np.int32)
        lib.meshkit_rcm(n_vertices, edges, len(edges), perm)
        return perm
    # scipy fallback
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csg

    g = sp.coo_matrix(
        (np.ones(len(edges)), (edges[:, 0], edges[:, 1])),
        shape=(n_vertices, n_vertices),
    )
    return np.asarray(csg.reverse_cuthill_mckee(g.tocsr(), symmetric_mode=True))
