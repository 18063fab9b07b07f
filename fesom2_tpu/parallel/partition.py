"""Offline domain decomposition of the node graph (METIS-role component).

Reference: ``src/fort_part.c:47-300`` (METIS glue, PART_WEIGHTED: node weight
= 1 + 3D level count for 2D+3D balance) and the hierarchical partitioning of
``fvom_init.F90:1471``.  The native implementation
(``native/partitioner.cpp``) does weighted recursive coordinate bisection on
the unit sphere with Kernighan-Lin boundary refinement; a pure-numpy fallback
(no refinement) keeps the module importable without the built library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..mesh import MeshTables

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfesom_native.so"))
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fesom_partition.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.fesom_edge_cut.restype = ctypes.c_int64
        lib.fesom_edge_cut.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def node_graph_csr(mesh: MeshTables):
    """Symmetric node adjacency (edges both ways) as CSR."""
    edges = np.asarray(mesh.edges)
    a = np.concatenate([edges[:, 0], edges[:, 1]])
    b = np.concatenate([edges[:, 1], edges[:, 0]])
    order = np.argsort(a, kind="stable")
    a, b = a[order], b[order]
    N = mesh.n_nodes
    counts = np.bincount(a, minlength=N)
    rowptr = np.zeros(N + 1, np.int64)
    np.cumsum(counts, out=rowptr[1:])
    return rowptr, b.astype(np.int32)


def node_weights(mesh: MeshTables):
    """2D+3D balance weights (ref fort_part.c:90-95, PART_WEIGHTED)."""
    return (1.0 + np.asarray(mesh.nlevels_node)).astype(np.float64)


def _sphere_xyz(mesh: MeshTables):
    lon = np.asarray(mesh.geo_coords)[:, 0]
    lat = np.asarray(mesh.geo_coords)[:, 1]
    return np.stack([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon),
                     np.sin(lat)], axis=1).copy()


def partition_nodes(mesh: MeshTables, nparts: int,
                    refine_sweeps: int = 8) -> np.ndarray:
    """Partition the node graph into nparts; returns part id per node [N]."""
    rowptr, colind = node_graph_csr(mesh)
    xyz = _sphere_xyz(mesh)
    w = node_weights(mesh)
    N = mesh.n_nodes
    lib = _load_native()
    if lib is not None:
        part = np.zeros(N, np.int32)
        lib.fesom_partition(
            N, rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            colind.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            np.ascontiguousarray(xyz).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nparts, refine_sweeps,
            part.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return part
    return _partition_numpy(xyz, w, nparts)


def edge_cut(mesh: MeshTables, part: np.ndarray) -> int:
    rowptr, colind = node_graph_csr(mesh)
    lib = _load_native()
    if lib is not None:
        return int(lib.fesom_edge_cut(
            mesh.n_nodes,
            rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            colind.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            np.asarray(part, np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int))))
    edges = np.asarray(mesh.edges)
    return int((part[edges[:, 0]] != part[edges[:, 1]]).sum())


def partition_nodes_hierarchical(mesh: MeshTables, n_part,
                                 refine_sweeps: int = 8):
    """Two-level (topology-aware) partition: first into n_part[0] groups
    (hosts / DCN domains), then each group into n_part[1] parts (chips on
    ICI).  Mirrors the reference's hierarchical METIS levels from the
    &machine namelist (n_levels/n_part, gen_modules_config.F90:96-98;
    partit recursion fort_part.c:137-300), so that the heavy halo traffic
    stays within a host's ICI domain and only coarse-group boundaries
    cross DCN.

    Returns (part [N] global part id = host*n_part[1]+chip, host [N])."""
    if isinstance(n_part, int):
        n_part = (1, n_part)
    hosts, chips = int(n_part[0]), int(n_part[1])
    top = partition_nodes(mesh, hosts, refine_sweeps)
    xyz = np.asarray(_sphere_xyz(mesh))
    w = np.asarray(node_weights(mesh))
    part = np.zeros(mesh.n_nodes, np.int32)
    for h in range(hosts):
        idx = np.nonzero(top == h)[0]
        if idx.size == 0:
            continue
        sub = _partition_numpy(xyz[idx], w[idx], chips)
        part[idx] = h * chips + sub
    return part, top


def _partition_numpy(xyz, w, nparts):
    """Fallback: plain weighted recursive coordinate bisection."""
    N = xyz.shape[0]
    part = np.zeros(N, np.int32)

    def bisect(idx, p0, np_):
        if np_ == 1:
            part[idx] = p0
            return
        np_left = np_ // 2
        frac = np_left / np_
        ext = xyz[idx].max(0) - xyz[idx].min(0)
        axis = int(np.argmax(ext))
        order = idx[np.argsort(xyz[idx, axis], kind="stable")]
        cw = np.cumsum(w[order])
        cut = int(np.searchsorted(cw, cw[-1] * frac)) + 1
        cut = max(1, min(cut, len(order) - 1))
        bisect(order[:cut], p0, np_left)
        bisect(order[cut:], p0 + np_left, np_ - np_left)

    bisect(np.arange(N), 0, nparts)
    return part
