"""Uniform 4-way mesh refinement (each triangle split at edge midpoints).

Scales the shipped test meshes up to CORE2-class sizes for performance
work without needing the (not shipped) CORE2 grid: two refinements of the
pi mesh give ~49k surface nodes, three ~195k (CORE2 is ~127k,
``BASELINE.md``).  Bathymetry and level counts are interpolated
conservatively (midpoint level count = min of the endpoints, matching
FESOM's rule that an element's levels are the min over its vertices,
``oce_mesh.F90`` find_levels).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .io import RawMesh


def _mid_lonlat(a, b, cyclic_rad):
    """Midpoint of two lon/lat pairs [.,2] (radians), wraparound-safe."""
    dlon = np.remainder(b[:, 0] - a[:, 0] + 0.5 * cyclic_rad, cyclic_rad) \
        - 0.5 * cyclic_rad
    lon = a[:, 0] + 0.5 * dlon
    lat = 0.5 * (a[:, 1] + b[:, 1])
    return np.stack([lon, lat], 1)


def subdivide_raw(raw: RawMesh, cyclic_length_deg: float = 360.0) -> RawMesh:
    """One 4-way refinement of a RawMesh (host-side numpy)."""
    coords = raw.coords
    en = raw.elem_nodes
    N = raw.n_nodes
    cyc = np.deg2rad(cyclic_length_deg)

    # unique edges from the element list
    pairs = np.concatenate([en[:, [0, 1]], en[:, [1, 2]], en[:, [2, 0]]])
    pairs = np.sort(pairs, axis=1)
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    Ed = uniq.shape[0]
    mid_id = N + np.arange(Ed)

    mid = _mid_lonlat(coords[uniq[:, 0]], coords[uniq[:, 1]], cyc)
    new_coords = np.concatenate([coords, mid])
    mid_deg = _mid_lonlat(np.deg2rad(raw.coords_deg[uniq[:, 0]]),
                          np.deg2rad(raw.coords_deg[uniq[:, 1]]), cyc)
    new_coords_deg = np.concatenate([raw.coords_deg, np.rad2deg(mid_deg)])

    # boundary flag: a midpoint is boundary only if its edge is a boundary
    # edge (appears in exactly one element)
    counts = np.bincount(inv, minlength=Ed)
    on_boundary = counts == 1
    bflag = raw.node_flag[uniq[:, 0]] * raw.node_flag[uniq[:, 1]]
    new_flag = np.concatenate([raw.node_flag,
                               np.where(on_boundary, np.maximum(bflag, 1),
                                        0).astype(raw.node_flag.dtype)])

    # children: corner triangles + central
    E = en.shape[0]
    m01 = mid_id[inv[0 * E:1 * E]]
    m12 = mid_id[inv[1 * E:2 * E]]
    m20 = mid_id[inv[2 * E:3 * E]]
    new_en = np.concatenate([
        np.stack([en[:, 0], m01, m20], 1),
        np.stack([en[:, 1], m12, m01], 1),
        np.stack([en[:, 2], m20, m12], 1),
        np.stack([m01, m12, m20], 1)])

    depth = raw.depth
    new_depth = None
    if depth is not None:
        new_depth = np.concatenate(
            [depth, 0.5 * (depth[uniq[:, 0]] + depth[uniq[:, 1]])])

    nlev_n = raw.nlevels_node
    new_nlev_n = new_nlev_e = None
    if nlev_n is not None:
        mid_lev = np.minimum(nlev_n[uniq[:, 0]], nlev_n[uniq[:, 1]])
        new_nlev_n = np.concatenate([nlev_n, mid_lev])
        new_nlev_e = new_nlev_n[new_en].min(1)

    cav = raw.cavity_depth
    new_cav = None
    if cav is not None:
        new_cav = np.concatenate(
            [cav, np.where((cav[uniq[:, 0]] < 0) & (cav[uniq[:, 1]] < 0),
                           0.5 * (cav[uniq[:, 0]] + cav[uniq[:, 1]]), 0.0)])

    return dataclasses.replace(
        raw, coords=new_coords, coords_deg=new_coords_deg,
        node_flag=new_flag, elem_nodes=new_en, depth=new_depth,
        nlevels_node=new_nlev_n, nlevels_elem=new_nlev_e,
        edges=None, edge_tri=None, edge2D_in=None, cavity_depth=new_cav,
        path=raw.path + "+refined")


def refined_mesh(path: str, n_refine: int = 1, *, force_rotation=False,
                 cyclic_length_deg: float = 360.0, dtype=None, **kw):
    """Read a mesh directory, refine n times, and build MeshTables."""
    import jax.numpy as jnp
    from .io import read_raw_mesh
    from .tables import build_mesh_from_raw
    raw = read_raw_mesh(path, force_rotation=force_rotation,
                        cyclic_length_deg=cyclic_length_deg)
    for _ in range(n_refine):
        raw = subdivide_raw(raw, cyclic_length_deg)
    return build_mesh_from_raw(raw, force_rotation=force_rotation,
                               cyclic_length_deg=cyclic_length_deg,
                               use_shipped_edges=False,
                               dtype=dtype or jnp.float64, **kw)
