"""MeshTables: static, padded-dense mesh geometry for the TPU compute path.

This is the TPU-native replacement for the reference ``t_mesh`` derived type
(``src/MOD_MESH.F90:19-95``) and its derivation routines
(``src/oce_mesh.F90``: load_edges :1419, find_neighbors :1650, mesh_areas :1840,
mesh_auxiliary_arrays :2097; level derivation ``src/fvom_init.F90:657-871``).

Design: instead of ragged Fortran loops bounded by per-entity level counts, all
vertical structure is expressed as dense ``[nl(-1), ·]`` arrays plus boolean
masks; all adjacency is expressed as padded index arrays (pad value -1, always
accompanied by a mask) so every kernel is a fixed-shape gather/compute/scatter.

Array layout convention: level axis FIRST, horizontal entity axis LAST
(``[nl, N]``), so per-column vertical solves are a `lax.scan` over the leading
axis with fully vectorised minor axes.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import rad, r_earth, omega, pi
from .io import RawMesh, read_raw_mesh
from .rotation import rotation_matrix, r2g


def _trim_cyclic(x: np.ndarray, cl: float) -> np.ndarray:
    """Wrap coordinate differences into (-cl/2, cl/2] (ref oce_mesh trim_cyclic)."""
    x = np.where(x > cl / 2.0, x - cl, x)
    x = np.where(x < -cl / 2.0, x + cl, x)
    return x


# --------------------------------------------------------------------------
# Edge construction (replaces shipped edges.out / partitioner edge builder)
# --------------------------------------------------------------------------
def build_edges(elem_nodes: np.ndarray, coords: np.ndarray, cyclic_len: float):
    """Construct the edge list and edge->triangle adjacency from triangles.

    Convention (ref ``fvom_init.F90`` find_edges_ini and MOD_MESH comments):
    edge_tri[:,0] is the triangle to the LEFT of the direction node0->node1;
    internal edges come first, boundary edges (single triangle) last.
    Returns (edges[Ed,2], edge_tri[Ed,2] with -1 for missing, n_internal).
    Fully vectorised (runs in O(E log E)).
    """
    E = elem_nodes.shape[0]
    N = int(elem_nodes.max()) + 1
    # orientation sign of each triangle (positive = counterclockwise)
    n0, n1, n2 = elem_nodes[:, 0], elem_nodes[:, 1], elem_nodes[:, 2]
    ax = _trim_cyclic(coords[n1, 0] - coords[n0, 0], cyclic_len)
    bx = _trim_cyclic(coords[n2, 0] - coords[n0, 0], cyclic_len)
    ay = coords[n1, 1] - coords[n0, 1]
    by = coords[n2, 1] - coords[n0, 1]
    ccw = (ax * by - bx * ay) > 0  # [E]

    # all 3E directed boundary-traversal pairs (a->b with interior on the left
    # for CCW triangles)
    a = np.concatenate([n0, n1, n2])
    b = np.concatenate([n1, n2, n0])
    tri = np.tile(np.arange(E), 3)
    ccw3 = np.tile(ccw, 3)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    key = lo.astype(np.int64) * N + hi          # canonical undirected key
    # triangle is left of lo->hi iff (a<b) agrees with CCW orientation
    fwd = (a < b) == ccw3
    ukey, inv = np.unique(key, return_inverse=True)
    Ed = ukey.shape[0]
    etri = np.full((Ed, 2), -1, np.int64)
    etri[inv[fwd], 0] = tri[fwd]
    etri[inv[~fwd], 1] = tri[~fwd]
    edges = np.stack([ukey // N, ukey % N], axis=1)
    # flip direction where the left triangle is missing
    flip = etri[:, 0] == -1
    edges[flip] = edges[flip][:, ::-1]
    etri[flip] = etri[flip][:, ::-1]
    internal = etri[:, 1] >= 0
    order = np.concatenate([np.nonzero(internal)[0], np.nonzero(~internal)[0]])
    return edges[order], etri[order], int(internal.sum())


def derive_levels(raw: RawMesh, elem_neighbors: np.ndarray, thers_lev: int = 5,
                  which_depth_n2e: str = "mean"):
    """Derive per-element/per-node level counts from node depths.

    Mirrors the partitioner logic ``fvom_init.F90:657-871``: element depth from
    its vertices (mean by default), first mid-depth Z below it gives the level
    count, minimum `thers_lev`, then iterative isolated-cell elimination, and
    node levels = max over containing elements.
    """
    nl = raw.nl
    zbar = raw.zbar
    Z = 0.5 * (zbar[:-1] + zbar[1:])
    depth = raw.depth
    if depth is None:
        # flat-bottom toy channel: all columns full depth
        nle = np.full(raw.n_elems, nl, np.int64)
    else:
        depth = np.minimum(depth, zbar[thers_lev - 1])
        nodes = raw.elem_nodes
        if which_depth_n2e == "min":
            dmean = depth[nodes].max(axis=1)
        elif which_depth_n2e == "max":
            dmean = depth[nodes].min(axis=1)
        else:
            dmean = depth[nodes].mean(axis=1)
        # first nz (1-based) with Z[nz-1] < dmean
        below = Z[None, :] < dmean[:, None]        # [E, nl-1]
        has = below.any(axis=1)
        first = np.argmax(below, axis=1) + 1
        nle = np.where(has, first, np.where(dmean < 0, nl, thers_lev))
        nle = np.maximum(nle, thers_lev)
        # isolated-cell elimination
        for nz in range(thers_lev + 1, nl + 1):
            for _ in range(1000):
                open_mask = nle >= nz
                nb = elem_neighbors  # [E,3]
                nb_open = (nb >= 0) & open_mask[np.clip(nb, 0, None)]
                cnt = nb_open.sum(axis=1)
                bad = open_mask & (cnt < 2)
                if not bad.any():
                    break
                if nz - 1 < thers_lev:
                    for e in np.nonzero(bad)[0]:
                        for j in range(3):
                            if nb[e, j] >= 0:
                                nle[nb[e, j]] = max(nle[nb[e, j]], nz)
                else:
                    nle[bad] = nz - 1
    nln = np.zeros(raw.n_nodes, np.int64)
    for j in range(3):
        np.maximum.at(nln, raw.elem_nodes[:, j], nle)
    return nle.astype(np.int64), nln


def derive_ulevels_cavity(cavity_depth: np.ndarray, elem_nodes: np.ndarray,
                          elem_neighbors: np.ndarray, nle: np.ndarray,
                          zbar: np.ndarray, which_depth_n2e: str = "mean"):
    """Per-element/per-node level index of the ice-shelf (cavity)-ocean
    boundary, 1-based like the reference (1 = open ocean).

    Mirrors the partitioner's ``find_levels_cavity`` (fvom_init.F90:878-1075):
    element draft from its vertices, first mid-depth Z below the draft (or
    at most 3 layers left), then iterative elimination of cells isolated
    within a layer, and node ulevels = min over containing elements.
    """
    nl = zbar.shape[0]
    Z = 0.5 * (zbar[:-1] + zbar[1:])
    E = elem_nodes.shape[0]
    cd = cavity_depth[elem_nodes]
    if which_depth_n2e == "min":
        dmean = cd.max(axis=1)
    elif which_depth_n2e == "max":
        dmean = cd.min(axis=1)
    else:
        dmean = cd.mean(axis=1)
    # first nz (1-based) with Z(nz) < dmean or fewer than 3 layers left
    # (ref :925-931); for dmean >= 0 this fires at nz=1 (open ocean)
    k1 = np.arange(1, nl)                            # 1-based layer index
    cond = (Z[None, :] < dmean[:, None]) | ((nle[:, None] - k1[None, :]) <= 3)
    ule = np.argmax(cond, axis=1) + 1

    # eliminate cells isolated within a layer (ref :957-1040): a cell open
    # at layer nz needs >=2 open neighbors; deepen its cavity boundary when
    # >=3 bottom layers remain, otherwise raise the closest neighbor
    elemreduce = np.zeros(E, bool)
    elemfix = np.zeros(E, bool)

    def _n_isolated(u):
        # open (elem, layer) cells with <2 open neighbors, among elements
        # that have >=2 neighbors at all (coastal corners are exempt)
        has2 = (elem_neighbors >= 0).sum(axis=1) >= 2
        n_bad = 0
        for nz in range(1, int(u.max()) + 1):
            act = (u <= nz) & (nz < nle)
            nb_open = (elem_neighbors >= 0) & act[np.clip(elem_neighbors,
                                                          0, None)]
            n_bad += int((act & has2 & (nb_open.sum(axis=1) < 2)).sum())
        return n_bad

    for _outer in range(12):
        elemreduce[:] = False
        for nz in range(1, int(ule.max()) + 1):
            for _ in range(1000):
                active = (ule <= nz) & (nz < nle)
                nb_open = (elem_neighbors >= 0) & \
                    active[np.clip(elem_neighbors, 0, None)]
                cnt = nb_open.sum(axis=1)
                bad = active & (cnt < 2)
                if not bad.any():
                    break
                deepen = bad & ((nle - (nz + 1)) >= 3) & ~elemreduce & ~elemfix
                ule = np.where(deepen, nz + 1, ule)
                for e in np.nonzero(bad & ~deepen)[0]:
                    cands = [(ule[j] - nz, j) for j in elem_neighbors[e]
                             if j >= 0 and ule[j] - nz > 0]
                    if cands:
                        j = min(cands)[1]
                        ule[j] = max(nz - 1, 1)
                        elemreduce[j] = True
        viol = ule > nle - 1
        if viol.any():
            elemfix |= viol
            ule = np.minimum(ule, np.maximum(nle - 3, 1))
            continue
        # re-sweep while neighbor-raising re-opened isolation at shallower
        # layers (the reference leaves these; we converge them out)
        if _n_isolated(ule) == 0:
            break

    uln = np.full(cavity_depth.shape[0], nl, np.int64)
    for j in range(3):
        np.minimum.at(uln, elem_nodes[:, j], ule)
    return ule.astype(np.int64), uln.astype(np.int64)


# --------------------------------------------------------------------------
# MeshTables
# --------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MeshTables:
    """All static mesh geometry as dense device arrays.

    Shapes: N nodes, E elements, Ed edges, nl levels (nl-1 layers), K = max
    elements per node.  Index arrays are int32, -1 = missing (+ mask).
    """
    # topology
    elem_nodes: jnp.ndarray        # [E,3] i32
    edges: jnp.ndarray             # [Ed,2] i32
    edge_tri: jnp.ndarray          # [Ed,2] i32, -1 on boundary
    elem_neighbors: jnp.ndarray    # [E,3] i32, -1 on boundary
    elem_edges: jnp.ndarray        # [E,3] i32
    nod_in_elem: jnp.ndarray       # [N,K] i32, -1 padded
    nod_in_elem_num: jnp.ndarray   # [N] i32
    nod_in_elem_slot: jnp.ndarray  # [N,K] i32 local vertex index of the node
    node_edges: jnp.ndarray        # [N,KE] i32 incident edges, -1 padded
    node_edge_sign: jnp.ndarray    # [N,KE] +1 if node is edge tail, -1 head
    node_neighbors: jnp.ndarray    # [N,KE] i32 graph-neighbor ring, -1 padded
    # coordinates
    coords: jnp.ndarray            # [N,2] (lon,lat) radians, mesh (rotated) frame
    geo_coords: jnp.ndarray        # [N,2] radians, geographic frame
    # geometry coefficients
    elem_area: jnp.ndarray         # [E] m^2
    area: jnp.ndarray              # [nl,N] scalar-cell areas, m^2
    areasvol: jnp.ndarray          # [nl,N]
    area_inv: jnp.ndarray          # [nl,N]
    areasvol_inv: jnp.ndarray      # [nl,N]
    resolution: jnp.ndarray        # [N] m
    edge_dxdy: jnp.ndarray         # [Ed,2] radians
    edge_cross_dxdy: jnp.ndarray   # [Ed,4] m
    gradient_sca: jnp.ndarray      # [E,6] 1/m
    gradient_vec: jnp.ndarray      # [E,6] 1/m
    elem_cos: jnp.ndarray          # [E]
    metric_factor: jnp.ndarray     # [E] tan(lat)/R
    coriolis: jnp.ndarray          # [E] 1/s
    coriolis_node: jnp.ndarray     # [N] 1/s
    # vertical structure
    zbar: jnp.ndarray              # [nl] level depths (<=0)
    Z: jnp.ndarray                 # [nl-1] layer mid depths
    # partial bottom cells (ref oce_ale.F90:199-418): actual bottom depth and
    # bottom-layer thickness per element/node.  With use_partial_cell=False
    # these equal the full-cell values zbar[nlevels-1] / zbar[nlevels-2]-
    # zbar[nlevels-1], so consumers read them unconditionally (no runtime
    # branch — partial cells are just different static geometry).
    zbar_e_bot: jnp.ndarray        # [E] element bottom depth (<=0)
    zbar_n_bot: jnp.ndarray        # [N] node bottom depth (<=0)
    bottom_elem_thickness: jnp.ndarray  # [E] >0 on wet elements
    bottom_node_thickness: jnp.ndarray  # [N] >0 on wet nodes
    nlevels_elem: jnp.ndarray      # [E] i32 (number of levels; layers = -1)
    nlevels_node: jnp.ndarray      # [N] i32
    ulevels_elem: jnp.ndarray      # [E] i32 (1 unless cavity), 1-based like ref
    ulevels_node: jnp.ndarray      # [N] i32
    elem_layer_mask: jnp.ndarray   # [nl-1,E] bool: layer active on element
    node_layer_mask: jnp.ndarray   # [nl-1,N] bool
    node_level_mask: jnp.ndarray   # [nl,N] bool: level interface active (W points)
    bc_index_node: jnp.ndarray     # [N] 1.0 interior, 0.0 on lateral boundary
    # static metadata
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_elems: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    n_edges_in: int = dataclasses.field(metadata=dict(static=True))
    nl: int = dataclasses.field(metadata=dict(static=True))
    cyclic_length: float = dataclasses.field(metadata=dict(static=True))
    cartesian: bool = dataclasses.field(metadata=dict(static=True))
    ocean_area: float = dataclasses.field(metadata=dict(static=True))


def build_mesh(path: str, *, cartesian: bool = False, fplane: bool = False,
               cyclic_length_deg: float = 360.0, force_rotation: bool = False,
               alpha: float = 50.0, beta: float = 15.0, gamma: float = -90.0,
               use_shipped_edges: bool = True, cavity_depth=None,
               use_partial_cell: bool = False,
               partial_cell_thresh: float = 0.0,
               dtype=jnp.float64) -> MeshTables:
    """Read a FESOM-format mesh directory and derive all static geometry.

    ``cavity_depth`` [N] (negative draft, 0 = open ocean) overrides any
    cavity_depth.out shipped with the mesh — used for synthetic shelves."""
    raw = read_raw_mesh(path, force_rotation=force_rotation,
                        alpha=alpha, beta=beta, gamma=gamma)
    if cavity_depth is not None:
        import dataclasses as _dc
        raw = _dc.replace(raw, cavity_depth=np.asarray(cavity_depth,
                                                       np.float64))
    return build_mesh_from_raw(raw, cartesian=cartesian, fplane=fplane,
                               cyclic_length_deg=cyclic_length_deg,
                               force_rotation=force_rotation, alpha=alpha,
                               beta=beta, gamma=gamma,
                               use_shipped_edges=use_shipped_edges,
                               use_partial_cell=use_partial_cell,
                               partial_cell_thresh=partial_cell_thresh,
                               dtype=dtype)


def partial_bottom_depths(depth: Optional[np.ndarray], elem_nodes: np.ndarray,
                          nod_in_elem: np.ndarray, nle: np.ndarray,
                          nln: np.ndarray, zbar: np.ndarray,
                          use_partial_cell: bool,
                          partial_cell_thresh: float = 0.0,
                          thers_lev: int = 5):
    """Per-element/per-node bottom depth + bottom-layer thickness.

    ref init_bottom_elem_thickness / init_bottom_node_thickness
    (``oce_ale.F90:199-418``): the elemental bottom depth follows the real
    topography ``depth`` clamped to ±1/2 layer around the full-cell level
    (no thinner than mid of the bottom layer, no thicker than mid of the
    layer below); the node value is the deepest adjacent element.  Cells
    whose full thickness is below ``partial_cell_thresh`` stay full.
    """
    nl = zbar.shape[0]
    Z = 0.5 * (zbar[:-1] + zbar[1:])
    zb_full_e = zbar[nle - 1]                       # full-cell bottom depth
    thick_full_e = zbar[nle - 2] - zbar[nle - 1]    # full bottom-layer thick
    if use_partial_cell and depth is not None:
        dcl = np.minimum(depth, zbar[thers_lev - 1])  # runtime clamp
        dd = dcl[elem_nodes].mean(axis=1)             # elemental topo depth
        at_max = nle == nl
        # dd below the deepest full level: thicken, bounded by half the
        # (virtual) next layer; dd above: thin, bounded by the layer mid
        z_nle_m1 = Z[np.minimum(nle, nl - 1) - 1]     # Z(nle), guard nle==nl
        deep = np.where(at_max,
                        np.maximum(dd, zbar[nle - 1]
                                   + (zbar[nle - 1] - Z[nle - 2])),
                        np.maximum(z_nle_m1, dd))
        shallow = np.minimum(Z[nle - 2], dd)
        zbar_e_bot = np.where(dd < zbar[nle - 1], deep, shallow)
        zbar_e_bot = np.where(thick_full_e <= partial_cell_thresh,
                              zb_full_e, zbar_e_bot)
    else:
        zbar_e_bot = zb_full_e
    bottom_elem_thickness = zbar[nle - 2] - zbar_e_bot
    # node bottom = deepest adjacent element's bottom (ref :400-401)
    valid = nod_in_elem >= 0
    zadj = np.where(valid, zbar_e_bot[np.clip(nod_in_elem, 0, None)], np.inf)
    zbar_n_bot = zadj.min(axis=1)
    zbar_n_bot = np.where(np.isfinite(zbar_n_bot), zbar_n_bot, zbar[nln - 1])
    bottom_node_thickness = zbar[nln - 2] - zbar_n_bot
    return zbar_e_bot, zbar_n_bot, bottom_elem_thickness, bottom_node_thickness


def build_mesh_from_raw(raw: RawMesh, *, cartesian: bool = False,
                        fplane: bool = False, cyclic_length_deg: float = 360.0,
                        force_rotation: bool = False, alpha: float = 50.0,
                        beta: float = 15.0, gamma: float = -90.0,
                        use_shipped_edges: bool = True,
                        use_partial_cell: bool = False,
                        partial_cell_thresh: float = 0.0,
                        dtype=jnp.float64) -> MeshTables:
    cl = cyclic_length_deg * rad
    coords = raw.coords            # radians, mesh frame
    N, E, nl = raw.n_nodes, raw.n_elems, raw.nl
    elem_nodes = raw.elem_nodes

    # ---- edges -----------------------------------------------------------
    if use_shipped_edges and raw.edges is not None:
        edges, edge_tri, n_in = raw.edges, raw.edge_tri, raw.edge2D_in
    else:
        edges, edge_tri, n_in = build_edges(elem_nodes, coords, cl)
    Ed = edges.shape[0]

    # ---- elem_edges / elem_neighbors (ref load_edges :1606-1692) ---------
    # elem_edges[e, j] is the edge OPPOSITE node j (does not contain node j):
    # for nodes (a,b,c), slot 0 holds edge (b,c), slot 1 (c,a), slot 2 (a,b).
    # Vectorised lookup via canonical undirected keys.
    edge_key = np.minimum(edges[:, 0], edges[:, 1]).astype(np.int64) * N \
        + np.maximum(edges[:, 0], edges[:, 1])
    key_order = np.argsort(edge_key)
    sorted_keys = edge_key[key_order]

    def _edge_lookup(na, nb):
        q = np.minimum(na, nb).astype(np.int64) * N + np.maximum(na, nb)
        pos = np.searchsorted(sorted_keys, q)
        return key_order[pos]

    e0, e1, e2 = elem_nodes[:, 0], elem_nodes[:, 1], elem_nodes[:, 2]
    elem_edges = np.stack([_edge_lookup(e1, e2), _edge_lookup(e2, e0),
                           _edge_lookup(e0, e1)], axis=1)
    # neighbor across edge j = the other triangle of that edge
    et0 = edge_tri[elem_edges, 0]       # [E,3]
    et1 = edge_tri[elem_edges, 1]
    elem_neighbors = np.where(et0 == np.arange(E)[:, None], et1, et0)

    # ---- node->element adjacency (ref find_neighbors :1700-1753) ---------
    num = np.zeros(N, np.int64)
    for j in range(3):
        np.add.at(num, elem_nodes[:, j], 1)
    K = int(num.max())
    # vectorised padded CSR fill: sort (node, elem) incidence pairs
    inodes = elem_nodes.T.ravel()                  # [3E] node of each incidence
    ielems = np.tile(np.arange(E), 3)
    order = np.argsort(inodes, kind="stable")
    inodes_s, ielems_s = inodes[order], ielems[order]
    offsets = np.zeros(N + 1, np.int64)
    np.cumsum(num, out=offsets[1:])
    slot = np.arange(3 * E) - offsets[inodes_s]    # position within each node's list
    nod_in_elem = np.full((N, K), -1, np.int64)
    nod_in_elem[inodes_s, slot] = ielems_s
    # local vertex slot of each node within each adjacent element
    safe_nie = np.where(nod_in_elem >= 0, nod_in_elem, 0)
    nod_in_elem_slot = np.argmax(
        elem_nodes[safe_nie] == np.arange(N)[:, None, None], axis=-1)

    # ---- node->edge incidence (for gather-based divergence assembly) ----
    # TPU scatters serialize on colliding indices; precomputing per-node
    # incident-edge lists turns every edge->node accumulation into a gather+
    # sum (the same trick the reference plays with precomputed MPI datatypes,
    # but for on-chip memory access instead of messages).
    e_nodes_flat = edges.T.ravel()                 # [2*Ed]
    e_ids = np.tile(np.arange(Ed), 2)
    e_sign = np.concatenate([np.ones(Ed, np.int64), -np.ones(Ed, np.int64)])
    eorder = np.argsort(e_nodes_flat, kind="stable")
    en_s, eid_s, esg_s = e_nodes_flat[eorder], e_ids[eorder], e_sign[eorder]
    ecount = np.bincount(e_nodes_flat, minlength=N)
    KE = int(ecount.max())
    eoff = np.zeros(N + 1, np.int64)
    np.cumsum(ecount, out=eoff[1:])
    eslot = np.arange(2 * Ed) - eoff[en_s]
    node_edges = np.full((N, KE), -1, np.int64)
    node_edge_sign = np.zeros((N, KE), np.int64)
    node_edges[en_s, eslot] = eid_s
    node_edge_sign[en_s, eslot] = esg_s
    # 1-ring graph neighbors: the other endpoint of each incident edge
    ne_safe = np.clip(node_edges, 0, None)
    node_neighbors = np.where(
        node_edges >= 0,
        np.where(node_edge_sign > 0, edges[ne_safe, 1], edges[ne_safe, 0]),
        -1)

    # ---- levels ----------------------------------------------------------
    if raw.nlevels_elem is not None and raw.nlevels_node is not None:
        nle, nln = raw.nlevels_elem, raw.nlevels_node
    else:
        nle, nln = derive_levels(raw, elem_neighbors)
    if raw.cavity_depth is not None:
        ule, uln = derive_ulevels_cavity(raw.cavity_depth, elem_nodes,
                                         elem_neighbors, nle, raw.zbar)
    else:
        ule = np.ones(E, np.int64)
        uln = np.ones(N, np.int64)

    zbar = raw.zbar
    Z = 0.5 * (zbar[:-1] + zbar[1:])

    (zbar_e_bot, zbar_n_bot, bottom_elem_thickness,
     bottom_node_thickness) = partial_bottom_depths(
        raw.depth, elem_nodes, nod_in_elem, nle, nln, zbar,
        use_partial_cell, partial_cell_thresh)

    # masks: layer nz (0-based) active on elem e iff ule[e]-1 <= nz <= nle[e]-2
    # (upper bound from the bathymetry, lower from the ice-shelf cavity)
    lay = np.arange(nl - 1)
    elem_layer_mask = (lay[:, None] < (nle[None, :] - 1)) \
        & (lay[:, None] >= (ule[None, :] - 1))
    node_layer_mask = (lay[:, None] < (nln[None, :] - 1)) \
        & (lay[:, None] >= (uln[None, :] - 1))
    lev = np.arange(nl)
    node_level_mask = (lev[:, None] < nln[None, :]) \
        & (lev[:, None] >= (uln[None, :] - 1))

    # ---- element centers, areas (ref mesh_areas :1882-1894) --------------
    exy = coords[elem_nodes]                      # [E,3,2]
    ex = exy[..., 0]
    amin = ex.min(axis=1, keepdims=True)
    ex = np.where(ex - amin >= cl / 2.0, ex - cl, ex)
    ex = np.where(ex - amin < -cl / 2.0, ex + cl, ex)
    center_x = ex.mean(axis=1)
    center_y = exy[..., 1].mean(axis=1)
    ay = np.cos(center_y)
    if cartesian:
        ay = np.ones_like(ay)
    a1 = _trim_cyclic(coords[elem_nodes[:, 1], 0] - coords[elem_nodes[:, 0], 0], cl) * ay
    b1 = _trim_cyclic(coords[elem_nodes[:, 2], 0] - coords[elem_nodes[:, 0], 0], cl) * ay
    a2 = coords[elem_nodes[:, 1], 1] - coords[elem_nodes[:, 0], 1]
    b2 = coords[elem_nodes[:, 2], 1] - coords[elem_nodes[:, 0], 1]
    elem_area = 0.5 * np.abs(a1 * b2 - b1 * a2)   # radians^2 (x r^2 below)

    # scalar (median-dual) areas per level (ref mesh_areas :1932-1958)
    area = np.zeros((nl, N))
    # each element contributes elem_area/3 to its 3 vertices on its active
    # layers [ule-1, nle-1)
    contrib_levels = np.where(elem_layer_mask, (elem_area / 3.0)[None, :], 0.0)  # [nl-1,E]
    for j in range(3):
        np.add.at(area[:nl - 1].T, elem_nodes[:, j], contrib_levels.T)
    if raw.cavity_depth is not None:
        # under a cavity the scalar-cell "mid" area is the LOWER prism edge
        # where any adjacent element is still closed (ref :1952-1977)
        cav_contrib = np.zeros((nl - 1, N), np.int64)
        closed = lay[:, None] < (ule[None, :] - 1)          # [nl-1, E]
        for j in range(3):
            np.add.at(cav_contrib.T, elem_nodes[:, j], closed.T.astype(np.int64))
        areasvol = area.copy()
        nz_dn = np.minimum(lay[:, None] + 1, np.maximum(nln[None, :] - 2, 0))
        area_dn = np.take_along_axis(area[:nl - 1], nz_dn, axis=0)
        areasvol[:nl - 1] = np.where((cav_contrib > 0) & node_layer_mask,
                                     area_dn, area[:nl - 1])
    else:
        areasvol = area.copy()  # no cavity: identical (ref :1980-1988)

    elem_area = elem_area * r_earth * r_earth
    area = area * r_earth * r_earth
    areasvol = areasvol * r_earth * r_earth
    area_inv = np.where(area > 0, 1.0 / np.where(area > 0, area, 1.0), 0.0)
    areasvol_inv = np.where(areasvol > 0, 1.0 / np.where(areasvol > 0, areasvol, 1.0), 0.0)

    # resolution: sqrt(area/pi)*2, smoothed 3x with area-weighted vertex avg
    resolution = np.sqrt(areasvol[0] / pi) * 2.0
    for _ in range(3):
        rsum = resolution[elem_nodes].sum(axis=1) / 3.0 * elem_area  # [E]
        acc = np.zeros(N)
        vol = np.zeros(N)
        for j in range(3):
            np.add.at(acc, elem_nodes[:, j], rsum)
            np.add.at(vol, elem_nodes[:, j], elem_area)
        resolution = acc / np.maximum(vol, 1e-30)

    # ---- geographic coords / coriolis (ref mesh_auxiliary :2147-2173) ----
    if force_rotation:
        m = rotation_matrix(alpha, beta, gamma)
        glon, glat = r2g(coords[:, 0], coords[:, 1], m)
        ge_lon, ge_lat = r2g(center_x, center_y, m)
    else:
        glon, glat = coords[:, 0].copy(), coords[:, 1].copy()
        ge_lon, ge_lat = center_x, center_y
    glon = np.where(glon > 2 * pi, glon - 2 * pi, glon)
    glon = np.where(glon < -2 * pi, glon + 2 * pi, glon)
    geo_coords = np.stack([glon, glat], axis=1)
    coriolis_node = 2.0 * omega * np.sin(glat)
    coriolis = 2.0 * omega * np.sin(ge_lat)
    if fplane:
        coriolis = np.full(E, 2.0 * omega * 0.71)
        coriolis_node = np.full(N, 2.0 * omega * 0.71)

    elem_cos = np.cos(center_y)
    # NOTE: the reference assigns a scalar to the whole metric_factor array
    # inside the element loop (oce_mesh.F90:2183), leaving every entry equal to
    # the last element's value — an apparent bug.  We compute the intended
    # per-element value tan(lat)/R.
    metric_factor = np.tan(center_y) / r_earth
    if cartesian:
        elem_cos = np.ones(E)
        metric_factor = np.zeros(E)

    # ---- edge geometry (ref :2199-2238) ----------------------------------
    n1, n2 = edges[:, 0], edges[:, 1]
    edge_dxdy = np.stack([
        _trim_cyclic(coords[n2, 0] - coords[n1, 0], cl),
        coords[n2, 1] - coords[n1, 1]], axis=1)
    # edge centers with cyclic handling
    ax_ = coords[n1, 0].copy()
    bx_ = coords[n2, 0].copy()
    d = ax_ - bx_
    ax_ = np.where(d > cl / 2.0, ax_ - cl, ax_)
    bx_ = np.where(d < -cl / 2.0, bx_ - cl, bx_)
    ecx = 0.5 * (ax_ + bx_)
    ecy = 0.5 * (coords[n1, 1] + coords[n2, 1])
    edge_cross_dxdy = np.zeros((Ed, 4))
    for k in range(2):
        el = edge_tri[:, k]
        valid = el >= 0
        bx = np.where(valid, center_x[np.clip(el, 0, None)], 0.0) - ecx
        by = np.where(valid, center_y[np.clip(el, 0, None)], 0.0) - ecy
        bx = _trim_cyclic(bx, cl) * elem_cos[np.clip(el, 0, None)]
        edge_cross_dxdy[:, 2 * k] = np.where(valid, bx * r_earth, 0.0)
        edge_cross_dxdy[:, 2 * k + 1] = np.where(valid, by * r_earth, 0.0)

    # ---- scalar gradient coefficients (ref :2284-2306) -------------------
    dX31 = _trim_cyclic(coords[elem_nodes[:, 2], 0] - coords[elem_nodes[:, 0], 0], cl) * elem_cos
    dX21 = _trim_cyclic(coords[elem_nodes[:, 1], 0] - coords[elem_nodes[:, 0], 0], cl) * elem_cos
    dY31 = coords[elem_nodes[:, 2], 1] - coords[elem_nodes[:, 0], 1]
    dY21 = coords[elem_nodes[:, 1], 1] - coords[elem_nodes[:, 0], 1]
    dfac = -0.5 * r_earth / elem_area
    gradient_sca = np.stack([
        (-dY31 + dY21) * dfac, dY31 * dfac, -dY21 * dfac,
        (dX31 - dX21) * dfac, -dX31 * dfac, dX21 * dfac], axis=1)

    # ---- vector gradient coefficients, least squares (ref :2369-2401) ----
    xs = np.zeros((E, 3))
    ys = np.zeros((E, 3))
    for j in range(3):
        nb = elem_neighbors[:, j]
        has = nb >= 0
        bxn = np.where(has, center_x[np.clip(nb, 0, None)], 0.0)
        byn = np.where(has, center_y[np.clip(nb, 0, None)], 0.0)
        # virtual mirror center across boundary edge (edge center of edge j)
        ed = elem_edges[:, j]
        e1, e2 = edges[ed, 0], edges[ed, 1]
        a1_ = coords[e1, 0].copy()
        b1_ = coords[e2, 0].copy()
        dd = a1_ - b1_
        a1_ = np.where(dd > cl / 2.0, a1_ - cl, a1_)
        b1_ = np.where(dd < -cl / 2.0, b1_ - cl, b1_)
        becx = 0.5 * (a1_ + b1_)
        becy = 0.5 * (coords[e1, 1] + coords[e2, 1])
        xj = np.where(has, _trim_cyclic(bxn - center_x, cl),
                      2.0 * _trim_cyclic(becx - center_x, cl))
        yj = np.where(has, byn - center_y, 2.0 * (becy - center_y))
        xs[:, j] = xj
        ys[:, j] = yj
    xs = xs * elem_cos[:, None] * r_earth
    ys = ys * r_earth
    cxx = (xs ** 2).sum(axis=1)
    cxy = (xs * ys).sum(axis=1)
    cyy = (ys ** 2).sum(axis=1)
    det = cxy * cxy - cxx * cyy
    gradient_vec = np.concatenate([
        (cxy[:, None] * ys - cyy[:, None] * xs) / det[:, None],
        (cxy[:, None] * xs - cxx[:, None] * ys) / det[:, None]], axis=1)

    # ---- lateral boundary flag (ref :2404-2413) --------------------------
    bc_index_node = np.ones(N)
    bnd_edges = np.arange(Ed) >= n_in
    for k in range(2):
        bc_index_node[edges[bnd_edges, k]] = 0.0

    ocean_area = float(area[0].sum())

    f = lambda x: jnp.asarray(x, dtype)
    i = lambda x: jnp.asarray(x, jnp.int32)
    return MeshTables(
        elem_nodes=i(elem_nodes), edges=i(edges), edge_tri=i(edge_tri),
        elem_neighbors=i(elem_neighbors), elem_edges=i(elem_edges),
        nod_in_elem=i(nod_in_elem), nod_in_elem_num=i(num),
        nod_in_elem_slot=i(nod_in_elem_slot),
        node_edges=i(node_edges), node_edge_sign=f(node_edge_sign),
        node_neighbors=i(node_neighbors),
        coords=f(coords), geo_coords=f(geo_coords),
        elem_area=f(elem_area), area=f(area), areasvol=f(areasvol),
        area_inv=f(area_inv), areasvol_inv=f(areasvol_inv),
        resolution=f(resolution), edge_dxdy=f(edge_dxdy),
        edge_cross_dxdy=f(edge_cross_dxdy), gradient_sca=f(gradient_sca),
        gradient_vec=f(gradient_vec), elem_cos=f(elem_cos),
        metric_factor=f(metric_factor), coriolis=f(coriolis),
        coriolis_node=f(coriolis_node), zbar=f(zbar), Z=f(Z),
        zbar_e_bot=f(zbar_e_bot), zbar_n_bot=f(zbar_n_bot),
        bottom_elem_thickness=f(bottom_elem_thickness),
        bottom_node_thickness=f(bottom_node_thickness),
        nlevels_elem=i(nle), nlevels_node=i(nln),
        ulevels_elem=i(ule), ulevels_node=i(uln),
        elem_layer_mask=jnp.asarray(elem_layer_mask),
        node_layer_mask=jnp.asarray(node_layer_mask),
        node_level_mask=jnp.asarray(node_level_mask),
        bc_index_node=f(bc_index_node),
        n_nodes=N, n_elems=E, n_edges=Ed, n_edges_in=int(n_in), nl=nl,
        cyclic_length=float(cl), cartesian=bool(cartesian),
        ocean_area=ocean_area)
