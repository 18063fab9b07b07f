"""Mesh description file ``fesom.mesh.diag.nc`` for post-processing
(ref ``src/io_mesh_info.F90`` write_mesh_info :37-276: same dimension and
variable set, 1-based index conventions preserved so the reference's
post-processing tools read it unchanged).
"""
from __future__ import annotations

import os

import numpy as np

from ..mesh import MeshTables
from .netcdf import write_dataset


def write_mesh_info(path: str, mesh: MeshTables, nod_part=None,
                    elem_part=None):
    """Write fesom.mesh.diag.nc into `path` (a directory or filename)."""
    if os.path.isdir(path) or not path.endswith(".nc"):
        os.makedirs(path, exist_ok=True)
        path = os.path.join(path, "fesom.mesh.diag.nc")
    N, E, Ed, nl = mesh.n_nodes, mesh.n_elems, mesh.n_edges, mesh.nl
    nie = np.asarray(mesh.nod_in_elem)
    n_max = nie.shape[1]
    nln = np.asarray(mesh.nlevels_node)
    nle = np.asarray(mesh.nlevels_elem)
    zbar = np.asarray(mesh.zbar)
    geo = np.asarray(mesh.geo_coords)

    dims = {"nod2": N, "edg_n": Ed, "elem": E, "nz": nl, "nz1": nl - 1,
            "n2": 2, "n3": 3, "n4": 4, "N": n_max}
    f64 = np.float64
    variables = {
        "nz": (("nz",), zbar.astype(f64)),
        "nz1": (("nz1",), np.asarray(mesh.Z, f64)),
        "elem_area": (("elem",), np.asarray(mesh.elem_area, f64)),
        "nlevels_nod2D": (("nod2",), nln.astype(np.int32)),
        "nlevels": (("elem",), nle.astype(np.int32)),
        "nod_in_elem2D_num": (("nod2",),
                              (nie >= 0).sum(1).astype(np.int32)),
        "nod_part": (("nod2",), (np.zeros(N, np.int32) if nod_part is None
                                 else np.asarray(nod_part, np.int32))),
        "elem_part": (("elem",), (np.zeros(E, np.int32) if elem_part is None
                                  else np.asarray(elem_part, np.int32))),
        "zbar_e_bottom": (("elem",),
                          np.asarray(mesh.zbar_e_bot, f64)),
        "zbar_n_bottom": (("nod2",),
                          np.asarray(mesh.zbar_n_bot, f64)),
        "lon": (("nod2",), np.degrees(geo[:, 0]).astype(f64)),
        "lat": (("nod2",), np.degrees(geo[:, 1]).astype(f64)),
        "nod_area": (("nz", "nod2"), np.asarray(mesh.area, f64)),
        # 1-based connectivity like the Fortran output
        "elements": (("n3", "elem"),
                     (np.asarray(mesh.elem_nodes).T + 1).astype(np.int32)),
        "nodes": (("n2", "nod2"), np.degrees(geo).T.astype(f64)),
        "nod_in_elem2D": (("N", "nod2"), (nie.T + 1).astype(np.int32)),
        "edges": (("n2", "edg_n"),
                  (np.asarray(mesh.edges).T + 1).astype(np.int32)),
        "edge_tri": (("n2", "edg_n"),
                     (np.asarray(mesh.edge_tri).T + 1).astype(np.int32)),
        "edge_cross_dxdy": (("n4", "edg_n"),
                            np.asarray(mesh.edge_cross_dxdy, f64).T),
        "gradient_sca_x": (("n3", "elem"),
                           np.asarray(mesh.gradient_sca[:, 0:3], f64).T),
        "gradient_sca_y": (("n3", "elem"),
                           np.asarray(mesh.gradient_sca[:, 3:6], f64).T),
    }
    write_dataset(path, dims, variables)
    return path
