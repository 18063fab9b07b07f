"""Static precomputes for the tracer transport schemes.

Reference: ``src/oce_muscl_adv.F90`` — muscl_adv_init :27-127 (nboundary_lay),
find_up_downwind_triangles :132-283; Ki initialisation
``src/oce_setup_step.F90:326-330``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh import MeshTables


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TracerStatics:
    edge_up_dn_tri: jnp.ndarray    # [Ed, 2] i32, -1 when absent
    nboundary_lay: jnp.ndarray     # [N] i32 (1-based layer count before node
                                   # becomes a lateral-boundary node)
    Ki: jnp.ndarray                # [N] horizontal diffusivity (layer-indep.)
    nln_min: jnp.ndarray = None    # [N] i32 min nlevels over adjacent elems
                                   # (static; saves a [K,N] gather per
                                   # fill_up_dn_grad call when present)


def _find_up_downwind_triangles(mesh: MeshTables) -> np.ndarray:
    """Vectorised re-derivation of find_up_downwind_triangles (:132-283)."""
    coords = np.asarray(mesh.coords)
    edges = np.asarray(mesh.edges)
    en = np.asarray(mesh.elem_nodes)
    nie = np.asarray(mesh.nod_in_elem)        # [N, K]
    cl = mesh.cyclic_length

    def trim(v):
        v = np.where(v > cl / 2, v - cl, v)
        return np.where(v < -cl / 2, v + cl, v)

    Ed = edges.shape[0]
    out = np.full((Ed, 2), -1, np.int64)

    x = np.stack([trim(coords[edges[:, 1], 0] - coords[edges[:, 0], 0]),
                  coords[edges[:, 1], 1] - coords[edges[:, 0], 1]], axis=1)

    for side, sign in ((0, -1.0), (1, 1.0)):   # upwind: -x from node1; down: +x from node2
        anchor = edges[:, side]                # [Ed]
        xx_vec = sign * x                      # [Ed, 2]
        cands = nie[anchor]                    # [Ed, K]
        K = cands.shape[1]
        found = np.full(Ed, -1, np.int64)
        for k in range(K):
            elem = cands[:, k]
            ok = elem >= 0
            els = np.where(ok, elem, 0)
            tri = en[els]                      # [Ed, 3]
            # rotate so that vertex 0 is the anchor
            is0 = (tri[:, 0] == anchor)[:, None]
            is1 = (tri[:, 1] == anchor)[:, None]
            v0 = np.where(is0, tri[:, [0, 1, 2]],
                          np.where(is1, tri[:, [1, 0, 2]], tri[:, [2, 0, 1]]))
            b = np.stack([trim(coords[v0[:, 1], 0] - coords[v0[:, 0], 0]),
                          coords[v0[:, 1], 1] - coords[v0[:, 0], 1]], 1)
            c = np.stack([trim(coords[v0[:, 2], 0] - coords[v0[:, 0], 0]),
                          coords[v0[:, 2], 1] - coords[v0[:, 0], 1]], 1)
            cr = (c * c).sum(1)
            bx = (b * c).sum(1) / cr
            by = (-b[:, 0] * c[:, 1] + b[:, 1] * c[:, 0]) / cr
            xv = xx_vec
            xxp = (xv * c).sum(1) / cr
            xyp = (-xv[:, 0] * c[:, 1] + xv[:, 1] * c[:, 0]) / cr
            ab = np.arctan2(by, bx)
            ax = np.arctan2(xyp, xxp)
            hit = ((ab > 0) & (ax > 0) & (ax < ab)) | \
                  ((ab < 0) & (ax < 0) & (ax > ab)) | \
                  (ab == ax) | (ax == 0.0)
            hit = hit & ok & (found < 0)
            found = np.where(hit, elem, found)
        out[:, side] = found
    return out


def build_tracer_statics(mesh: MeshTables, K_hor: float = 10.0,
                         dtype=jnp.float64) -> TracerStatics:
    edge_up_dn = _find_up_downwind_triangles(mesh)

    # nboundary_lay (ref muscl_adv_init :80-108)
    N = mesh.n_nodes
    edges = np.asarray(mesh.edges)
    etri = np.asarray(mesh.edge_tri)
    nle = np.asarray(mesh.nlevels_elem)
    nb = np.full(N, mesh.nl - 1, np.int64)
    bnd = (etri < 0).any(axis=1)
    et_min = np.where(bnd, 0,
                      np.minimum(nle[np.clip(etri[:, 0], 0, None)],
                                 nle[np.clip(etri[:, 1], 0, None)]) - 1)
    for j in range(2):
        np.minimum.at(nb, edges[:, j], et_min)

    Ki = K_hor * (np.asarray(mesh.resolution) / 100000.0) ** 2

    nie = np.asarray(mesh.nod_in_elem)
    nln_min = np.where(nie >= 0, np.asarray(mesh.nlevels_elem)[np.clip(nie, 0, None)],
                       10 ** 6).min(-1)

    return TracerStatics(edge_up_dn_tri=jnp.asarray(edge_up_dn, jnp.int32),
                         nboundary_lay=jnp.asarray(nb, jnp.int32),
                         Ki=jnp.asarray(Ki, dtype),
                         nln_min=jnp.asarray(nln_min, jnp.int32))
