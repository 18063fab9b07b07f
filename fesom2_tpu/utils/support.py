"""Support utilities: mass-matrix smoothing, global integrals,
extrapolation into bathymetry.

Reference: ``src/gen_support.F90`` — smooth_nod2D/3D :46-178,
smooth_elem2D/3D :183-258, integrate_nod_2D/3D :262-311,
extrap_nod3D :315-418.  The smoothing/integral routines are jittable
(gather-based, no scatters); extrapolation runs at setup time in numpy.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh import MeshTables
from ..core import ops


def smooth_nod(arr, n_smooth: int, mesh: MeshTables):
    """Apply the lumped mass matrix ``n_smooth`` times to a nodal field
    (ref smooth_nod2D :46-74 / smooth_nod3D :78-178).  ``arr`` is [N] or
    [..., N]; each pass replaces a node by the area-weighted average of the
    three-node means of its adjacent elements."""
    ea = mesh.elem_area
    # per-node normalization: sum of adjacent element areas
    nie = mesh.nod_in_elem                       # [N, K], -1 padded
    has = nie >= 0
    vol = jnp.where(has, ea[jnp.where(has, nie, 0)], 0.0).sum(-1)
    vol = jnp.where(vol > 0, vol, 1.0)
    for _ in range(n_smooth):
        em = arr[..., mesh.elem_nodes].mean(-1) * ea       # [..., E]
        gathered = jnp.where(has, em[..., jnp.where(has, nie, 0)], 0.0)
        arr = ops.halo_fix_nodes(gathered.sum(-1) / vol)
    return arr


def smooth_elem(arr, n_smooth: int, mesh: MeshTables):
    """Apply mass-matrix smoothing to an element field (ref smooth_elem2D
    :183-212 / smooth_elem3D :216-258): element values are area-averaged to
    nodes, then the element takes the mean of its vertices."""
    ea = mesh.elem_area
    nie = mesh.nod_in_elem
    has = nie >= 0
    vol = jnp.where(has, ea[jnp.where(has, nie, 0)], 0.0).sum(-1)
    vol = jnp.where(vol > 0, vol, 1.0)
    for _ in range(n_smooth):
        contrib = arr * ea
        at_node = ops.halo_fix_nodes(
            jnp.where(has, contrib[..., jnp.where(has, nie, 0)],
                      0.0).sum(-1) / vol)                  # [..., N]
        arr = at_node[..., mesh.elem_nodes].mean(-1)
    return arr


def integrate_nod_2d(data, mesh: MeshTables):
    """Global surface integral of a nodal 2D field (ref integrate_nod_2D
    :262-284): sum(data * area at the surface level)."""
    return (data * mesh.area[0]).sum()


def integrate_nod_3d(data, hnode, mesh: MeshTables):
    """Global volume integral of a nodal 3D field (ref integrate_nod_3D
    :288-311): sum over wet cells of data * areasvol * hnode."""
    w = jnp.where(mesh.node_layer_mask, hnode * mesh.areasvol[:-1], 0.0)
    return (data * w).sum()


def extrap_nod(arr, mesh: MeshTables, dummy: float = 1e20) -> np.ndarray:
    """Fill missing values (>= 0.99*dummy) of a [nl-1, N] nodal field by
    iterative horizontal neighbor averaging within each layer, then by
    copying downward (ref extrap_nod3D :315-418).  Setup-time numpy."""
    arr = np.array(arr, dtype=np.float64, copy=True)
    thresh = 0.99 * dummy
    nln = np.asarray(mesh.nlevels_node)
    nle = np.asarray(mesh.nlevels_elem)
    nie = np.asarray(mesh.nod_in_elem)          # [N, K]
    en = np.asarray(mesh.elem_nodes)            # [E, 3]
    nl1 = arr.shape[0]

    for nz in range(nl1):
        wet = nln - 1 > nz                      # node has layer nz
        el_ok = nle - 1 > nz
        while True:
            work = arr[nz]
            missing = (work >= thresh) & wet
            if not missing.any():
                break
            valid = (work < thresh) & wet
            # neighbor values via adjacent elements' vertices
            val = np.zeros(work.shape)
            cnt = np.zeros(work.shape)
            for k in range(nie.shape[1]):
                el = nie[:, k]
                ok = (el >= 0) & el_ok[np.clip(el, 0, None)]
                for j in range(3):
                    nb = en[np.clip(el, 0, None), j]
                    use = ok & valid[nb]
                    val += np.where(use, work[nb], 0.0)
                    cnt += use
            upd = missing & (cnt > 0)
            if not upd.any():
                break                           # isolated basin: leave it
            arr[nz] = np.where(upd, val / np.maximum(cnt, 1), work)

    # vertical: copy from the layer above
    for nz in range(1, nl1):
        take = (arr[nz] >= thresh) & (nln - 1 > nz)
        arr[nz] = np.where(take, arr[nz - 1], arr[nz])
    return arr
