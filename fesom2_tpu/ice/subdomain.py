"""Static ice subdomain: run the EVP subcycle loop only where ice can exist.

The EVP velocity update is the identity at nodes with a_ice < 0.01 (ref
ice_maEVP.F90:475-479 / our evp.py has_ice_n gating), and stresses stay
zero on elements without ice.  Restricting the 120-iteration subcycle loop
to a (dilated) polar cap is therefore EXACT as long as all ice stays
inside the cap — gather volume per subcycle scales with the subdomain
size (~1/3 of a global mesh for |lat| > 40).

The subdomain duck-types the MeshTables fields the EVP kernels read, so
``mevp_dynamics`` runs unchanged on the restricted tables; entry gathers
the node/element state into subdomain order (one packed gather), exit
scatters the updated velocities and stresses back (unique indices).

The cap must be chosen with margin (default: equatorward to 40 deg); the
run driver's step-info can flag ice outside the cap (a_ice > 0 where
``node_mask`` is False) as a configuration error.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import rad
from ..mesh import MeshTables


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IceSubdomain:
    """Restricted mesh tables for the EVP loop (duck-types MeshTables)."""
    sub_nodes: jnp.ndarray       # [Ns] i32 global node ids
    sub_elems: jnp.ndarray       # [Es] i32 global element ids
    node_mask: jnp.ndarray       # [N] bool (for safety diagnostics)
    # MeshTables-compatible fields (subdomain-local numbering)
    elem_nodes: jnp.ndarray      # [Es,3] i32 local
    nod_in_elem: jnp.ndarray     # [Ns,K] i32 local, -1 pad
    nod_in_elem_slot: jnp.ndarray  # [Ns,K] i32
    gradient_sca: jnp.ndarray    # [Es,6]
    metric_factor: jnp.ndarray   # [Es]
    elem_area: jnp.ndarray       # [Es]
    area: jnp.ndarray            # [1,Ns] (surface scalar areas)
    coriolis_node: jnp.ndarray   # [Ns]
    bc_index_node: jnp.ndarray   # [Ns]
    n_elems: int = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))


def build_ice_subdomain(mesh: MeshTables, lat_deg: float = 40.0
                        ) -> IceSubdomain:
    """Build the polar-cap subdomain |lat| > lat_deg (host-side numpy)."""
    glat = np.abs(np.asarray(mesh.geo_coords)[:, 1]) / rad
    seed = glat > lat_deg
    en = np.asarray(mesh.elem_nodes)
    emask = seed[en].any(axis=1)
    sub_elems = np.nonzero(emask)[0]
    l2g = np.unique(en[emask])                  # closed node set
    N = mesh.n_nodes
    g2l = np.full(N, -1, np.int64)
    g2l[l2g] = np.arange(l2g.size)
    node_mask = np.zeros(N, bool)
    node_mask[l2g] = True

    en_loc = g2l[en[sub_elems]]                 # [Es,3] local
    Ns, Es = l2g.size, sub_elems.size

    # local node->element incidence (same construction as tables.py)
    num = np.zeros(Ns, np.int64)
    for j in range(3):
        np.add.at(num, en_loc[:, j], 1)
    K = max(1, int(num.max()))
    inodes = en_loc.T.ravel()
    ielems = np.tile(np.arange(Es), 3)
    order = np.argsort(inodes, kind="stable")
    inodes_s, ielems_s = inodes[order], ielems[order]
    offsets = np.zeros(Ns + 1, np.int64)
    np.cumsum(num, out=offsets[1:])
    slot_pos = np.arange(3 * Es) - offsets[inodes_s]
    nie = np.full((Ns, K), -1, np.int64)
    nie[inodes_s, slot_pos] = ielems_s
    safe = np.where(nie >= 0, nie, 0)
    slot = np.argmax(en_loc[safe] == np.arange(Ns)[:, None, None], axis=-1)

    f32 = mesh.gradient_sca.dtype
    return IceSubdomain(
        sub_nodes=jnp.asarray(l2g, jnp.int32),
        sub_elems=jnp.asarray(sub_elems, jnp.int32),
        node_mask=jnp.asarray(node_mask),
        elem_nodes=jnp.asarray(en_loc, jnp.int32),
        nod_in_elem=jnp.asarray(nie, jnp.int32),
        nod_in_elem_slot=jnp.asarray(slot, jnp.int32),
        gradient_sca=jnp.asarray(np.asarray(mesh.gradient_sca)[sub_elems], f32),
        metric_factor=jnp.asarray(np.asarray(mesh.metric_factor)[sub_elems], f32),
        elem_area=jnp.asarray(np.asarray(mesh.elem_area)[sub_elems], f32),
        area=jnp.asarray(np.asarray(mesh.area)[0][l2g][None, :], f32),
        coriolis_node=jnp.asarray(np.asarray(mesh.coriolis_node)[l2g], f32),
        bc_index_node=jnp.asarray(np.asarray(mesh.bc_index_node)[l2g], f32),
        n_elems=int(Es), n_nodes=int(Ns))
