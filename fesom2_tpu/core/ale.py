"""ALE vertical machinery: vertical velocity, layer-thickness updates.

Reference: ``src/oce_ale.F90`` — vert_vel_ale :1692-2204, update_thickness_ale
:800-993, init_thickness_ale :549-795.

Round-1 scope: 'linfs' (no thickness motion), 'zstar' (proportional
distribution over the column), and plain 'zlevel' (top-layer absorption;
the local-zstar fallback of :1865-2002 is not yet implemented).
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..mesh import MeshTables
from .ops import cumsum_bottom_up, edge_divergence, edge_transport
from .state import OceanState, Forcing


def vert_vel_ale(state: OceanState, mesh: MeshTables, cfg,
                 forcing: Forcing) -> OceanState:
    """Divergence-driven vertical velocity + ALE dhbar distribution."""
    lmask = mesh.elem_layer_mask
    he = jnp.where(lmask, state.helem, 0.0)

    # per-edge, per-layer transports (ref :1724-1780), merged u/v gathers
    flux = edge_transport(state.u * he, state.v * he, mesh)  # [nl-1, Ed]
    div = jnp.concatenate([edge_divergence(flux, mesh),
                           jnp.zeros((1, mesh.n_nodes), flux.dtype)], 0)

    # bottom-up cumulative sum -> W flux through interfaces (ref :1789-1799)
    w = cumsum_bottom_up(div)
    # to velocity units (ref :1804-1815); area>0 only on active levels
    w = jnp.where(mesh.node_level_mask,
                  w / jnp.where(mesh.area > 0, mesh.area, 1.0), 0.0)

    hnode_new = state.hnode
    which = cfg.ale.which_ALE
    if which == "zlevel":
        # zlevel with local-zstar fallback (ref oce_ale.F90:1836-2016):
        # normally dhbar goes into the top layer only; when that would thin
        # it below min_hnode*nominal, the loss is spread greedily over the
        # first lzstar_lev layers (capacity-limited, CFL_z>=0.95 excluded);
        # on positive dhbar the subsurface deficits are refilled bottom-up
        # before the rest returns to the surface layer.  The reference's
        # "cumulative" capacity sum (:1891) is a pairwise sum (bug: the
        # implied-do does not accumulate) used only as a loop bound; we use
        # the intended greedy distribution directly.
        dhbar = state.hbar - state.hbar_old                   # [N]
        K = int(cfg.ale.lzstar_lev)
        nominal = (mesh.zbar[:-1] - mesh.zbar[1:])            # [nl-1]
        lay = jnp.arange(mesh.nl - 1)[:, None]
        nln_min = _nlevels_node_min(mesh)
        # layers allowed to change: 0..min(K, nln_min-2)-1 for the spread
        allowed = lay < jnp.minimum(K, nln_min - 2)[None, :]

        go_zstar = (dhbar < 0.0) & \
            (state.hnode[0] + dhbar <= nominal[0] * cfg.ale.min_hnode)
        deficit = nominal[:, None] - state.hnode              # [nl-1, N]
        has_deficit = (jnp.where((lay >= 1) & (lay < K), jnp.abs(deficit), 0.0)
                       .max(0) > 0.0)
        go_refill = (dhbar > 0.0) & has_deficit

        # --- case A: spread negative dhbar, capacity-limited, top-down ----
        capA = jnp.minimum(nominal[:, None] * cfg.ale.min_hnode
                           - state.hnode, 0.0)
        capA = jnp.where(state.cfl_z[:-1] >= 0.95, 0.0, capA)
        capA = jnp.where(allowed, capA, 0.0)

        def fa(rest, cap):
            d = jnp.maximum(rest, cap)
            return jnp.minimum(rest - d, 0.0), d
        _, distA = jax.lax.scan(fa, dhbar, capA)

        # --- case B: refill deficits bottom-up, surface unlimited ---------
        capB = jnp.where(allowed, jnp.maximum(deficit, 0.0), 0.0)
        capB = capB.at[0].set(jnp.where(allowed[0], 1000.0, 0.0))

        def fb(rest, cap):
            d = jnp.minimum(rest, cap)
            return jnp.maximum(rest - d, 0.0), d
        _, distB = jax.lax.scan(fb, dhbar, capB, reverse=True)

        # --- case C: plain zlevel -----------------------------------------
        distC = jnp.zeros_like(distA).at[0].set(dhbar)

        dist = jnp.where(go_zstar[None, :], distA,
                         jnp.where(go_refill[None, :], distB, distC))
        # W at interface k absorbs everything distributed at/below k
        w_int = jnp.cumsum(dist[::-1], 0)[::-1]               # [nl-1, N]
        w = w.at[:-1].add(-w_int / cfg.dt)
        hnode_new = hnode_new + dist
        lev_w = jnp.arange(mesh.nl)[:, None]
        w = w + jnp.where(lev_w == (mesh.ulevels_node - 1)[None, :],
                          -forcing.water_flux[None, :], 0.0)
    elif which == "zstar":
        # distribute dhbar over the column proportionally to unperturbed
        # thickness (ref :2028-2092)
        nln_min = _nlevels_node_min(mesh)
        dd1 = jnp.take_along_axis(state.zbar_3d,
                                  (nln_min - 1)[None, :].astype(jnp.int32), 0)[0]
        dd = state.zbar_3d[0] - dd1
        dd = (state.hbar - state.hbar_old) / dd
        dddt = dd / cfg.dt
        lev = jnp.arange(mesh.nl)[:, None]
        in_range = lev < (nln_min - 1)[None, :]
        w = w - jnp.where(in_range, (state.zbar_3d - dd1[None, :]) * dddt[None, :], 0.0)
        lay = jnp.arange(mesh.nl - 1)[:, None]
        lay_in = lay < (nln_min - 1)[None, :]
        hnode_new = jnp.where(
            lay_in,
            state.hnode + (state.zbar_3d[:-1] - state.zbar_3d[1:]) * dd[None, :],
            state.hnode)
        lev_w = jnp.arange(mesh.nl)[:, None]
        w = w + jnp.where(lev_w == (mesh.ulevels_node - 1)[None, :],
                          -forcing.water_flux[None, :], 0.0)
    # linfs: nothing to do

    # vertical CFL (ref :2141-2154)
    hsafe = jnp.where(mesh.node_layer_mask, hnode_new, 1.0)
    c_up = jnp.abs(w[:-1] * cfg.dt / hsafe)
    c_dn = jnp.abs(w[1:] * cfg.dt / hsafe)
    cfl = jnp.zeros_like(state.cfl_z)
    cfl = cfl.at[:-1].add(jnp.where(mesh.node_layer_mask, c_up, 0.0))
    cfl = cfl.at[1:].set(jnp.where(mesh.node_layer_mask, c_dn, 0.0) + cfl[1:])

    # explicit/implicit split (ref :2189-2203)
    if cfg.dyn.w_split:
        dd = jnp.maximum(cfl - cfg.dyn.w_max_cfl, 0.0) / max(cfg.dyn.w_max_cfl, 1e-12)
        c1f = 1.0 / (1.0 + dd)
        c2f = dd / (1.0 + dd)
        w_e = c1f * w
        w_i = c2f * w
    else:
        w_e = w
        w_i = jnp.zeros_like(w)
    return replace(state, w=w, w_e=w_e, w_i=w_i, cfl_z=cfl,
                   hnode_new=hnode_new)


def bolus_wvel(fer_u, fer_v, state: OceanState, mesh: MeshTables):
    """Vertical bolus velocity from GM bolus horizontal velocity.

    Same edge-divergence + bottom-up cumulation as vert_vel_ale's first part
    (ref :1720-1815 with fer_UV -> fer_Wvel)."""
    lmask = mesh.elem_layer_mask
    he = jnp.where(lmask, state.helem, 0.0)
    flux = edge_transport(fer_u * he, fer_v * he, mesh)
    div = jnp.concatenate([edge_divergence(flux, mesh),
                           jnp.zeros((1, mesh.n_nodes), flux.dtype)], 0)
    w = cumsum_bottom_up(div)
    return jnp.where(mesh.node_level_mask,
                     w / jnp.where(mesh.area > 0, mesh.area, 1.0), 0.0)


def _nlevels_node_min(mesh: MeshTables):
    """min over adjacent elements of nlevels (ref nlevels_nod2D_min)."""
    from .ops import halo_fix_nodes
    nie = mesh.nod_in_elem
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    nle = jnp.where(valid, jnp.take(mesh.nlevels_elem, safe), 10 ** 6)
    return halo_fix_nodes(nle.min(-1))


def update_thickness(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """hnode <- hnode_new; helem, zbar_3d, Z_3d refresh (ref :800-993)."""
    which = cfg.ale.which_ALE
    if which == "linfs":
        return state
    hnode = state.hnode_new
    # recompute interface depths bottom-up (ref :962-970)
    nln = mesh.nlevels_node
    zbot = mesh.zbar_n_bot                         # bottom depth (partial cells)
    hmask = jnp.where(mesh.node_layer_mask, hnode, 0.0)
    hsum = jnp.cumsum(jnp.flip(hmask, 0), 0)
    zbar_3d = jnp.concatenate([zbot[None, :] + jnp.flip(hsum, 0),
                               zbot[None, :]], 0)
    # below-bottom levels pinned to bottom depth
    lev = jnp.arange(mesh.nl)[:, None]
    zbar_3d = jnp.where(lev <= (nln - 1)[None, :], zbar_3d, zbot[None, :])
    Z_3d = 0.5 * (zbar_3d[:-1] + zbar_3d[1:])
    Z_3d = jnp.where(mesh.node_layer_mask, Z_3d, state.Z_3d)

    # helem = nodal mean (ref :975-990); bottom layer kept at full-cell value
    en = mesh.elem_nodes
    helem = jnp.take(hnode, en, axis=-1).mean(-1)
    lay = jnp.arange(mesh.nl - 1)[:, None]
    is_bot_e = lay == (mesh.nlevels_elem - 2)[None, :]
    helem = jnp.where(is_bot_e, state.helem, helem)
    helem = jnp.where(mesh.elem_layer_mask, helem, 0.0)
    return replace(state, hnode=hnode, helem=helem, zbar_3d=zbar_3d, Z_3d=Z_3d)
