"""Momentum dynamics: PGF application, Coriolis+AB2 rhs, flux-form advection,
horizontal viscosity, implicit vertical viscosity, velocity update.

Reference: ``src/oce_ale_vel_rhs.F90`` (compute_vel_rhs :13-148,
momentum_adv_scalar :154-343), ``src/oce_dyn.F90`` (update_vel :101-131,
compute_vel_nodes :133-169, visc_filt_bcksct :563-649, visc_filt_harmon
:236-273), ``src/oce_ale.F90`` (impl_vert_visc_ale :2348-2517),
``src/oce_ale_pressure_bv.F90`` (pressure_force_4_linfs_fullcell :432-466).
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ..constants import g, density_0
from ..mesh import MeshTables
from .state import OceanState, Forcing
from .ops import scalar_gradient, tridiag_solve, elem_to_node_mean, edge_divergence


def _elem_interface_mask(mesh: MeshTables):
    """[nl, E] True on interfaces 0..nlevels-2 (above-bottom faces)."""
    lev = jnp.arange(mesh.nl)[:, None]
    return lev < (mesh.nlevels_elem - 1)[None, :]


def pressure_force_linfs(state: OceanState, mesh: MeshTables) -> OceanState:
    """PGF from hydrostatic pressure (ref pressure_force_4_linfs_fullcell)."""
    gx, gy = scalar_gradient(state.hpressure / density_0, mesh)   # [nl-1, E]
    m = mesh.elem_layer_mask
    return replace(state, pgf_x=jnp.where(m, gx, 0.0), pgf_y=jnp.where(m, gy, 0.0))


def momentum_adv_scalar(state: OceanState, mesh: MeshTables,
                        u_rhsAB, v_rhsAB):
    """Flux-form momentum advection on scalar CVs (ref :154-343).

    Returns updated (u_rhsAB, v_rhsAB) with -div(u u) contribution added.
    """
    u, v = state.u, state.v
    nl, N = mesh.nl, mesh.n_nodes
    area = mesh.elem_area

    # ---- vertical part: w * du/dz via interface velocities ---------------
    iface = _elem_interface_mask(mesh)                     # [nl, E]
    u_up = jnp.concatenate([u[:1], 0.5 * (u[1:] + u[:-1]), jnp.zeros_like(u[:1])], 0)
    v_up = jnp.concatenate([v[:1], 0.5 * (v[1:] + v[:-1]), jnp.zeros_like(v[:1])], 0)
    u_up = jnp.where(iface, u_up, 0.0)                     # [nl, E]
    v_up = jnp.where(iface, v_up, 0.0)

    nie = mesh.nod_in_elem                                 # [N, K]
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    w_area = jnp.where(valid, jnp.take(area, safe), 0.0)   # [N, K]
    wu = (jnp.take(u_up, safe, axis=-1) * w_area).sum(-1)  # [nl, N]
    wv = (jnp.take(v_up, safe, axis=-1) * w_area).sum(-1)

    wu = wu * state.w_e
    wv = wv * state.w_e
    h = jnp.where(mesh.node_layer_mask, state.hnode, 1.0)
    un_rhs = -(wu[:-1] - wu[1:]) / (3.0 * h)               # [nl-1, N]
    vn_rhs = -(wv[:-1] - wv[1:]) / (3.0 * h)
    un_rhs = jnp.where(mesh.node_layer_mask, un_rhs, 0.0)
    vn_rhs = jnp.where(mesh.node_layer_mask, vn_rhs, 0.0)

    # ---- horizontal part: edge loop ---------------------------------------
    et1 = mesh.edge_tri[:, 0]
    et2 = mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]

    lmask = mesh.elem_layer_mask
    m1 = lmask[:, et1]                                      # [nl-1, Ed]
    m2 = jnp.where(has2[None, :], lmask[:, et2s], False)

    u1, v1 = u[:, et1], v[:, et1]
    u2, v2 = u[:, et2s], v[:, et2s]
    un1 = jnp.where(m1, v1 * dX1[None] - u1 * dY1[None], 0.0)
    un2 = jnp.where(m2, -v2 * dX2[None] + u2 * dY2[None], 0.0)

    fu = un1 * jnp.where(m1, u1, 0.0) + un2 * jnp.where(m2, u2, 0.0)
    fv = un1 * jnp.where(m1, v1, 0.0) + un2 * jnp.where(m2, v2, 0.0)

    un_rhs = un_rhs + edge_divergence(fu, mesh)
    vn_rhs = vn_rhs + edge_divergence(fv, mesh)

    un_rhs = un_rhs * mesh.areasvol_inv[:-1]
    vn_rhs = vn_rhs * mesh.areasvol_inv[:-1]

    # ---- back to elements --------------------------------------------------
    en = mesh.elem_nodes
    ue = jnp.take(un_rhs, en, axis=-1).sum(-1) / 3.0 * area[None, :]
    ve = jnp.take(vn_rhs, en, axis=-1).sum(-1) / 3.0 * area[None, :]
    u_rhsAB = u_rhsAB + jnp.where(lmask, ue, 0.0)
    v_rhsAB = v_rhsAB + jnp.where(lmask, ve, 0.0)
    return u_rhsAB, v_rhsAB


def compute_vel_rhs(state: OceanState, mesh: MeshTables, forcing: Forcing,
                    cfg) -> OceanState:
    """AB2 momentum rhs (ref compute_vel_rhs :43-137). Updates u_rhsAB too.

    Returns state with scratch rhs stored in (pgf untouched); the rhs arrays
    are returned separately via attributes u_rhs/v_rhs carried in the state
    tuple by the caller — here we stash them in place of u_rhsAB handling.
    """
    dt = cfg.dt
    eps = cfg.dyn.epsilon
    lmask = mesh.elem_layer_mask
    area = mesh.elem_area

    # AB part
    u_rhs = -(0.5 + eps) * state.u_rhsAB
    v_rhs = -(0.5 + eps) * state.v_rhsAB

    # sea level pressure contribution -g*grad(eta) (+ice/air later)
    gx, gy = scalar_gradient(-g * state.eta, mesh)          # [E]
    Fx = gx[None, :] - state.pgf_x
    Fy = gy[None, :] - state.pgf_y
    u_rhs = u_rhs + jnp.where(lmask, Fx * area[None], 0.0)
    v_rhs = v_rhs + jnp.where(lmask, Fy * area[None], 0.0)

    # Coriolis into the AB memory
    ff = mesh.coriolis * area
    u_rhsAB = jnp.where(lmask, state.v * ff[None], 0.0)
    v_rhsAB = jnp.where(lmask, -state.u * ff[None], 0.0)

    # momentum advection adds to AB memory
    if cfg.dyn.mom_adv == 2:
        u_rhsAB, v_rhsAB = momentum_adv_scalar(state, mesh, u_rhsAB, v_rhsAB)

    # combine; first step uses pure forward (ff_ab=1.0, ref :123-127)
    ff_ab = jnp.where(state.step == 0, 1.0, 1.5 + eps)
    inv_area = 1.0 / jnp.maximum(area, 1e-30)
    u_rhs = dt * (u_rhs + u_rhsAB * ff_ab) * inv_area[None]
    v_rhs = dt * (v_rhs + v_rhsAB * ff_ab) * inv_area[None]
    u_rhs = jnp.where(lmask, u_rhs, 0.0)
    v_rhs = jnp.where(lmask, v_rhs, 0.0)
    return replace(state, u_rhsAB=u_rhsAB, v_rhsAB=v_rhsAB), u_rhs, v_rhs


def visc_filt_bcksct(state: OceanState, mesh: MeshTables, cfg, u_rhs, v_rhs):
    """'Easy backscatter' harmonic viscosity filter (ref oce_dyn.F90:563-649).

    visc_option=5, the soufflet default.
    """
    dt = cfg.dt
    d = cfg.dyn
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    internal = jnp.arange(mesh.n_edges) < mesh.n_edges_in
    et2s = jnp.where(et2 >= 0, et2, 0)

    area = mesh.elem_area
    inv_a1 = 1.0 / jnp.maximum(area[et1], 1e-30)
    inv_a2 = 1.0 / jnp.maximum(area[et2s], 1e-30)
    length = jnp.sqrt(area[et1] + area[et2s])

    lmask = mesh.elem_layer_mask
    shared = jnp.logical_and(lmask[:, et1], lmask[:, et2s])
    shared = jnp.logical_and(shared, internal[None, :])

    du = state.u[:, et1] - state.u[:, et2s]
    dv = state.v[:, et1] - state.v[:, et2s]
    sp2 = du * du + dv * dv
    sp = jnp.sqrt(sp2)
    vi = dt * jnp.maximum(d.gamma0,
                          jnp.maximum(d.gamma1 * sp, d.gamma2 * sp2)) * length[None]
    du = jnp.where(shared, du * vi, 0.0)
    dv = jnp.where(shared, dv * vi, 0.0)

    # gather-based edge->element accumulation: each element touches exactly
    # its 3 edges; sign -1 when the element is the edge's left triangle
    ee = mesh.elem_edges                                  # [E, 3]
    e_is_left = mesh.edge_tri[ee, 0] == jnp.arange(mesh.n_elems)[:, None]
    esign = jnp.where(e_is_left, -1.0, 1.0)               # [E, 3]
    inv_area_e = 1.0 / jnp.maximum(area, 1e-30)
    U_b = (jnp.take(du, ee, axis=-1) * esign).sum(-1) * inv_area_e[None, :]
    V_b = (jnp.take(dv, ee, axis=-1) * esign).sum(-1) * inv_area_e[None, :]

    # smooth to nodes (area-weighted over ALL adjacent elements, no level
    # check in the denominator — matches the reference loop :619-635)
    U_c = elem_to_node_mean(U_b, mesh, respect_levels=False)
    V_c = elem_to_node_mean(V_b, mesh, respect_levels=False)

    en = mesh.elem_nodes
    Uc_e = jnp.take(U_c, en, axis=-1).mean(-1)
    Vc_e = jnp.take(V_c, en, axis=-1).mean(-1)
    u_rhs = u_rhs + jnp.where(lmask, U_b - d.easy_bs_return * Uc_e, 0.0)
    v_rhs = v_rhs + jnp.where(lmask, V_b - d.easy_bs_return * Vc_e, 0.0)
    return u_rhs, v_rhs


def visc_filt_harmon(state: OceanState, mesh: MeshTables, cfg, u_rhs, v_rhs):
    """Plain harmonic viscosity filter (ref visc_filt_harmon :236-273)."""
    dt = cfg.dt
    d = cfg.dyn
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    internal = jnp.arange(mesh.n_edges) < mesh.n_edges_in
    et2s = jnp.where(et2 >= 0, et2, 0)
    area = mesh.elem_area
    length = jnp.sqrt(area[et1] + area[et2s])
    lmask = mesh.elem_layer_mask
    shared = jnp.logical_and(jnp.logical_and(lmask[:, et1], lmask[:, et2s]),
                             internal[None, :])
    du = state.u[:, et1] - state.u[:, et2s]
    dv = state.v[:, et1] - state.v[:, et2s]
    vi = dt * d.gamma0 * length[None]
    du = jnp.where(shared, du * vi, 0.0)
    dv = jnp.where(shared, dv * vi, 0.0)
    ia1 = 1.0 / jnp.maximum(area[et1], 1e-30)
    ia2 = 1.0 / jnp.maximum(area[et2s], 1e-30)
    u_rhs = u_rhs.at[:, et1].add(-du * ia1[None]).at[:, et2s].add(du * ia2[None])
    v_rhs = v_rhs.at[:, et1].add(-dv * ia1[None]).at[:, et2s].add(dv * ia2[None])
    return u_rhs, v_rhs


def viscosity_filter(state: OceanState, mesh: MeshTables, cfg, u_rhs, v_rhs):
    """Dispatch on visc_option (ref viscosity_filter oce_dyn.F90:171-234)."""
    opt = cfg.dyn.visc_option
    if opt == 5:
        return visc_filt_bcksct(state, mesh, cfg, u_rhs, v_rhs)
    return visc_filt_harmon(state, mesh, cfg, u_rhs, v_rhs)


def impl_vert_visc(state: OceanState, mesh: MeshTables, cfg, forcing: Forcing,
                   u_rhs, v_rhs):
    """Implicit vertical viscosity, per-element tridiagonal (ref :2348-2517).

    Solves for the velocity increment, writing the result into (u_rhs, v_rhs).
    """
    dt = cfg.dt
    nl, E = mesh.nl, mesh.n_elems
    nlev = mesh.nlevels_elem                      # [E]
    lay = jnp.arange(nl - 1)[:, None]
    lmask = mesh.elem_layer_mask                  # [nl-1, E]

    # element-wise interface depths from helem, bottom-up (ref :2372-2384)
    zbot = jnp.take(mesh.zbar, nlev - 1)          # zbar_e_bot (full cells)
    hsum = jnp.cumsum(jnp.flip(jnp.where(lmask, state.helem, 0.0), 0), 0)
    zbar_n = jnp.concatenate(
        [zbot[None, :] + jnp.flip(hsum, 0), zbot[None, :]], 0)  # [nl, E]
    Z_n = 0.5 * (zbar_n[:-1] + zbar_n[1:])        # [nl-1, E] mid depths

    # Wvel_i averaged to elements
    wi_e = jnp.take(state.w_i, mesh.elem_nodes, axis=-1).mean(-1)  # [nl, E]

    h_lay = jnp.where(lmask, zbar_n[:-1] - zbar_n[1:], 1.0)
    zinv = dt / h_lay                              # [nl-1, E]
    dZ = Z_n[:-1] - Z_n[1:]                        # [nl-2, E] between mids

    Av = state.Av                                  # [nl, E] on interfaces
    is_bot = lay == (nlev - 2)[None, :]
    is_surf = lay == 0

    # viscous coefficients (zero toward surface/bottom faces, ref :2390-2424)
    a_visc = jnp.zeros((nl - 1, E), u_rhs.dtype).at[1:].set(-Av[1:-1] / dZ * zinv[1:])
    a_visc = jnp.where(is_surf, 0.0, a_visc)
    c_visc = jnp.zeros((nl - 1, E), u_rhs.dtype).at[:-1].set(-Av[1:-1] / dZ * zinv[:-1])
    c_visc = jnp.where(is_bot, 0.0, c_visc)

    # vertical advection of the implicit split (ref :2395-2437)
    wu = wi_e[:-1]                                 # interface above layer
    wd = wi_e[1:]                                  # interface below layer
    # surface row uses full wu (ref :2435), others upwind-split
    a_adv = jnp.where(is_surf, 0.0, jnp.minimum(0.0, wu) * zinv)
    b_adv_u = jnp.where(is_surf, wu * zinv, jnp.maximum(0.0, wu) * zinv)
    # below-face terms vanish on the bottom row
    b_adv_d = jnp.where(is_bot, 0.0, -jnp.minimum(0.0, wd) * zinv)
    c_adv = jnp.where(is_bot, 0.0, -jnp.maximum(0.0, wd) * zinv)

    a = a_visc + a_adv
    c = c_visc + c_adv
    b = -a_visc - c_visc + 1.0 + b_adv_u + b_adv_d

    # identity rows outside active layers
    a = jnp.where(lmask, a, 0.0)
    c = jnp.where(lmask, c, 0.0)
    b = jnp.where(lmask, b, 1.0)

    # rhs
    ur = u_rhs
    vr = v_rhs
    # surface stress (ref :2444-2451)
    sx = forcing.stress_x / density_0
    sy = forcing.stress_y / density_0
    ur = ur + jnp.where(is_surf, zinv * sx[None, :], 0.0)
    vr = vr + jnp.where(is_surf, zinv * sy[None, :], 0.0)
    # bottom friction (ref :2453-2460)
    ubot = jnp.take_along_axis(state.u, (nlev - 2)[None, :].astype(jnp.int32), 0)[0]
    vbot = jnp.take_along_axis(state.v, (nlev - 2)[None, :].astype(jnp.int32), 0)[0]
    fric = -cfg.dyn.C_d * jnp.sqrt(ubot ** 2 + vbot ** 2)
    ur = ur + jnp.where(is_bot, zinv * (fric * ubot)[None, :], 0.0)
    vr = vr + jnp.where(is_bot, zinv * (fric * vbot)[None, :], 0.0)

    # subtract operator applied to previous velocity (ref :2465-2475)
    u_prev = jnp.where(lmask, state.u, 0.0)
    v_prev = jnp.where(lmask, state.v, 0.0)
    u_up = jnp.concatenate([jnp.zeros_like(u_prev[:1]), u_prev[:-1]], 0)
    u_dn = jnp.concatenate([u_prev[1:], jnp.zeros_like(u_prev[:1])], 0)
    v_up = jnp.concatenate([jnp.zeros_like(v_prev[:1]), v_prev[:-1]], 0)
    v_dn = jnp.concatenate([v_prev[1:], jnp.zeros_like(v_prev[:1])], 0)
    ur = ur - a * u_up - (b - 1.0) * u_prev - c * u_dn
    vr = vr - a * v_up - (b - 1.0) * v_prev - c * v_dn
    ur = jnp.where(lmask, ur, 0.0)
    vr = jnp.where(lmask, vr, 0.0)

    u_new = tridiag_solve(a, b, c, ur)
    v_new = tridiag_solve(a, b, c, vr)
    u_new = jnp.where(lmask, u_new, 0.0)
    v_new = jnp.where(lmask, v_new, 0.0)
    return u_new, v_new


def update_vel(state: OceanState, mesh: MeshTables, cfg, u_rhs, v_rhs,
               d_eta) -> OceanState:
    """u^{n+1} = u + du + (-g θ dt grad(d_eta)) (ref update_vel oce_dyn.F90:101)."""
    gx, gy = scalar_gradient(-g * cfg.dyn.theta * cfg.dt * d_eta, mesh)
    lmask = mesh.elem_layer_mask
    u = jnp.where(lmask, state.u + u_rhs + gx[None, :], 0.0)
    v = jnp.where(lmask, state.v + v_rhs + gy[None, :], 0.0)
    eta = state.eta + d_eta
    return replace(state, u=u, v=v, eta=eta)


def compute_vel_nodes(state: OceanState, mesh: MeshTables) -> OceanState:
    """Element->node velocity average (ref compute_vel_nodes oce_dyn.F90:133)."""
    un = elem_to_node_mean(state.u, mesh)
    vn = elem_to_node_mean(state.v, mesh)
    nm = mesh.node_layer_mask
    return replace(state, unode=jnp.where(nm, un, 0.0),
                   vnode=jnp.where(nm, vn, 0.0))
