"""Sea-ice dynamics: mEVP solver (Bouillon et al. 2013 style).

Reference: ``src/ice_maEVP.F90`` EVPdynamics_m :273-602 (the CI default,
whichEVP=1; ``setups/test_pi/setup.yml:30``).  Each pseudotime iteration:
element stress update -> stress-divergence scatter to nodes -> point-implicit
node update with Coriolis + ocean drag -> Dirichlet coastal BC.  On TPU the
whole subcycle loop is a lax.fori_loop living entirely on-device; the per-
subcycle halo exchange of the reference (:588-595) is subsumed by XLA/GSPMD
collectives when sharded.
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..constants import g, density_0
from ..mesh import MeshTables
from ..core.ops import (elem_contrib_to_nodes, elem_contrib_to_nodes_3e,
                        halo_fix_nodes, halo_fix_elems)
from .state import IceState, IceForcing, OceanSurface, rhoice, rhosno, inv_rhowat


# fori_loop unroll factor for the EVP pseudotime subcycles (tunable;
# scripts/profile_evp.py measures the sensitivity)
UNROLL = 4


def mevp_dynamics(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                  ocean: OceanSurface, cfg, strength_node=None) -> IceState:
    icfg = cfg.ice
    ice_dt = cfg.dt * icfg.ice_ave_steps
    alpha = icfg.alpha_evp
    beta = icfg.beta_evp
    vale = 1.0 / icfg.ellipse ** 2
    det2 = 1.0 / (1.0 + alpha)
    det1 = alpha * det2
    en = mesh.elem_nodes                       # [E, 3]
    dx = mesh.gradient_sca[:, 0:3]             # [E, 3]
    dy = mesh.gradient_sca[:, 3:6]
    meancos = mesh.metric_factor / 3.0         # [E]
    area1 = mesh.area[0]                       # [N]
    area1s = jnp.where(area1 > 0, area1, 1.0)

    # ---- elevation (+ ice loading) pressure rhs (ref :338-390) -----------
    eta_e = ocean.elevation[en]                # [E, 3]
    bb = g * mesh.elem_area / 3.0
    aa_e = bb * (dx * eta_e).sum(-1)
    bb_e = bb * (dy * eta_e).sum(-1)
    rhs_a = elem_contrib_to_nodes(jnp.broadcast_to(-aa_e[:, None], aa_e.shape + (3,)), mesh)
    rhs_m = elem_contrib_to_nodes(jnp.broadcast_to(-bb_e[:, None], bb_e.shape + (3,)), mesh)

    # ---- per-node precomputes (ref :393-410) -----------------------------
    has_ice_n = ice.a_ice >= 0.01
    thick = (rhoice * ice.m_ice + rhosno * ice.m_snow) / jnp.maximum(ice.a_ice, 0.01)
    inv_thickness = jnp.where(has_ice_n, 1.0 / jnp.maximum(thick, 9.0), 0.0)
    mass = rhoice * ice.m_ice + rhosno * ice.m_snow
    mass = jnp.where(has_ice_n, mass / ((1.0 + mass * mass) * area1s), 0.0)
    rhs_a = jnp.where(has_ice_n, rhs_a / area1s, 0.0)
    rhs_m = jnp.where(has_ice_n, rhs_m / area1s, 0.0)

    # ---- per-element pressure factor (ref :413-428) ----------------------
    msum = ice.m_ice[en].mean(-1)
    asum = ice.a_ice[en].mean(-1)
    has_ice_e = msum > 0.01
    if strength_node is not None:
        # icepack strength field: element pressure from the node mean
        # (ref ice_maEVP.F90:97-98, __icepack branch)
        p_e = strength_node[en].mean(-1)
    else:
        p_e = icfg.Pstar * msum * jnp.exp(-icfg.c_pressure * (1.0 - asum))
    pressure_fac = jnp.where(has_ice_e, det2 * p_e, 0.0)

    rdt = ice_dt
    cor = mesh.coriolis_node
    bc = mesh.bc_index_node

    enT = en.T                                 # [3, E] vertex-major gathers
    dxT = dx.T
    dyT = dy.T

    def subcycle(_, carry):
        u, v, s11, s12, s22 = carry
        uv = jnp.stack([u, v])                      # [2, N]
        uve = jnp.take(uv, enT, axis=-1)            # [2, 3, E]
        ue, ve = uve[0], uve[1]
        eps11 = (dxT * ue).sum(0) - ve.sum(0) * meancos
        eps22 = (dyT * ve).sum(0)
        eps12 = 0.5 * ((dyT * ue).sum(0) + (dxT * ve).sum(0)
                       + ue.sum(0) * meancos)
        eps1 = eps11 + eps22
        eps2 = eps11 - eps22
        delta = jnp.sqrt(eps1 ** 2 + vale * (eps2 ** 2 + 4.0 * eps12 ** 2))
        pressure = pressure_fac / (delta + icfg.delta_min)
        s12 = jnp.where(has_ice_e, det1 * s12 + pressure * eps12 * vale, s12)
        s11 = jnp.where(has_ice_e,
                        det1 * s11 + 0.5 * pressure * (eps1 - delta + eps2 * vale), s11)
        s22 = jnp.where(has_ice_e,
                        det1 * s22 + 0.5 * pressure * (eps1 - delta - eps2 * vale), s22)

        # stress divergence to nodes (ref :516-545), gather-based, [2, 3, E]
        ea = jnp.where(has_ice_e, mesh.elem_area, 0.0)
        fu = -ea * (s11 * dxT + s12 * (dyT + meancos))
        fv = -ea * (s12 * dxT + s22 * dyT - s11 * meancos)
        rhs2 = elem_contrib_to_nodes_3e(jnp.stack([fu, fv]), mesh)
        u_rhs, v_rhs = rhs2[0], rhs2[1]

        u_rhs = u_rhs * mass + rhs_a
        v_rhs = v_rhs * mass + rhs_m

        # point-implicit node update (ref :561-576)
        umod = jnp.sqrt((u - ocean.u_w) ** 2 + (v - ocean.v_w) ** 2)
        drag = rdt * icfg.Cd_oce_ice * umod * density_0 * inv_thickness
        rhsu = ice.u_ice + drag * ocean.u_w \
            + rdt * (inv_thickness * forcing.stress_atmice_x + u_rhs) + beta * u
        rhsv = ice.v_ice + drag * ocean.v_w \
            + rdt * (inv_thickness * forcing.stress_atmice_y + v_rhs) + beta * v
        det = bc / ((1.0 + beta + drag) ** 2 + (rdt * cor) ** 2)
        u_new = det * ((1.0 + beta + drag) * rhsu + rdt * cor * rhsv)
        v_new = det * ((1.0 + beta + drag) * rhsv - rdt * cor * rhsu)
        u_new = jnp.where(has_ice_n, u_new, u)
        v_new = jnp.where(has_ice_n, v_new, v)
        # coastal Dirichlet BC is implicit in bc_index_node (det=0 there)
        u_new = u_new * bc
        v_new = v_new * bc
        return (u_new, v_new, s11, s12, s22)

    init = (ice.u_ice, ice.v_ice, ice.sigma11, ice.sigma12, ice.sigma22)
    u, v, s11, s12, s22 = jax.lax.fori_loop(0, icfg.evp_rheol_steps,
                                            subcycle, init, unroll=UNROLL)
    return replace(ice, u_ice=u, v_ice=v, sigma11=s11, sigma12=s12,
                   sigma22=s22)


def evp_dynamics(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                 ocean: OceanSurface, cfg) -> IceState:
    """Standard EVP (whichEVP=0): explicit pseudotime with elastic relaxation
    time Tevp = ice_dt/3 (ref ice_EVP.F90 EVPdynamics :397-667,
    stress_tensor :23-132, stress2rhs :325-393; Tevp_inv ice_setup_step.F90:33).
    """
    icfg = cfg.ice
    ice_dt = cfg.dt * icfg.ice_ave_steps
    steps = icfg.evp_rheol_steps
    dte = ice_dt / steps
    tevp_inv = 3.0 / ice_dt
    det = 1.0 / (1.0 + 0.5 * tevp_inv * dte)
    vale = 1.0 / icfg.ellipse ** 2
    ax = jnp.cos(icfg.theta_io)
    ay = jnp.sin(icfg.theta_io)
    en = mesh.elem_nodes
    dx = mesh.gradient_sca[:, 0:3]
    dy = mesh.gradient_sca[:, 3:6]
    meancos = mesh.metric_factor / 3.0
    area1 = mesh.area[0]
    area1s = jnp.where(area1 > 0, area1, 1.0)

    # element ice strength: zero when ANY vertex is ice-free (ref :493-502)
    m_e = ice.m_ice[en]
    a_e = ice.a_ice[en]
    has_ice_e = jnp.logical_and((m_e > 0.0).all(-1), (a_e > 0.0).all(-1))
    strength = jnp.where(
        has_ice_e,
        0.5 * icfg.Pstar * m_e.mean(-1)
        * jnp.exp(-icfg.c_pressure * (1.0 - a_e.mean(-1))),
        0.0)

    # elevation gradient rhs, gated on ice presence (ref :571-579)
    eta_e = ocean.elevation[en]
    aa = jnp.where(has_ice_e, g * mesh.elem_area / 3.0, 0.0)
    aa_e = aa * (dx * eta_e).sum(-1)
    bb_e = aa * (dy * eta_e).sum(-1)
    rhs_a = elem_contrib_to_nodes_3e(
        jnp.broadcast_to(-aa_e, (3,) + aa_e.shape), mesh) / area1s
    rhs_m = elem_contrib_to_nodes_3e(
        jnp.broadcast_to(-bb_e, (3,) + bb_e.shape), mesh) / area1s

    # node precomputes (ref :459-482)
    mass_n = rhoice * ice.m_ice + rhosno * ice.m_snow
    inv_areamass = jnp.where(mass_n > 1e-3, 1.0 / (area1s * mass_n), 0.0)
    has_ice_n = ice.a_ice >= 0.01
    inv_mass = jnp.where(
        has_ice_n,
        1.0 / jnp.maximum(mass_n / jnp.maximum(ice.a_ice, 0.01), 9.0), 0.0)

    cor = mesh.coriolis_node
    bc = mesh.bc_index_node
    enT = en.T
    dxT = dx.T
    dyT = dy.T

    def subcycle(_, carry):
        u, v, s11, s12, s22 = carry
        uve = jnp.take(jnp.stack([u, v]), enT, axis=-1)    # [2, 3, E]
        ue, ve = uve[0], uve[1]
        eps11 = (dxT * ue).sum(0) - ve.sum(0) * meancos
        eps22 = (dyT * ve).sum(0)
        eps12 = 0.5 * ((dyT * ue).sum(0) + (dxT * ve).sum(0)
                       + ue.sum(0) * meancos)
        eps1 = eps11 + eps22
        eps2 = eps11 - eps22
        delta = jnp.sqrt(eps1 ** 2 + vale * (eps2 ** 2 + 4.0 * eps12 ** 2))
        zeta = strength / jnp.maximum(delta, icfg.delta_min) * tevp_inv
        r1 = zeta * eps1 - strength * tevp_inv
        r2 = zeta * eps2 * vale
        r3 = zeta * eps12 * vale
        si1 = det * (s11 + s22 + dte * r1)
        si2 = det * (s11 - s22 + dte * r2)
        s12 = jnp.where(has_ice_e, det * (s12 + dte * r3), s12)
        s11 = jnp.where(has_ice_e, 0.5 * (si1 + si2), s11)
        s22 = jnp.where(has_ice_e, 0.5 * (si1 - si2), s22)

        ea = jnp.where(has_ice_e, mesh.elem_area, 0.0)
        fu = -ea * (s11 * dxT + s12 * (dyT + meancos))
        fv = -ea * (s12 * dxT + s22 * dyT - s11 * meancos)
        rhs2 = elem_contrib_to_nodes_3e(jnp.stack([fu, fv]), mesh)
        u_rhs = rhs2[0] * inv_areamass + rhs_a
        v_rhs = rhs2[1] * inv_areamass + rhs_m

        # explicit pseudotime update, implicit drag+Coriolis (ref :601-637)
        umod = jnp.sqrt((u - ocean.u_w) ** 2 + (v - ocean.v_w) ** 2)
        drag = icfg.Cd_oce_ice * umod * density_0 * inv_mass
        rhsu = u + dte * (drag * (ax * ocean.u_w - ay * ocean.v_w)
                          + inv_mass * forcing.stress_atmice_x + u_rhs)
        rhsv = v + dte * (drag * (ax * ocean.v_w + ay * ocean.u_w)
                          + inv_mass * forcing.stress_atmice_y + v_rhs)
        r_a = 1.0 + ax * drag * dte
        r_b = dte * (cor + ay * drag)
        idet = bc / (r_a ** 2 + r_b ** 2)
        u_new = jnp.where(has_ice_n, idet * (r_a * rhsu + r_b * rhsv), 0.0)
        v_new = jnp.where(has_ice_n, idet * (r_a * rhsv - r_b * rhsu), 0.0)
        return (u_new, v_new, s11, s12, s22)

    init = (ice.u_ice, ice.v_ice, ice.sigma11, ice.sigma12, ice.sigma22)
    u, v, s11, s12, s22 = jax.lax.fori_loop(0, steps, subcycle, init,
                                            unroll=UNROLL)
    return replace(ice, u_ice=u, v_ice=v, sigma11=s11, sigma12=s12,
                   sigma22=s22)


def aevp_dynamics(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                  ocean: OceanSurface, cfg) -> IceState:
    """Adaptive EVP (whichEVP=2, Kimmritz et al. 2016): mEVP with per-element
    alpha / per-node beta stability fields refreshed after each solve
    (ref ice_maEVP.F90 EVPdynamics_a :785-888, stress_tensor_a :686-781,
    find_alpha_field_a :611-683, find_beta_field_a :892-922).
    """
    icfg = cfg.ice
    ice_dt = cfg.dt * icfg.ice_ave_steps
    vale = 1.0 / icfg.ellipse ** 2
    en = mesh.elem_nodes
    dx = mesh.gradient_sca[:, 0:3]
    dy = mesh.gradient_sca[:, 3:6]
    meancos = mesh.metric_factor / 3.0
    area1 = mesh.area[0]
    area1s = jnp.where(area1 > 0, area1, 1.0)

    # elevation rhs (ssh2rhs, levitating branch) and node precomputes are
    # shared with mEVP (ref EVPdynamics_m :338-410)
    eta_e = ocean.elevation[en]
    bb = g * mesh.elem_area / 3.0
    aa_e = bb * (dx * eta_e).sum(-1)
    bb_e = bb * (dy * eta_e).sum(-1)
    rhs_a = elem_contrib_to_nodes_3e(
        jnp.broadcast_to(-aa_e, (3,) + aa_e.shape), mesh) / area1s
    rhs_m = elem_contrib_to_nodes_3e(
        jnp.broadcast_to(-bb_e, (3,) + bb_e.shape), mesh) / area1s

    has_ice_n = ice.a_ice >= 0.01
    thick = (rhoice * ice.m_ice + rhosno * ice.m_snow) \
        / jnp.maximum(ice.a_ice, 0.01)
    inv_thickness = jnp.where(has_ice_n, 1.0 / jnp.maximum(thick, 9.0), 0.0)
    mass = rhoice * ice.m_ice + rhosno * ice.m_snow
    mass = mass / ((1.0 + mass * mass) * area1s)

    msum = ice.m_ice[en].mean(-1)
    asum = ice.a_ice[en].mean(-1)
    has_ice_e = msum > 0.01
    p0 = icfg.Pstar * msum * jnp.exp(-icfg.c_pressure * (1.0 - asum))

    alpha = ice.alpha_aevp
    beta = ice.beta_aevp
    det2_e = 1.0 / (1.0 + alpha)
    det1_e = alpha * det2_e

    rdt = ice_dt
    cor = mesh.coriolis_node
    bc = mesh.bc_index_node
    enT = en.T
    dxT = dx.T
    dyT = dy.T

    def strain(u, v):
        uve = jnp.take(jnp.stack([u, v]), enT, axis=-1)
        ue, ve = uve[0], uve[1]
        eps11 = (dxT * ue).sum(0) - ve.sum(0) * meancos
        eps22 = (dyT * ve).sum(0)
        eps12 = 0.5 * ((dyT * ue).sum(0) + (dxT * ve).sum(0)
                       + ue.sum(0) * meancos)
        eps1 = eps11 + eps22
        eps2 = eps11 - eps22
        delta = jnp.sqrt(eps1 ** 2 + vale * (eps2 ** 2 + 4.0 * eps12 ** 2))
        return eps1, eps2, eps12, delta

    def subcycle(_, carry):
        u, v, s11, s12, s22 = carry
        eps1, eps2, eps12, delta = strain(u, v)
        pressure = p0 / (delta + icfg.delta_min)
        r1 = pressure * (eps1 - delta)
        r2 = pressure * eps2 * vale
        r3 = pressure * eps12 * vale
        si1 = det1_e * (s11 + s22) + det2_e * r1
        si2 = det1_e * (s11 - s22) + det2_e * r2
        s12 = jnp.where(has_ice_e, det1_e * s12 + det2_e * r3, s12)
        s11 = jnp.where(has_ice_e, 0.5 * (si1 + si2), s11)
        s22 = jnp.where(has_ice_e, 0.5 * (si1 - si2), s22)

        ea = jnp.where(has_ice_e, mesh.elem_area, 0.0)
        fu = -ea * (s11 * dxT + s12 * (dyT + meancos))
        fv = -ea * (s12 * dxT + s22 * dyT - s11 * meancos)
        rhs2 = elem_contrib_to_nodes_3e(jnp.stack([fu, fv]), mesh)
        u_rhs = rhs2[0] * mass + rhs_a
        v_rhs = rhs2[1] * mass + rhs_m

        umod = jnp.sqrt((u - ocean.u_w) ** 2 + (v - ocean.v_w) ** 2)
        drag = rdt * icfg.Cd_oce_ice * umod * density_0 * inv_thickness
        rhsu = ice.u_ice + drag * ocean.u_w \
            + rdt * (inv_thickness * forcing.stress_atmice_x + u_rhs) + beta * u
        rhsv = ice.v_ice + drag * ocean.v_w \
            + rdt * (inv_thickness * forcing.stress_atmice_y + v_rhs) + beta * v
        fc = rdt * cor
        idet = bc / ((1.0 + beta + drag) ** 2 + fc ** 2)
        u_new = idet * ((1.0 + beta + drag) * rhsu + fc * rhsv)
        v_new = idet * ((1.0 + beta + drag) * rhsv - fc * rhsu)
        return (u_new, v_new, s11, s12, s22)

    init = (ice.u_ice, ice.v_ice, ice.sigma11, ice.sigma12, ice.sigma22)
    u, v, s11, s12, s22 = jax.lax.fori_loop(0, icfg.evp_rheol_steps,
                                            subcycle, init, unroll=UNROLL)

    # refresh alpha/beta from the converged velocity (ref :880-887)
    _, _, _, delta = strain(u, v)
    p_adapt = icfg.Pstar * jnp.exp(-icfg.c_pressure * (1.0 - asum)) \
        / (delta + icfg.delta_min)
    alpha_new = jnp.maximum(
        50.0, jnp.sqrt(ice_dt * icfg.c_aevp * p_adapt
                       / rhoice / mesh.elem_area))
    alpha = jnp.where(has_ice_e, alpha_new, alpha)
    # beta = max of alpha over the node's adjacent elements
    nie = mesh.nod_in_elem.T                     # [K, N]
    valid = nie >= 0
    av = jnp.where(valid, jnp.take(alpha, jnp.where(valid, nie, 0)), 50.0)
    beta = halo_fix_nodes(av.max(0))

    return replace(ice, u_ice=u, v_ice=v, sigma11=s11, sigma12=s12,
                   sigma22=s22, alpha_aevp=alpha, beta_aevp=beta)


def ice_dynamics(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                 ocean: OceanSurface, cfg, strength_node=None,
                 sub=None) -> IceState:
    """Dispatch on whichEVP (ref ice_setup_step.F90:195-208).

    strength_node (icepack builds): per-node ice strength replacing the
    Hibler P* closure inside the rheology (ref ice_maEVP.F90:46-98).

    sub (IceSubdomain): restrict the subcycle loop to the polar caps —
    exact while all ice stays inside (see ice/subdomain.py)."""
    if sub is not None:
        return ice_dynamics_sub(ice, mesh, sub, forcing, ocean, cfg,
                                strength_node=strength_node)
    which = cfg.ice.whichEVP
    if which == 0:
        return evp_dynamics(ice, mesh, forcing, ocean, cfg)
    if which == 2:
        return aevp_dynamics(ice, mesh, forcing, ocean, cfg)
    return mevp_dynamics(ice, mesh, forcing, ocean, cfg,
                         strength_node=strength_node)


def ice_dynamics_sub(ice: IceState, mesh: MeshTables, sub,
                     forcing: IceForcing, ocean: OceanSurface, cfg,
                     strength_node=None) -> IceState:
    """EVP on the ice subdomain: one packed gather in, the unchanged
    kernels on restricted tables (IceSubdomain duck-types the MeshTables
    fields they read), unique-index scatter of (u,v) and stresses out."""
    g = sub.sub_nodes
    ge = sub.sub_elems
    which = cfg.ice.whichEVP
    nodal = [ice.u_ice, ice.v_ice, ice.m_ice, ice.a_ice, ice.m_snow,
             forcing.stress_atmice_x, forcing.stress_atmice_y,
             ocean.u_w, ocean.v_w, ocean.elevation]
    if strength_node is not None:
        nodal.append(strength_node)
    if which == 2:
        nodal.append(ice.beta_aevp)
    loc = jnp.take(jnp.stack(nodal), g, axis=-1)
    elem = [ice.sigma11, ice.sigma12, ice.sigma22]
    if which == 2:
        elem.append(ice.alpha_aevp)
    se = jnp.take(jnp.stack(elem), ge, axis=-1)

    ice_l = replace(ice, u_ice=loc[0], v_ice=loc[1], m_ice=loc[2],
                    a_ice=loc[3], m_snow=loc[4],
                    sigma11=se[0], sigma12=se[1], sigma22=se[2],
                    alpha_aevp=se[3] if which == 2 else ice.alpha_aevp,
                    beta_aevp=loc[-1] if which == 2 else ice.beta_aevp)
    forcing_l = replace(forcing, stress_atmice_x=loc[5],
                        stress_atmice_y=loc[6])
    ocean_l = replace(ocean, u_w=loc[7], v_w=loc[8], elevation=loc[9])
    sn_l = loc[10] if strength_node is not None else None

    if which == 0:
        out = evp_dynamics(ice_l, sub, forcing_l, ocean_l, cfg)
    elif which == 2:
        out = aevp_dynamics(ice_l, sub, forcing_l, ocean_l, cfg)
    else:
        out = mevp_dynamics(ice_l, sub, forcing_l, ocean_l, cfg,
                            strength_node=sn_l)

    uv = jnp.stack([ice.u_ice, ice.v_ice]) \
        .at[:, g].set(jnp.stack([out.u_ice, out.v_ice]))
    sig_new = [out.sigma11, out.sigma12, out.sigma22]
    sig_old = [ice.sigma11, ice.sigma12, ice.sigma22]
    if which == 2:
        sig_new.append(out.alpha_aevp)
        sig_old.append(ice.alpha_aevp)
    sig = jnp.stack(sig_old).at[:, ge].set(jnp.stack(sig_new))
    res = replace(ice, u_ice=uv[0], v_ice=uv[1],
                  sigma11=sig[0], sigma12=sig[1], sigma22=sig[2])
    if which == 2:
        res = replace(res, alpha_aevp=sig[3],
                      beta_aevp=ice.beta_aevp.at[g].set(out.beta_aevp))
    return res


def ridging_rates(ice: IceState, mesh: MeshTables, cfg):
    """Node-level convergence / shear closing rates for the icepack
    mechanical redistribution, from the post-solve velocity field:
    rdg_conv = -min(div,0), rdg_shear = 0.5*(Delta - |div|)
    (ref ice_maEVP.F90:115-127 __icepack branch; element values averaged
    to nodes like icepack_to_fesom)."""
    vale = 1.0 / cfg.ice.ellipse ** 2
    en = mesh.elem_nodes
    dx = mesh.gradient_sca[:, 0:3]
    dy = mesh.gradient_sca[:, 3:6]
    meancos = mesh.metric_factor / 3.0
    ue = ice.u_ice[en]
    ve = ice.v_ice[en]
    eps11 = (dx * ue).sum(-1) - ve.sum(-1) * meancos
    eps22 = (dy * ve).sum(-1)
    eps12 = 0.5 * ((dy * ue).sum(-1) + (dx * ve).sum(-1)
                   + ue.sum(-1) * meancos)
    div = eps11 + eps22
    eps2 = eps11 - eps22
    delta = jnp.sqrt(div ** 2 + vale * (eps2 ** 2 + 4.0 * eps12 ** 2))
    conv_e = jnp.maximum(-div, 0.0)
    shear_e = 0.5 * (delta - jnp.abs(div))
    # area-weighted element -> node average
    w = mesh.elem_area / 3.0
    area1 = mesh.area[0]
    inv = jnp.where(area1 > 0, 1.0 / jnp.where(area1 > 0, area1, 1.0), 0.0)
    conv = elem_contrib_to_nodes(
        jnp.broadcast_to((conv_e * w)[:, None], (conv_e.shape[0], 3)),
        mesh) * inv
    shear = elem_contrib_to_nodes(
        jnp.broadcast_to((shear_e * w)[:, None], (shear_e.shape[0], 3)),
        mesh) * inv
    return conv, shear
