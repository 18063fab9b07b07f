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
from ..core.ops import elem_contrib_to_nodes, elem_contrib_to_nodes_3e
from .state import IceState, IceForcing, OceanSurface, rhoice, rhosno, inv_rhowat


def mevp_dynamics(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                  ocean: OceanSurface, cfg) -> IceState:
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
    pressure_fac = jnp.where(
        has_ice_e,
        det2 * icfg.Pstar * msum * jnp.exp(-icfg.c_pressure * (1.0 - asum)),
        0.0)

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
                                            subcycle, init, unroll=4)
    return replace(ice, u_ice=u, v_ice=v, sigma11=s11, sigma12=s12,
                   sigma22=s22)
