"""Sea-ice FCT advection: Taylor-Galerkin RHS + consistent-mass iterations +
Loehner FEM-FCT limiting.

Reference: ``src/ice_fct.F90`` — ice_TG_rhs_div :713-804, ice_update_for_div
:806-893, ice_solve_high_order :239-320, ice_solve_low_order :173-236,
ice_fem_fct :321-632, ice_mass_matrix_fill :634-709; driver sequence
ice_timestep (``ice_setup_step.F90:224-236``).

The consistent P1 mass-matrix product is evaluated matrix-free per element:
(M_c x)|_row = sum_{e∋row} area_e/12 * (x_1+x_2+x_3 + x_row),
which is exactly the assembled CSR matvec of the reference.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Tuple

import jax.numpy as jnp

from ..mesh import MeshTables
from ..core.ops import elem_contrib_to_nodes
from .state import IceState


def _mass_matvec(x, mesh: MeshTables):
    """Consistent mass matrix times node field (matrix-free, gather-based)."""
    en = mesh.elem_nodes
    xe = x[en]                          # [E, 3]
    s = xe.sum(-1)
    coef = mesh.elem_area / 12.0
    contrib = coef[:, None] * (s[:, None] + xe)           # [E, 3]
    return elem_contrib_to_nodes(contrib, mesh)


def ice_tg_rhs_div(u_ice, v_ice, fields, mesh: MeshTables, ice_dt):
    """Taylor-Galerkin rhs with divergence split (ref :713-804).

    fields: [F, N] stacked tracers (m_ice, a_ice, m_snow).
    Returns (rhs [F,N], rhs_div [F,N]).
    """
    en = mesh.elem_nodes
    dx = mesh.gradient_sca[:, 0:3]
    dy = mesh.gradient_sca[:, 3:6]
    vol = mesh.elem_area
    ue = u_ice[en]                       # [E,3]
    ve = v_ice[en]
    um = ue.sum(-1)
    vm = ve.sum(-1)
    c1 = (um * um + (ue * ue).sum(-1)) / 12.0
    c2 = (vm * vm + (ve * ve).sum(-1)) / 12.0
    c3 = (um * vm + (ve * ue).sum(-1)) / 12.0
    c4 = (dx * ue).sum(-1) + (dy * ve).sum(-1)     # divergence

    F = fields.shape[0]
    fe = fields[:, en]                   # [F, E, 3]
    fsum = fe.sum(-1)                    # [F, E]

    contrib = []
    contrib_div = []
    for n in range(3):
        # entries(q) and entries2(q) for row node n (ref :771-781)
        acc = jnp.zeros(fields.shape[:1] + (vol.shape[0],), fields.dtype)
        acc2 = jnp.zeros_like(acc)       # sum(entries2*field)
        for q in range(3):
            entries = vol * ice_dt * (
                (1.0 - 0.5 * ice_dt * c4)
                * (dx[:, n] * (um + ue[:, q]) + dy[:, n] * (vm + ve[:, q])) / 12.0
                - 0.5 * ice_dt * (c1 * dx[:, n] * dx[:, q]
                                  + c2 * dy[:, n] * dy[:, q]
                                  + c3 * (dx[:, n] * dy[:, q] + dx[:, q] * dy[:, n])))
            entries2 = 0.5 * ice_dt * (
                dx[:, n] * (um + ue[:, q]) + dy[:, n] * (vm + ve[:, q])
                - dx[:, q] * (um + ue[:, n]) - dy[:, q] * (vm + ve[:, n]))
            acc = acc + entries[None, :] * fe[:, :, q]
            acc2 = acc2 + entries2[None, :] * fe[:, :, q]
        cx = vol[None, :] * ice_dt * c4[None, :] * (fsum + fe[:, :, n] + acc2) / 12.0
        contrib.append(acc + cx)
        contrib_div.append(-cx)
    rhs = elem_contrib_to_nodes(jnp.stack(contrib, axis=-1), mesh)
    rhs_div = elem_contrib_to_nodes(jnp.stack(contrib_div, axis=-1), mesh)
    return rhs, rhs_div


def _lumped_iterate(rhs, mesh: MeshTables, n_iter=3):
    """Solve M_c d = rhs by lumped-mass Jacobi iterations (ref :239-320)."""
    area1 = mesh.area[0]
    inv_area = jnp.where(area1 > 0, 1.0 / jnp.where(area1 > 0, area1, 1.0), 0.0)
    d = rhs * inv_area[None, :]
    for _ in range(n_iter - 1):
        resid = rhs - jnp.stack([_mass_matvec(d[f], mesh)
                                 for f in range(rhs.shape[0])])
        d = d + resid * inv_area[None, :]
    return d


def ice_fct_advect(ice: IceState, mesh: MeshTables, cfg, ice_dt) -> IceState:
    """Full advection step: TG rhs -> HO/LO solutions -> FEM-FCT -> update.

    Mirrors ice_timestep's sequence ice_TG_rhs_div -> ice_fct_solve ->
    ice_update_for_div (``ice_setup_step.F90:224-231``).
    """
    gamma = cfg.ice.ice_gamma_fct
    fields = jnp.stack([ice.m_ice, ice.a_ice, ice.m_snow])   # [3, N]
    rhs, rhs_div = ice_tg_rhs_div(ice.u_ice, ice.v_ice, fields, mesh, ice_dt)

    # high-order increments (consistent mass iterations, ref :239-320)
    d_high = _lumped_iterate(rhs, mesh, n_iter=3)

    # low-order solution (ref :173-236)
    area1 = mesh.area[0]
    inv_area = jnp.where(area1 > 0, 1.0 / jnp.where(area1 > 0, area1, 1.0), 0.0)
    mc_f = jnp.stack([_mass_matvec(fields[f], mesh) for f in range(3)])
    low = (rhs + gamma * mc_f) * inv_area[None, :] + (1.0 - gamma) * fields

    # FEM-FCT limiting per field (ref ice_fem_fct :321-632)
    en = mesh.elem_nodes
    coef = mesh.elem_area / 12.0
    new_fields = []
    for f in range(3):
        x = fields[f]
        dh = d_high[f]
        lo = low[f]
        # antidiffusive element fluxes: -sum_q icoef(:,q)*(gamma*x+dh)
        # icoef = 1 everywhere, -2 on diagonal => sum = (s - 3*y_q) where
        # s=sum(y), y=gamma*x+dh  (since icoef(n,q): column q gets 1,1,1 with
        # diagonal replaced by -2 => sum_n icoef(n,q)*y_n = s - 3*y_q)
        y = gamma * x + dh
        ye = y[en]
        s = ye.sum(-1)
        # icefluxes(elem,q) = -(sum_n icoef(n,q) y_n) * vol/(12*area(q))
        # with icoef=1 except -2 on the diagonal => sum_n = s - 3*y_q
        flux_q = -(s[:, None] - 3.0 * ye) * mesh.elem_area[:, None] / 12.0
        flux_q = flux_q / jnp.maximum(area1[en], 1e-30)

        # cluster min/max of the low-order solution over node neighborhoods:
        # nn_pos = node itself + edge neighbors; implement via edge scatter max
        n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]
        tmax = lo
        tmin = lo
        big = jnp.finfo(lo.dtype).max
        nb_max = jnp.full_like(lo, -big).at[n0].max(lo[n1]).at[n1].max(lo[n0])
        nb_min = jnp.full_like(lo, big).at[n0].min(lo[n1]).at[n1].min(lo[n0])
        tmax = jnp.maximum(tmax, nb_max) - lo
        tmin = jnp.minimum(tmin, nb_min) - lo

        # sums of +/- fluxes (gather-based)
        pplus = elem_contrib_to_nodes(jnp.maximum(flux_q, 0.0), mesh)
        pminus = elem_contrib_to_nodes(jnp.minimum(flux_q, 0.0), mesh)
        pplus = jnp.where(jnp.abs(pplus) > 0,
                          jnp.minimum(1.0, tmax / jnp.where(pplus != 0, pplus, 1.0)),
                          0.0)
        pminus = jnp.where(jnp.abs(pminus) > 0,
                           jnp.minimum(1.0, tmin / jnp.where(pminus != 0, pminus, 1.0)),
                           0.0)

        # element limiting factor ae = min over its 3 nodes
        ae = jnp.ones(en.shape[0], lo.dtype)
        for k in range(3):
            fk = flux_q[:, k]
            fac = jnp.where(fk >= 0, pplus[en[:, k]], pminus[en[:, k]])
            ae = jnp.minimum(ae, fac)

        out = lo + elem_contrib_to_nodes(ae[:, None] * flux_q, mesh)
        new_fields.append(out)

    m_ice, a_ice, m_snow = new_fields

    # divergence part (ref ice_update_for_div :806-893)
    d_div = _lumped_iterate(rhs_div, mesh, n_iter=3)
    m_ice = m_ice + d_div[0]
    a_ice = a_ice + d_div[1]
    m_snow = m_snow + d_div[2]

    # cut_off (ref ice_thermo_oce.F90:2-63)
    a_ice = jnp.minimum(a_ice, 1.0)
    a_ice = jnp.where(a_ice < 1e-9, 0.0, a_ice)
    m_ice = jnp.where(m_ice < 1e-9, 0.0, m_ice)
    return replace(ice, m_ice=m_ice, a_ice=a_ice, m_snow=m_snow)
