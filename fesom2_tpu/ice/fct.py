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
from ..core.ops import elem_contrib_to_nodes, halo_fix_nodes
from .state import IceState


def _mass_matvec(x, mesh: MeshTables):
    """Consistent mass matrix times node field(s) [..., N] (matrix-free,
    gather-based; batched over any leading axes)."""
    en = mesh.elem_nodes
    xe = x[..., en]                     # [..., E, 3]
    s = xe.sum(-1)
    coef = mesh.elem_area / 12.0
    contrib = coef[:, None] * (s[..., None] + xe)         # [..., E, 3]
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
    """Solve M_c d = rhs by lumped-mass Jacobi iterations (ref :239-320);
    rhs [..., N], batched."""
    area1 = mesh.area[0]
    inv_area = jnp.where(area1 > 0, 1.0 / jnp.where(area1 > 0, area1, 1.0), 0.0)
    d = rhs * inv_area
    for _ in range(n_iter - 1):
        resid = rhs - _mass_matvec(d, mesh)
        d = d + resid * inv_area
    return d


def fct_advect_fields(u_ice, v_ice, fields, mesh: MeshTables, gamma, ice_dt):
    """Advect a stack of node scalars [F, N] with the TG/FEM-FCT scheme,
    fully vectorized over F (used for both the 3-field FESIM state and the
    ~60-field icepack category-tracer stack, like fct_solve_icepack,
    ``icedrv_advection.F90:581-599``).

    Returns the new fields [F, N]."""
    rhs, rhs_div = ice_tg_rhs_div(u_ice, v_ice, fields, mesh, ice_dt)

    # high-order increments (consistent mass iterations, ref :239-320)
    d_high = _lumped_iterate(rhs, mesh, n_iter=3)

    # low-order solution (ref :173-236)
    area1 = mesh.area[0]
    inv_area = jnp.where(area1 > 0, 1.0 / jnp.where(area1 > 0, area1, 1.0), 0.0)
    low = (rhs + gamma * _mass_matvec(fields, mesh)) * inv_area \
        + (1.0 - gamma) * fields

    # FEM-FCT limiting (ref ice_fem_fct :321-632), batched over F
    en = mesh.elem_nodes
    # antidiffusive element fluxes: -sum_q icoef(:,q)*(gamma*x+dh) with
    # icoef = 1 everywhere, -2 on the diagonal => sum_n icoef(n,q)*y_n
    # = s - 3*y_q where s = sum(y)
    y = gamma * fields + d_high
    ye = y[..., en]                                       # [F, E, 3]
    s = ye.sum(-1)
    flux_q = -(s[..., None] - 3.0 * ye) * mesh.elem_area[:, None] / 12.0
    flux_q = flux_q / jnp.maximum(area1[en], 1e-30)

    # cluster min/max of the low-order solution over node neighborhoods,
    # gather-based over the precomputed 1-ring table (TPU scatters with
    # min/max combiners are slow AND flip the chip into a degraded gather
    # mode for the whole program — see Model.statics docstring)
    nn = mesh.node_neighbors.T                            # [KE, N]
    nvalid = nn >= 0
    nsafe = jnp.where(nvalid, nn, 0)
    big = jnp.finfo(low.dtype).max
    # (low, -low) stacked: one merged neighbor gather pass serves the max
    # and the min cluster bound (-max(-x) == min(x) exactly); chunked over
    # the neighbor slots (the [2, F, KE, N] block is ~1 GB for the icepack
    # category-tracer stack at CORE2+ scale)
    from ..core.ops import take_last
    lp = jnp.stack([low, -low])
    nbp = None
    for kk in range(nn.shape[0]):
        v = jnp.where(nvalid[kk], take_last(lp, nsafe[kk]), -big)
        nbp = v if nbp is None else jnp.maximum(nbp, v)
    nbp = halo_fix_nodes(nbp)                             # [2, F, N]
    nb_max, nb_min = nbp[0], -nbp[1]
    tmax = jnp.maximum(low, nb_max) - low
    tmin = jnp.minimum(low, nb_min) - low

    # sums of +/- fluxes (one merged gather) -> nodal limiting factors
    ppair = elem_contrib_to_nodes(
        jnp.stack([jnp.maximum(flux_q, 0.0), jnp.minimum(flux_q, 0.0)]),
        mesh)
    pplus, pminus = ppair[0], ppair[1]
    pplus = jnp.where(jnp.abs(pplus) > 0,
                      jnp.minimum(1.0, tmax / jnp.where(pplus != 0, pplus, 1.0)),
                      0.0)
    pminus = jnp.where(jnp.abs(pminus) > 0,
                       jnp.minimum(1.0, tmin / jnp.where(pminus != 0, pminus, 1.0)),
                       0.0)

    # element limiting factor ae = min over its 3 nodes (merged gather)
    pm = take_last(jnp.stack([pplus, pminus]), en)        # [2, F, E, 3]
    fac = jnp.where(flux_q >= 0, pm[0], pm[1])            # [F, E, 3]
    ae = fac.min(-1)
    out = low + elem_contrib_to_nodes(ae[..., None] * flux_q, mesh)

    # divergence part (ref ice_update_for_div :806-893)
    d_div = _lumped_iterate(rhs_div, mesh, n_iter=3)
    return out + d_div


def ice_fct_advect(ice: IceState, mesh: MeshTables, cfg, ice_dt) -> IceState:
    """Full advection step for the FESIM 3-field state: TG rhs -> HO/LO
    solutions -> FEM-FCT -> update.

    Mirrors ice_timestep's sequence ice_TG_rhs_div -> ice_fct_solve ->
    ice_update_for_div (``ice_setup_step.F90:224-231``).
    """
    gamma = cfg.ice.ice_gamma_fct
    fields = jnp.stack([ice.m_ice, ice.a_ice, ice.m_snow])   # [3, N]
    m_ice, a_ice, m_snow = fct_advect_fields(ice.u_ice, ice.v_ice, fields,
                                             mesh, gamma, ice_dt)

    # cut_off (ref ice_thermo_oce.F90:2-63)
    a_ice = jnp.minimum(a_ice, 1.0)
    a_ice = jnp.where(a_ice < 1e-9, 0.0, a_ice)
    m_ice = jnp.where(m_ice < 1e-9, 0.0, m_ice)
    return replace(ice, m_ice=m_ice, a_ice=a_ice, m_snow=m_snow)
