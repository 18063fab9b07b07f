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

from ..constants import g, density_0, r_earth
from ..mesh import MeshTables
from .state import OceanState, Forcing
from .ops import (halo_fix_nodes, halo_fix_elems,
                  scalar_gradient, tridiag_solve, elem_to_node_mean,
                  edge_divergence, cumsum_bottom_up, elem_contrib_to_nodes,
                  take_last)


def _elem_interface_mask(mesh: MeshTables):
    """[nl, E] True on interfaces ulevels-1..nlevels-2 (the element's
    active faces; upper bound from bathymetry, lower from cavities)."""
    lev = jnp.arange(mesh.nl)[:, None]
    return (lev < (mesh.nlevels_elem - 1)[None, :]) \
        & (lev >= (mesh.ulevels_elem - 1)[None, :])


def pressure_force_linfs(state: OceanState, mesh: MeshTables) -> OceanState:
    """PGF from hydrostatic pressure (ref pressure_force_4_linfs_fullcell)."""
    gx, gy = scalar_gradient(state.hpressure / density_0, mesh)   # [nl-1, E]
    m = mesh.elem_layer_mask
    return replace(state, pgf_x=jnp.where(m, gx, 0.0), pgf_y=jnp.where(m, gy, 0.0))


def _pgf_vertex_stencil(mesh: MeshTables):
    """Per-vertex 3-point vertical stencil for the moving-coordinate PGFs
    (ref oce_ale_pressure_bv.F90:2209-2296): stencil base b = k-1 in the
    interior, k at the surface, k-2 where the vertex column ends with the
    element's (then clipped into the column).

    Returns, per element vertex v, ``(env [E] node ids, dm2, dm1)`` where
    dm2/dm1 are [nl-1, E] masks selecting base offset d = b - k of -2 / -1
    (else 0).  On every ACTIVE element layer d is exactly one of {-2,-1,0},
    so the vertical stencil reads reduce to STATIC shifts of the gathered
    column selected elementwise — no take_along_axis with per-element level
    indices (a dynamic axis-0 gather on [nl-1, E] operands that dominated
    the TPU step profile at 62%)."""
    nl = mesh.nl
    k = jnp.arange(nl - 1)[:, None]                        # [nl-1, 1]
    nle = (mesh.nlevels_elem - 1)[None, :]                 # [1, E]
    out = []
    for v in range(3):
        env = mesh.elem_nodes[:, v]
        nln = (mesh.nlevels_node[env] - 1)[None, :]        # [1, E]
        b = jnp.where(k == 0, 0, k - 1)
        bot_eq = jnp.logical_and(k == nle - 1, nln - 1 == k)
        b = jnp.where(bot_eq, k - 2, b)
        b = jnp.clip(b, 0, jnp.maximum(nln - 3, 0))
        # active layers (k <= nle-2 <= nln-2) give d in {-2,-1,0} exactly;
        # deeper (masked) layers are clamped to keep the select total
        d = jnp.clip(b - k, -2, 0)
        out.append((env, d == -2, d == -1))
    return out


def _shift_clamp(arr_e, j: int):
    """[nl-1, E] -> the array vertically shifted by static offset j with
    edge clamping: row k becomes row clip(k+j, 0, nl-2)."""
    if j == 0:
        return arr_e
    if j > 0:
        tail = jnp.broadcast_to(arr_e[-1:], (j,) + arr_e.shape[1:])
        return jnp.concatenate([arr_e[j:], tail], 0)
    head = jnp.broadcast_to(arr_e[:1], (-j,) + arr_e.shape[1:])
    return jnp.concatenate([head, arr_e[:j]], 0)


def _stencil_reads(arr_e, dm2, dm1):
    """The 3 stencil values (base+0, base+1, base+2) of a gathered vertex
    column, via 5 static shifts + 2-level selects (see _pgf_vertex_stencil)."""
    s = {j: _shift_clamp(arr_e, j) for j in (-2, -1, 0, 1, 2)}
    pick = lambda a, b, c: jnp.where(dm2, a, jnp.where(dm1, b, c))
    return (pick(s[-2], s[-1], s[0]),
            pick(s[-1], s[0], s[1]),
            pick(s[0], s[1], s[2]))


def pressure_force_zxxxx_shchepetkin(state: OceanState,
                                     mesh: MeshTables) -> OceanState:
    """Density-Jacobian PGF for moving coordinates (zlevel/zstar), after
    Shchepetkin & McWilliams (2003): the sigma-coordinate pressure-gradient
    error is removed by subtracting drho/dz * dz/dx from the along-layer
    density gradient before the vertical integration
    (ref pressure_force_4_zxxxx_shchepetkin oce_ale_pressure_bv.F90:1878-2104).

    The vertex vertical density gradient uses a 3-point Newton polynomial on
    the non-uniform node mid-depths Z_3d, evaluated at the ELEMENT mid-depth:
    stencil (k-1,k,k+1) in the interior, (k,k+1,k+2) at the surface, and
    (k-2,k-1,k) at the bottom where the node column ends with the element's.
    """
    nl, E = mesh.nl, mesh.n_elems
    en = mesh.elem_nodes                                   # [E, 3]
    lmask = mesh.elem_layer_mask                           # [nl-1, E]
    rho = state.density_m_rho0                             # [nl-1, N]
    Z3 = state.Z_3d                                        # [nl-1, N]

    # element mid-depths Z_e from helem stacked up from the fixed bottom
    # (ref :1908-1917); zbar_e_bot is static (bottom immobile, partial cells)
    h = jnp.where(lmask, state.helem, 0.0)
    zbot = mesh.zbar_e_bot                                 # [E]
    S = cumsum_bottom_up(h)                                # [nl-1, E]
    Z_e = zbot[None] + S - 0.5 * h                         # [nl-1, E]

    safe = lambda d: jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]

    # Per-vertex unrolled stencil: every temp stays [nl-1, E].  (A fused
    # [nl-1, E, 3] take_along_axis puts the 3-vertex axis minor, which the
    # TPU (8,128) tiling pads 3->128 — 42x HBM expansion, OOM at 47k
    # nodes; three planar gathers cost nothing extra.)
    drho_dz = jnp.zeros_like(Z_e)
    drho_dx = jnp.zeros_like(Z_e)
    drho_dy = jnp.zeros_like(Z_e)
    dz_dx = jnp.zeros_like(Z_e)
    dz_dy = jnp.zeros_like(Z_e)
    for v, (env, dm2, dm1) in enumerate(_pgf_vertex_stencil(mesh)):
        # ONE planar gather per field per vertex; the vertical stencil is
        # static shifts + selects (no dynamic axis-0 gather)
        rho_v = rho[:, env]
        z_v = Z3[:, env]
        x0, x1, x2 = _stencil_reads(z_v, dm2, dm1)
        f0, f1, f2 = _stencil_reads(rho_v, dm2, dm1)
        dx10, dx21, dx20 = x1 - x0, x2 - x1, x2 - x0
        df10, df21 = f1 - f0, f2 - f1
        drho_dz = drho_dz + df10 / safe(dx10) \
            + (dx10 * df21 - dx21 * df10) / safe(dx20 * dx21 * dx10) \
            * ((Z_e - x1) + (Z_e - x0))
        # along-layer gradients of density and of the layer depth itself
        drho_dx = drho_dx + rho_v * gx[None, :, v]
        drho_dy = drho_dy + rho_v * gy[None, :, v]
        dz_dx = dz_dx + z_v * gx[None, :, v]
        dz_dy = dz_dy + z_v * gy[None, :, v]
    drho_dz = jnp.where(lmask, drho_dz / 3.0, 0.0)

    aux_x = jnp.where(lmask, (drho_dx - drho_dz * dz_dx) * h * g / density_0,
                      0.0)
    aux_y = jnp.where(lmask, (drho_dy - drho_dz * dz_dy) * h * g / density_0,
                      0.0)
    # layer value = integral above + half of own layer (midpoint rule)
    pgf_x = jnp.cumsum(aux_x, 0) - 0.5 * aux_x
    pgf_y = jnp.cumsum(aux_y, 0) - 0.5 * aux_y
    return replace(state, pgf_x=jnp.where(lmask, pgf_x, 0.0),
                   pgf_y=jnp.where(lmask, pgf_y, 0.0))


def pressure_force_easypgf(state: OceanState, mesh: MeshTables,
                           cfg) -> OceanState:
    """'easypgf' PGF: per layer, T/S are Newton-quadratically interpolated
    from each vertex column to the common ELEMENT mid-depth Z_e, the in-situ
    density is re-evaluated there from the EoS, and the along-layer density
    gradient is integrated down (ref pressure_force_4_zxxxx_easypgf,
    ``oce_ale_pressure_bv.F90:2116-2546``; the linfs form :898-1245 is the
    same algorithm on linfs geometry).  Stencils follow :2209-2296:
    (k-1,k,k+1) interior, (k,k+1,k+2) at the vertex surface, (k-2,k-1,k)
    where the vertex column ends with the element's."""
    from . import eos
    nl, E = mesh.nl, mesh.n_elems
    en = mesh.elem_nodes
    lmask = mesh.elem_layer_mask
    Z3 = state.Z_3d
    T, S_ = state.tr[0], state.tr[1]
    seq = cfg.dyn.state_equation

    h = jnp.where(lmask, state.helem, 0.0)
    zbot = mesh.zbar_e_bot                                 # [E]
    Scum = cumsum_bottom_up(h)
    Z_e = zbot[None] + Scum - 0.5 * h                      # [nl-1, E]

    safe = lambda d: jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]

    # per-vertex unrolled stencil: [nl-1, E] temps (see the shchepetkin
    # form for why the [nl-1, E, 3] layout is fatal on TPU)
    sum_x = jnp.zeros_like(Z_e)
    sum_y = jnp.zeros_like(Z_e)
    for v, (env, dm2, dm1) in enumerate(_pgf_vertex_stencil(mesh)):
        x0, x1, x2 = _stencil_reads(Z3[:, env], dm2, dm1)
        dx10, dx21, dx20 = x1 - x0, x2 - x1, x2 - x0

        def newton_at_ze(arr, _env=env, _dm2=dm2, _dm1=dm1, _x0=x0, _x1=x1,
                         _d10=dx10, _d21=dx21, _d20=dx20):
            f0, f1, f2 = _stencil_reads(arr[:, _env], _dm2, _dm1)
            df10, df21 = f1 - f0, f2 - f1
            return f0 + df10 / safe(_d10) * (Z_e - _x0) \
                + (_d10 * df21 - _d21 * df10) / safe(_d20 * _d21 * _d10) \
                * (Z_e - _x1) * (Z_e - _x0)

        t_at = newton_at_ze(T)
        s_at = newton_at_ze(S_)
        bulk_0, bulk_pz, bulk_pz2, rhopot = eos.eos_components(t_at, s_at,
                                                               seq)
        rho = bulk_0 + Z_e * (bulk_pz + Z_e * bulk_pz2)
        rho_at = rho * rhopot / (rho + 0.1 * Z_e * float(seq)) - density_0
        sum_x = sum_x + rho_at * gx[None, :, v]
        sum_y = sum_y + rho_at * gy[None, :, v]

    aux_x = jnp.where(lmask, sum_x * h * g / density_0, 0.0)
    aux_y = jnp.where(lmask, sum_y * h * g / density_0, 0.0)
    pgf_x = jnp.cumsum(aux_x, 0) - 0.5 * aux_x
    pgf_y = jnp.cumsum(aux_y, 0) - 0.5 * aux_y
    return replace(state, pgf_x=jnp.where(lmask, pgf_x, 0.0),
                   pgf_y=jnp.where(lmask, pgf_y, 0.0))


def _monotone_cubic(s1z, s2z, s3z, s4z, s1d, s2d, s3d, s4d, surf, bot, Z_e):
    """Monotone cubic-Hermite (FESOM1.4 spline) on the [s2, s3] interval
    evaluated at Z_e, with the reference's harmonic-mean derivative
    limiting and one-sided surface/bottom closures
    (ref pressure_force_4_zxxxx_cubicspline oce_ale_pressure_bv.F90:
    1786-1846; the surface branch wins where both apply, :1782)."""
    safe = lambda d: jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    s_H = safe(s3z - s2z)
    aux1 = (s3d - s2d) / s_H

    def harm(a, b):
        v = 2.0 * a * b / safe(a + b)
        return jnp.where(a * b > 0.0, v, 0.0)

    aux_up = (s2d - s1d) / safe(s2z - s1z)     # slope above the interval
    aux_lo = (s4d - s3d) / safe(s4z - s3z)     # slope below
    # interior
    dup_i, dlo_i = harm(aux1, aux_up), harm(aux1, aux_lo)
    # surface: dlo from below, dup one-sided
    dlo_s = harm(aux1, aux_lo)
    dup_s = 1.5 * aux1 - 0.5 * dlo_s
    # bottom: dup from above, dlo one-sided
    dup_b = harm(aux1, aux_up)
    dlo_b = 1.5 * aux1 - 0.5 * dup_b
    s_dup = jnp.where(surf, dup_s, jnp.where(bot, dup_b, dup_i))
    s_dlo = jnp.where(surf, dlo_s, jnp.where(bot, dlo_b, dlo_i))

    c_ = -(2.0 * s_dup + s_dlo) / s_H + 3.0 * (s3d - s2d) / s_H ** 2
    d_ = (s_dup + s_dlo) / s_H ** 2 - 2.0 * (s3d - s2d) / s_H ** 3
    dz = Z_e - s2z
    return s2d + s_dup * dz + c_ * dz ** 2 + d_ * dz ** 3


def pressure_force_zxxxx_cubicspline(state: OceanState,
                                     mesh: MeshTables) -> OceanState:
    """Cubic-spline PGF for moving coordinates (zlevel/zstar): per layer,
    each vertex column's density is monotone-cubic-spline interpolated to
    the common element mid-depth Z_e, then the along-layer gradient is
    midpoint-integrated down (ref pressure_force_4_zxxxx_cubicspline,
    ``oce_ale_pressure_bv.F90:1697-1866``; Q. Wang's FESOM1.4 spline).

    TPU-native deviation (documented): the reference finds the bracketing
    node level nlc by scanning the whole column per (elem, layer, vertex)
    (:1760-1768); here the count of node levels above Z_e is computed as
    k+1 plus corrections from a +-3-level window — exact whenever the node
    and element mid-depth stacks interleave within three levels, which
    holds for full-cell zstar/zlevel geometry (the stacks differ only by
    the eta perturbation and bottom truncation)."""
    from . import eos  # noqa: F401  (parity with easypgf imports)
    nl, E = mesh.nl, mesh.n_elems
    lmask = mesh.elem_layer_mask
    rho = state.density_m_rho0
    Z3 = state.Z_3d
    h = jnp.where(lmask, state.helem, 0.0)
    zbot = mesh.zbar_e_bot
    Scum = cumsum_bottom_up(h)
    Z_e = zbot[None] + Scum - 0.5 * h                       # [nl-1, E]
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]
    k0 = jnp.arange(nl - 1)[:, None]

    sum_x = jnp.zeros_like(Z_e)
    sum_y = jnp.zeros_like(Z_e)
    for v in range(3):
        env = mesh.elem_nodes[:, v]
        z_v = Z3[:, env]
        r_v = rho[:, env]
        nln0 = (mesh.nlevels_node[env] - 1)[None, :]        # #layers
        ul0 = (mesh.ulevels_node[env] - 1)[None, :]

        # c = #(valid node levels with z_v > Z_e), window-corrected
        c = k0 + 1 - ul0
        for j in (1, 2, 3):
            valid = (k0 + j <= nln0 - 1) & (k0 + j >= ul0)
            c = c + jnp.where(valid & (_shift_clamp(z_v, j) > Z_e), 1, 0)
        for j in (0, -1, -2):
            valid = (k0 + j <= nln0 - 1) & (k0 + j >= ul0)
            c = c - jnp.where(valid & (_shift_clamp(z_v, j) <= Z_e), 1, 0)
        nlc0 = jnp.clip(c - 1, ul0, nln0 - 2)               # [nl-1, E]
        surf = nlc0 == ul0
        bot = (nlc0 == nln0 - 2) & ~surf

        def at(arr, idx):
            return jnp.take_along_axis(arr, jnp.clip(idx, 0, nl - 2), 0)

        i1 = jnp.where(surf, nlc0, nlc0 - 1)
        i4 = jnp.where(bot, nlc0 + 1, nlc0 + 2)
        rho_n = _monotone_cubic(
            at(z_v, i1), at(z_v, nlc0), at(z_v, nlc0 + 1), at(z_v, i4),
            at(r_v, i1), at(r_v, nlc0), at(r_v, nlc0 + 1), at(r_v, i4),
            surf, bot, Z_e)
        sum_x = sum_x + rho_n * gx[None, :, v]
        sum_y = sum_y + rho_n * gy[None, :, v]

    aux_x = jnp.where(lmask, sum_x * h * g / density_0, 0.0)
    aux_y = jnp.where(lmask, sum_y * h * g / density_0, 0.0)
    pgf_x = jnp.cumsum(aux_x, 0) - 0.5 * aux_x
    pgf_y = jnp.cumsum(aux_y, 0) - 0.5 * aux_y
    return replace(state, pgf_x=jnp.where(lmask, pgf_x, 0.0),
                   pgf_y=jnp.where(lmask, pgf_y, 0.0))


def pressure_force_linfs_cubicspline(state: OceanState,
                                     mesh: MeshTables) -> OceanState:
    """linfs cubic-spline PGF (ref pressure_force_4_linfs_cubicspline,
    ``oce_ale_pressure_bv.F90:1252-1444``): layers above the element
    bottom use the direct along-layer density gradient (dz/dx == 0 on
    linfs); only the BOTTOM element layer interpolates each vertex
    column's density to the element bottom mid-depth with the monotone
    cubic (bottom closure, :1817-1832)."""
    nl, E = mesh.nl, mesh.n_elems
    lmask = mesh.elem_layer_mask
    rho = state.density_m_rho0
    Z3 = state.Z_3d
    h = jnp.where(lmask, state.helem, 0.0)
    zbot = mesh.zbar_e_bot
    Z_e = zbot[None] + cumsum_bottom_up(h) - 0.5 * h
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]
    nle0 = (mesh.nlevels_elem - 2)                          # bottom layer idx
    lev = jnp.arange(nl - 1)[:, None]

    # interior: direct nodal-density gradient
    gx_r, gy_r = scalar_gradient(rho, mesh)
    # bottom layer: per-vertex monotone-cubic interp to Z_e(bottom)
    Zb = jnp.take_along_axis(Z_e, jnp.clip(nle0, 0, nl - 2)[None, :], 0)[0]
    bx = jnp.zeros(E, rho.dtype)
    by = jnp.zeros(E, rho.dtype)
    take_e = lambda a, i: jnp.take_along_axis(
        a, jnp.clip(i, 0, nl - 2)[None, :], 0)[0]
    for v in range(3):
        env = mesh.elem_nodes[:, v]
        z_v = Z3[:, env]
        r_v = rho[:, env]
        nln0 = mesh.nlevels_node[env] - 1
        ul0 = mesh.ulevels_node[env] - 1
        # bracketing level around the element bottom layer (window search)
        c = nle0 + 1 - ul0
        for j in (1, 2, 3):
            idx = nle0 + j
            valid = (idx <= nln0 - 1) & (idx >= ul0)
            c = c + jnp.where(valid & (take_e(z_v, idx) > Zb), 1, 0)
        for j in (0, -1, -2):
            idx = nle0 + j
            valid = (idx <= nln0 - 1) & (idx >= ul0)
            c = c - jnp.where(valid & (take_e(z_v, idx) <= Zb), 1, 0)
        nlc0 = jnp.clip(c - 1, ul0, nln0 - 2)
        surf = nlc0 == ul0
        # reference linfs bottom interp always uses the bottom closure
        bot = ~surf
        i1 = jnp.where(surf, nlc0, nlc0 - 1)
        i4 = nlc0 + 1                                        # bottom: s4=3
        rho_n = _monotone_cubic(
            take_e(z_v, i1), take_e(z_v, nlc0), take_e(z_v, nlc0 + 1),
            take_e(z_v, i4), take_e(r_v, i1), take_e(r_v, nlc0),
            take_e(r_v, nlc0 + 1), take_e(r_v, i4), surf, bot, Zb)
        bx = bx + rho_n * gx[:, v]
        by = by + rho_n * gy[:, v]

    is_bot = lev == nle0[None, :]
    sum_x = jnp.where(is_bot, bx[None, :], gx_r)
    sum_y = jnp.where(is_bot, by[None, :], gy_r)
    aux_x = jnp.where(lmask, sum_x * h * g / density_0, 0.0)
    aux_y = jnp.where(lmask, sum_y * h * g / density_0, 0.0)
    pgf_x = jnp.cumsum(aux_x, 0) - 0.5 * aux_x
    pgf_y = jnp.cumsum(aux_y, 0) - 0.5 * aux_y
    return replace(state, pgf_x=jnp.where(lmask, pgf_x, 0.0),
                   pgf_y=jnp.where(lmask, pgf_y, 0.0))


def pressure_force_linfs_nemo(state: OceanState, mesh: MeshTables,
                              cfg) -> OceanState:
    """NEMO-style linfs PGF (ref pressure_force_4_linfs_nemo,
    ``oce_ale_pressure_bv.F90:479-635``): layers above the element bottom
    take the hydrostatic-pressure gradient directly (same as the
    full-cell form); at the BOTTOM layer, following the NEMO team's
    recommendation, T and S (not density) are linearly interpolated to
    the deepest common mid-depth, the in-situ density is re-evaluated
    from the EoS there, and the bottom pressure is rebuilt per vertex
    before taking its gradient (:560-633)."""
    from . import eos
    nl, E = mesh.nl, mesh.n_elems
    lmask = mesh.elem_layer_mask
    h_n = state.hnode
    T, S_ = state.tr[0], state.tr[1]
    Z3 = state.Z_3d
    seq = cfg.dyn.state_equation
    gx_p, gy_p = scalar_gradient(state.hpressure / density_0, mesh)
    nle0 = (mesh.nlevels_elem - 2)
    lev = jnp.arange(nl - 1)[:, None]

    take_e = lambda a, i: jnp.take_along_axis(
        a, jnp.clip(i, 0, nl - 2)[None, :], 0)[0]
    # Zt = max over vertices of the node mid-depth at the element bottom
    # layer (:575); dh = min over vertices of hnode there (:577)
    Zt = None
    dh = None
    for v in range(3):
        env = mesh.elem_nodes[:, v]
        zv = take_e(Z3[:, env], nle0)
        hv = take_e(h_n[:, env], nle0)
        Zt = zv if Zt is None else jnp.maximum(Zt, zv)
        dh = hv if dh is None else jnp.minimum(dh, hv)

    # density_ref rows are not carried on the state; reconstruct from the
    # EoS identity density_ref = rho_insitu(T,S,Z) - density_m_rho0
    b0a, bpza, bpz2a, rpota = eos.eos_components(T, S_, seq)
    ra = b0a + Z3 * (bpza + Z3 * bpz2a)
    dref_rows = ra * rpota / (ra + 0.1 * Z3 * float(seq)) \
        - state.density_m_rho0

    bx = jnp.zeros(E, T.dtype)
    by = jnp.zeros(E, T.dtype)
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]
    safe = lambda d: jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    for v in range(3):
        env = mesh.elem_nodes[:, v]
        z_v = Z3[:, env]
        nln0 = mesh.nlevels_node[env] - 1
        ul0 = mesh.ulevels_node[env] - 1
        # nlc: first node level at/below Zt (minloc construction :569-573),
        # window-corrected count as in the cubicspline form
        c = nle0 + 1 - ul0
        for j in (1, 2, 3):
            idx = nle0 + j
            valid = (idx <= nln0 - 1) & (idx >= ul0)
            c = c + jnp.where(valid & (take_e(z_v, idx) > Zt), 1, 0)
        for j in (0, -1, -2):
            idx = nle0 + j
            valid = (idx <= nln0 - 1) & (idx >= ul0)
            c = c - jnp.where(valid & (take_e(z_v, idx) <= Zt), 1, 0)
        # 0-based interpolation interval [nlc0-1, nlc0], nlc0 in [1, nln0-1]
        nlc0 = jnp.clip(c, ul0 + 1, nln0 - 1)
        za = take_e(z_v, nlc0 - 1)
        zb = take_e(z_v, nlc0)
        w = (Zt - za) / safe(zb - za)
        t_at = take_e(T[:, env], nlc0 - 1) * (1 - w) \
            + take_e(T[:, env], nlc0) * w
        s_at = take_e(S_[:, env], nlc0 - 1) * (1 - w) \
            + take_e(S_[:, env], nlc0) * w
        b0, bpz, bpz2, rpot = eos.eos_components(t_at, s_at, seq)
        # evaluated at the element bottom mid-depth Z_n(nle) == Zt here
        # (full cells); density_ref subtracted at (nle, vertex) (:611)
        r = b0 + Zt * (bpz + Zt * bpz2)
        rho_b = r * rpot / (r + 0.1 * Zt * float(seq)) \
            - take_e(dref_rows[:, env], nle0)
        # bottom pressure per vertex (:620-630): hpressure(nlce-1) +
        # g/2*(rho(nlce-1)*hnode(nlce-1) + rho_b*dh); 1-based
        # nlce = min(nlc, nle) -> 0-based row nlce-2 = min(nlc0-1, nle0-1)
        row = jnp.maximum(jnp.minimum(nlc0 - 1, nle0 - 1), 0)
        hp_km1 = take_e(state.hpressure[:, env], row)
        rho_km1 = take_e(state.density_m_rho0[:, env], row)
        h_km1 = take_e(h_n[:, env], row)
        hp_b = hp_km1 + 0.5 * g * (rho_km1 * h_km1 + rho_b * dh)
        bx = bx + hp_b * gx[:, v]
        by = by + hp_b * gy[:, v]

    is_bot = lev == nle0[None, :]
    pgf_x = jnp.where(is_bot, (bx / density_0)[None, :], gx_p)
    pgf_y = jnp.where(is_bot, (by / density_0)[None, :], gy_p)
    return replace(state, pgf_x=jnp.where(lmask, pgf_x, 0.0),
                   pgf_y=jnp.where(lmask, pgf_y, 0.0))


def pressure_force_linfs_cavity(state: OceanState,
                                mesh: MeshTables) -> OceanState:
    """'sergey' linfs PGF for cavity/partial-cell geometry
    (ref pressure_force_4_linfs_cavity, oce_ale_pressure_bv.F90:1451-1658):
    bulk layers take the hydrostatic-pressure gradient; the SURFACE layer
    under a cavity (ulevels>1) and the partial-cell BOTTOM layer get a
    sloped density-Jacobian correction (drho_dx - drho_dz * dz_dx), with
    the bottom additionally anchored on the pressure integrated to the
    last full interface (:1590-1594)."""
    nl, E = mesh.nl, mesh.n_elems
    en = mesh.elem_nodes
    lmask = mesh.elem_layer_mask
    rho = state.density_m_rho0
    Z3 = state.Z_3d
    h = jnp.where(lmask, state.helem, 0.0)
    lev = jnp.arange(nl - 1)[:, None]
    nle0 = (mesh.nlevels_elem - 2)[None, :]      # bottom layer row
    ule0 = (mesh.ulevels_elem - 1)[None, :]      # surface layer row
    gx_p, gy_p = scalar_gradient(state.hpressure / density_0, mesh)

    # element mid-depths + sloped-correction fields (same packed stencil
    # as the shchepetkin forms; only the surface/bottom rows are consumed)
    zbot = mesh.zbar_e_bot
    Scum = cumsum_bottom_up(h)
    Z_e = zbot[None] + Scum - 0.5 * h
    safe = lambda d: jnp.where(jnp.abs(d) > 1e-30, d, 1e-30)
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]
    drho_dz = jnp.zeros_like(Z_e)
    drho_dx = jnp.zeros_like(Z_e)
    drho_dy = jnp.zeros_like(Z_e)
    dz_dx = jnp.zeros_like(Z_e)
    dz_dy = jnp.zeros_like(Z_e)
    for v, (env, dm2, dm1) in enumerate(_pgf_vertex_stencil(mesh)):
        rho_v = rho[:, env]
        z_v = Z3[:, env]
        x0, x1, x2 = _stencil_reads(z_v, dm2, dm1)
        f0, f1, f2 = _stencil_reads(rho_v, dm2, dm1)
        dx10, dx21, dx20 = x1 - x0, x2 - x1, x2 - x0
        df10, df21 = f1 - f0, f2 - f1
        drho_dz = drho_dz + df10 / safe(dx10) \
            + (dx10 * df21 - dx21 * df10) / safe(dx20 * dx21 * dx10) \
            * ((Z_e - x1) + (Z_e - x0))
        drho_dx = drho_dx + rho_v * gx[None, :, v]
        drho_dy = drho_dy + rho_v * gy[None, :, v]
        dz_dx = dz_dx + z_v * gx[None, :, v]
        dz_dy = dz_dy + z_v * gy[None, :, v]
    drho_dz = drho_dz / 3.0
    aux_x = (drho_dx - drho_dz * dz_dx) * h * g / density_0
    aux_y = (drho_dy - drho_dz * dz_dy) * h * g / density_0

    # bottom anchor: grad of (hpressure + g/2 rho hnode) at row nle-1
    # (:1590-1594); one small take_along per field (cold path)
    take_row = lambda a, r: jnp.take_along_axis(
        a, jnp.clip(r, 0, nl - 2), 0)
    hp_anchor = state.hpressure + 0.5 * g * rho \
        * jnp.where(mesh.node_layer_mask, state.hnode, 0.0)
    ax, ay = scalar_gradient(hp_anchor / density_0, mesh)
    int_x = take_row(ax, jnp.maximum(nle0 - 1, 0))
    int_y = take_row(ay, jnp.maximum(nle0 - 1, 0))

    is_srf_cav = (lev == ule0) & (ule0 > 0)
    is_bot = lev == nle0
    pgf_x = gx_p
    pgf_y = gy_p
    pgf_x = jnp.where(is_srf_cav, 0.5 * aux_x, pgf_x)
    pgf_y = jnp.where(is_srf_cav, 0.5 * aux_y, pgf_y)
    pgf_x = jnp.where(is_bot, int_x + 0.5 * aux_x, pgf_x)
    pgf_y = jnp.where(is_bot, int_y + 0.5 * aux_y, pgf_y)
    return replace(state, pgf_x=jnp.where(lmask, pgf_x, 0.0),
                   pgf_y=jnp.where(lmask, pgf_y, 0.0))


def pressure_force(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """PGF dispatch following the reference decision matrix
    (ref pressure_force_4_linfs :371-427, pressure_force_4_zxxxx
    :1661-1687 of oce_ale_pressure_bv.F90):

    - zlevel/zstar: which_pgf = shchepetkin (default, oce_modules.F90:172)
      | cubicspline | easypgf.
    - linfs, full cells: the full-cell hpressure-gradient form.
    - linfs + partial cells: nemo | shchepetkin | cubicspline | easypgf.
      The shchepetkin/easypgf bodies are shared with the zxxxx forms: on
      linfs the layer geometry (helem, Z_3d) is static, so the moving-
      coordinate discretization evaluates to the linfs one (the reference
      keeps two near-identical copies; ours is one function).
    - linfs + cavity partial cells: sergey (linfs_cavity) | shchepetkin |
      easypgf.
    """
    which = getattr(cfg.dyn, "which_pgf", "shchepetkin")
    if cfg.ale.which_ALE == "linfs":
        use_pc = cfg.ale.use_partial_cell
        use_cav_pc = getattr(cfg.run, "use_cavity_partial_cell", False)
        if not use_pc and not use_cav_pc:
            if which == "nemo":       # reachable menu on full cells too
                return pressure_force_linfs_nemo(state, mesh, cfg)
            if which == "cubicspline":
                return pressure_force_linfs_cubicspline(state, mesh)
            return pressure_force_linfs(state, mesh)
        if use_cav_pc:
            if which == "sergey":
                return pressure_force_linfs_cavity(state, mesh)
            if which == "shchepetkin":
                return pressure_force_zxxxx_shchepetkin(state, mesh)
            if which == "easypgf":
                return pressure_force_easypgf(state, mesh, cfg)
            raise ValueError(
                f"which_pgf='{which}' not supported for linfs with cavity "
                "partial cells (ref :388-402: sergey, shchepetkin, easypgf)")
        if which == "nemo":
            return pressure_force_linfs_nemo(state, mesh, cfg)
        if which == "shchepetkin":
            return pressure_force_zxxxx_shchepetkin(state, mesh)
        if which == "cubicspline":
            return pressure_force_linfs_cubicspline(state, mesh)
        if which == "easypgf":
            return pressure_force_easypgf(state, mesh, cfg)
        raise ValueError(
            f"which_pgf='{which}' not supported for linfs with partial "
            "cells (ref :407-427: nemo, shchepetkin, cubicspline, easypgf)")
    if which == "easypgf":
        return pressure_force_easypgf(state, mesh, cfg)
    if which == "cubicspline":
        return pressure_force_zxxxx_cubicspline(state, mesh)
    if which != "shchepetkin":
        raise ValueError(f"which_pgf='{which}' not supported for "
                         "zlevel/zstar (ref :1671-1686: shchepetkin, "
                         "cubicspline, easypgf)")
    return pressure_force_zxxxx_shchepetkin(state, mesh)


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
    # (u_up, v_up) ride one merged nod_in_elem gather pass (ops.take_last
    # flattens the stack; per-index gather cost dominates on TPU), chunked
    # over the incidence slots so the [2, nl, N, K] block stays out of HBM
    uv_up = jnp.stack([u_up, v_up])
    acc = None
    for kk in range(safe.shape[-1]):
        vk = take_last(uv_up, safe[:, kk]) * w_area[:, kk]
        acc = vk if acc is None else acc + vk
    wuv = halo_fix_nodes(acc)
    wu, wv = wuv[0], wuv[1]

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

    uv = jnp.stack([u, v])                                  # [2, nl-1, E]
    q1 = take_last(uv, et1)                                 # merged u,v gathers
    q2 = take_last(uv, et2s)
    u1, v1 = q1[0], q1[1]
    u2, v2 = q2[0], q2[1]
    un1 = jnp.where(m1, v1 * dX1[None] - u1 * dY1[None], 0.0)
    un2 = jnp.where(m2, -v2 * dX2[None] + u2 * dY2[None], 0.0)

    fu = un1 * jnp.where(m1, u1, 0.0) + un2 * jnp.where(m2, u2, 0.0)
    fv = un1 * jnp.where(m1, v1, 0.0) + un2 * jnp.where(m2, v2, 0.0)

    # one merged incident-edge gather for both components
    duv = edge_divergence(jnp.stack([fu, fv]), mesh)
    un_rhs = (un_rhs + duv[0]) * mesh.areasvol_inv[:-1]
    vn_rhs = (vn_rhs + duv[1]) * mesh.areasvol_inv[:-1]

    # ---- back to elements (merged elem_nodes gather pass, chunked) ---------
    en = mesh.elem_nodes
    uvn2 = jnp.stack([un_rhs, vn_rhs])
    acc = None
    for j in range(3):
        v = take_last(uvn2, en[:, j])
        acc = v if acc is None else acc + v
    uve = acc / 3.0 * area[None, :]
    u_rhsAB = u_rhsAB + jnp.where(lmask, uve[0], 0.0)
    v_rhsAB = v_rhsAB + jnp.where(lmask, uve[1], 0.0)
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

    # surface pressure: -(g*eta + p_ice + p_air) - ssh_gp
    # (ref oce_ale_vel_rhs.F90:60-96: floating-ice loading when use_floatice
    # and not linfs; sea-level pressure when l_mslp; tidal potential when
    # use_global_tides)
    pre2d = -g * state.eta
    if cfg.run.use_floatice and cfg.ale.which_ALE != "linfs":
        from ..constants import rhoice, rhosno, rhowat
        p_ice = (forcing.m_ice * rhoice + forcing.m_snow * rhosno) / rhowat
        pre2d = pre2d - g * jnp.minimum(p_ice, cfg.ale.max_ice_loading)
    if cfg.run.l_mslp:
        pre2d = pre2d - forcing.press_air / 1000.0
    if cfg.run.use_global_tides:
        pre2d = pre2d - forcing.ssh_gp
    gx, gy = scalar_gradient(pre2d, mesh)                   # [E]
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


def compute_vel_rhs_vinv(state: OceanState, mesh: MeshTables,
                         forcing: Forcing, cfg):
    """Vector-invariant momentum rhs, mom_adv=3 (ref compute_vel_rhs_vinv
    oce_vel_rhs_vinv.F90:104-290): advection enters as (f+zeta) x u plus the
    gradient of kinetic energy; the pressure term is the plain
    -grad(g*eta + hpressure/rho0) (no PGF-discretization dispatch).

    The reference's vertical momentum-advection block multiplies by a local
    w that is initialised to 0 and never set (:119, :225-243) - identically
    zero, so it is omitted here.
    """
    dt = cfg.dt
    eps = cfg.dyn.epsilon
    lmask = mesh.elem_layer_mask
    area = mesh.elem_area

    # kinetic energy at nodes: sum |U|^2 * elem_area / (6*areasvol)
    # (ref :141-158), zeroed at boundary-edge nodes (:160-166)
    ke2 = (state.u ** 2 + state.v ** 2) * area[None, :]       # [nl-1, E]
    ke2 = jnp.where(lmask, ke2, 0.0)
    KE = elem_contrib_to_nodes(
        jnp.repeat(ke2[..., None], 3, axis=-1), mesh) \
        / (6.0 * jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0))
    bnd_node = ((mesh.node_edges >= mesh.n_edges_in)
                & (mesh.node_edges >= 0)).any(-1)             # [N]
    KE = jnp.where(bnd_node[None, :], 0.0, KE)
    # bnd_node is derived from the (incomplete at halos) incidence table, so
    # re-fix halos after applying it
    KE = halo_fix_nodes(jnp.where(mesh.node_layer_mask, KE, 0.0))

    # AB part (ref :168-176)
    u_rhs = -(0.5 + eps) * state.u_rhsAB
    v_rhs = -(0.5 + eps) * state.v_rhsAB

    vort = relative_vorticity(state, mesh)

    en = mesh.elem_nodes
    # pressure: grad(-(g*eta + hpressure/rho0)) per layer (ref :185-196)
    pre = -(g * state.eta[None, :] + state.hpressure / density_0)  # [nl-1,N]
    pe = jnp.take(pre, en, axis=-1)                           # [nl-1, E, 3]
    gsx, gsy = mesh.gradient_sca[:, 0:3], mesh.gradient_sca[:, 3:6]
    Fx = (pe * gsx).sum(-1)
    Fy = (pe * gsy).sum(-1)
    u_rhs = u_rhs + jnp.where(lmask, Fx * area[None], 0.0)
    v_rhs = v_rhs + jnp.where(lmask, Fy * area[None], 0.0)

    # AB memory: -grad(KE) + (f+zeta)_mean x u (ref :197-204)
    kee = jnp.take(-KE, en, axis=-1)
    Kx = (kee * gsx).sum(-1)
    Ky = (kee * gsy).sum(-1)
    fz = (jnp.take(mesh.coriolis_node, en, axis=-1)[None, :, :]
          + jnp.take(vort, en, axis=-1)).sum(-1) / 3.0        # [nl-1, E]
    u_rhsAB = jnp.where(lmask, (state.v * fz + Kx) * area[None], 0.0)
    v_rhsAB = jnp.where(lmask, (-state.u * fz + Ky) * area[None], 0.0)

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

    # merged (u, v) gathers at each edge-triangle side
    uv = jnp.stack([state.u, state.v])
    q1 = take_last(uv, et1)
    q2 = take_last(uv, et2s)
    du = q1[0] - q2[0]
    dv = q1[1] - q2[1]
    sp2 = du * du + dv * dv
    sp = jnp.sqrt(sp2)
    vi = dt * jnp.maximum(d.gamma0,
                          jnp.maximum(d.gamma1 * sp, d.gamma2 * sp2)) * length[None]
    du = jnp.where(shared, du * vi, 0.0)
    dv = jnp.where(shared, dv * vi, 0.0)

    # gather-based edge->element accumulation: each element touches exactly
    # its 3 edges; sign -1 when the element is the edge's left triangle
    # (one merged gather for both components)
    ee = mesh.elem_edges                                  # [E, 3]
    e_is_left = mesh.edge_tri[ee, 0] == jnp.arange(mesh.n_elems)[:, None]
    esign = jnp.where(e_is_left, -1.0, 1.0)               # [E, 3]
    inv_area_e = 1.0 / jnp.maximum(area, 1e-30)
    duv = jnp.stack([du, dv])
    acc = None
    for j in range(3):                                    # chunked edge slots
        v = take_last(duv, ee[:, j]) * esign[:, j]
        acc = v if acc is None else acc + v
    UV_b = halo_fix_elems(acc * inv_area_e[None, :])
    U_b, V_b = UV_b[0], UV_b[1]

    # smooth to nodes (area-weighted over ALL adjacent elements, no level
    # check in the denominator — matches the reference loop :619-635)
    UV_c = elem_to_node_mean(UV_b, mesh, respect_levels=False)

    en = mesh.elem_nodes
    UVc_e = take_last(UV_c, en).mean(-1)
    u_rhs = u_rhs + jnp.where(lmask, U_b - d.easy_bs_return * UVc_e[0], 0.0)
    v_rhs = v_rhs + jnp.where(lmask, V_b - d.easy_bs_return * UVc_e[1], 0.0)
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
    return halo_fix_elems(u_rhs), halo_fix_elems(v_rhs)


def _edge_internal_shared(mesh: MeshTables):
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    et2s = jnp.where(et2 >= 0, et2, 0)
    internal = jnp.arange(mesh.n_edges) < mesh.n_edges_in
    lmask = mesh.elem_layer_mask
    return jnp.logical_and(jnp.logical_and(lmask[:, et1], lmask[:, et2s]),
                           internal[None, :]), et1, et2s


def _edge_diff(u, mesh, et1, et2s):
    return u[:, et1] - u[:, et2s]


def _accum_edge_to_elem(val, mesh: MeshTables):
    """U_c[e] = sum over its 3 edges of (-val if e is the left tri else +val)."""
    ee = mesh.elem_edges
    is_left = mesh.edge_tri[ee, 0] == jnp.arange(mesh.n_elems)[:, None]
    esign = jnp.where(is_left, -1.0, 1.0)
    return halo_fix_elems((jnp.take(val, ee, axis=-1) * esign).sum(-1))


def _apply_edge_filter(val_u, val_v, mesh, et1, et2s, u_rhs, v_rhs):
    """UV_rhs update +/-(val/area) on the two adjacent elements."""
    ia1 = 1.0 / jnp.maximum(mesh.elem_area, 1e-30)
    du = _accum_edge_to_elem(val_u, mesh) * ia1[None, :]
    dv = _accum_edge_to_elem(val_v, mesh) * ia1[None, :]
    return u_rhs + du, v_rhs + dv


def relative_vorticity(state: OceanState, mesh: MeshTables):
    """Relative vorticity at nodes [nl-1, N] (ref oce_vel_rhs_vinv.F90:14-103)."""
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
    lmask = mesh.elem_layer_mask
    u, v = state.u, state.v
    c1 = jnp.where(lmask[:, et1], dX1[None] * u[:, et1] + dY1[None] * v[:, et1], 0.0)
    c2 = jnp.where(lmask[:, et2s] & has2[None, :],
                   -dX2[None] * u[:, et2s] - dY2[None] * v[:, et2s], 0.0)
    vort = edge_divergence(c1 + c2, mesh) * mesh.areasvol_inv[:-1]
    return jnp.where(mesh.node_layer_mask, vort, 0.0)


def h_viscosity_leith(state: OceanState, mesh: MeshTables, cfg):
    """Leith + modified-Leith viscosity coefficient on elements [nl-1, E]
    (ref h_viscosity_leith oce_dyn.F90:461-562), smoothed twice."""
    d = cfg.dyn
    vort = relative_vorticity(state, mesh)
    en = mesh.elem_nodes
    lmask = mesh.elem_layer_mask
    hsafe = jnp.where(lmask, state.helem, 1.0)
    we = jnp.take(state.w, en, axis=-1)                 # [nl, E, 3]
    dwdz = (we[:-1] - we[1:]) / hsafe[..., None]        # [nl-1, E, 3]
    xe = (dwdz * mesh.gradient_sca[:, 0:3]).sum(-1)
    ye = (dwdz * mesh.gradient_sca[:, 3:6]).sum(-1)
    ve = jnp.take(vort, en, axis=-1)
    lx = (ve * mesh.gradient_sca[:, 0:3]).sum(-1)
    ly = (ve * mesh.gradient_sca[:, 3:6]).sum(-1)
    A = mesh.elem_area
    visc = jnp.minimum(
        d.gamma1 * A[None, :] * jnp.sqrt(
            (d.Div_c * (xe ** 2 + ye ** 2)
             + d.Leith_c * (lx ** 2 + ly ** 2)) * A[None, :]),
        A[None, :] / cfg.dt)
    visc = jnp.where(lmask, visc, 0.0)
    # two rounds of elem->node->elem smoothing (ref :525-557)
    for _ in range(2):
        aux = elem_to_node_mean(visc, mesh)
        visc = jnp.take(aux, en, axis=-1).mean(-1)
        visc = jnp.where(lmask, visc, 0.0)
    return visc


def visc_filt_harmon_leith(state, mesh, cfg, u_rhs, v_rhs, visc):
    """Harmonic filter with Leith coefficient (ref visc_filt_harmon :236-273)."""
    shared, et1, et2s = _edge_internal_shared(mesh)
    length = jnp.sqrt(mesh.elem_area[et1] + mesh.elem_area[et2s])
    vi = 0.5 * (visc[:, et1] + visc[:, et2s])
    vi = jnp.maximum(vi, cfg.dyn.gamma0 * length[None]) * cfg.dt
    du = jnp.where(shared, _edge_diff(state.u, mesh, et1, et2s) * vi, 0.0)
    dv = jnp.where(shared, _edge_diff(state.v, mesh, et1, et2s) * vi, 0.0)
    return _apply_edge_filter(du, dv, mesh, et1, et2s, u_rhs, v_rhs)


def visc_filt_biharm(state, mesh, cfg, u_rhs, v_rhs, option, visc=None):
    """Biharmonic filter (ref visc_filt_biharm :275-374): option 1 =
    flow-aware coefficient, option 2 = Leith coefficient."""
    d = cfg.dyn
    shared, et1, et2s = _edge_internal_shared(mesh)
    du = jnp.where(shared, _edge_diff(state.u, mesh, et1, et2s), 0.0)
    dv = jnp.where(shared, _edge_diff(state.v, mesh, et1, et2s), 0.0)
    U_c = _accum_edge_to_elem(du, mesh)
    V_c = _accum_edge_to_elem(dv, mesh)
    length = jnp.sqrt(mesh.elem_area)
    if option == 1:
        speed = jnp.sqrt(state.u ** 2 + state.v ** 2)
        vi = jnp.maximum(d.gamma0, d.gamma1 * speed) * length[None] * cfg.dt
    else:
        vi = jnp.maximum(visc, d.gamma0 * length[None]) * cfg.dt
    lmask = mesh.elem_layer_mask
    U_c = jnp.where(lmask, -U_c * vi, 0.0)
    V_c = jnp.where(lmask, -V_c * vi, 0.0)
    du2 = jnp.where(shared, _edge_diff(U_c, mesh, et1, et2s), 0.0)
    dv2 = jnp.where(shared, _edge_diff(V_c, mesh, et1, et2s), 0.0)
    return _apply_edge_filter(du2, dv2, mesh, et1, et2s, u_rhs, v_rhs)


def visc_filt_hbhmix(state, mesh, cfg, u_rhs, v_rhs, visc):
    """Harmonic Leith + biharmonic background (ref visc_filt_hbhmix :376-458)."""
    d = cfg.dyn
    shared, et1, et2s = _edge_internal_shared(mesh)
    du = jnp.where(shared, _edge_diff(state.u, mesh, et1, et2s), 0.0)
    dv = jnp.where(shared, _edge_diff(state.v, mesh, et1, et2s), 0.0)
    # harmonic part with Leith coefficient
    vi_h = cfg.dt * 0.5 * (visc[:, et1] + visc[:, et2s])
    u_rhs, v_rhs = _apply_edge_filter(du * vi_h, dv * vi_h, mesh, et1, et2s,
                                      u_rhs, v_rhs)
    # biharmonic background
    U_c = _accum_edge_to_elem(du, mesh)
    V_c = _accum_edge_to_elem(dv, mesh)
    vi_b = cfg.dt * d.gamma0 * jnp.sqrt(mesh.elem_area)[None]
    lmask = mesh.elem_layer_mask
    U_c = jnp.where(lmask, -U_c * vi_b, 0.0)
    V_c = jnp.where(lmask, -V_c * vi_b, 0.0)
    du2 = jnp.where(shared, _edge_diff(U_c, mesh, et1, et2s), 0.0)
    dv2 = jnp.where(shared, _edge_diff(V_c, mesh, et1, et2s), 0.0)
    return _apply_edge_filter(du2, dv2, mesh, et1, et2s, u_rhs, v_rhs)


def visc_filt_bilapl(state, mesh, cfg, u_rhs, v_rhs):
    """Biharmonic, viscosity from velocity Laplacian (ref :658-726)."""
    d = cfg.dyn
    shared, et1, et2s = _edge_internal_shared(mesh)
    du = jnp.where(shared, _edge_diff(state.u, mesh, et1, et2s), 0.0)
    dv = jnp.where(shared, _edge_diff(state.v, mesh, et1, et2s), 0.0)
    U_c = _accum_edge_to_elem(du, mesh)
    V_c = _accum_edge_to_elem(dv, mesh)
    length = jnp.sqrt(mesh.elem_area)
    sp2 = U_c ** 2 + V_c ** 2
    vi = jnp.maximum(d.gamma0, jnp.maximum(d.gamma1 * jnp.sqrt(sp2),
                                           d.gamma2 * sp2)) * length[None] * cfg.dt
    lmask = mesh.elem_layer_mask
    U_c = jnp.where(lmask, -U_c * vi, 0.0)
    V_c = jnp.where(lmask, -V_c * vi, 0.0)
    du2 = jnp.where(shared, _edge_diff(U_c, mesh, et1, et2s), 0.0)
    dv2 = jnp.where(shared, _edge_diff(V_c, mesh, et1, et2s), 0.0)
    return _apply_edge_filter(du2, dv2, mesh, et1, et2s, u_rhs, v_rhs)


def visc_filt_bidiff(state, mesh, cfg, u_rhs, v_rhs):
    """Biharmonic, viscosity from velocity differences, applied symmetrically
    in both stages (ref :734-801)."""
    d = cfg.dyn
    shared, et1, et2s = _edge_internal_shared(mesh)
    length = jnp.sqrt(mesh.elem_area[et1] + mesh.elem_area[et2s])[None]
    du = jnp.where(shared, _edge_diff(state.u, mesh, et1, et2s), 0.0)
    dv = jnp.where(shared, _edge_diff(state.v, mesh, et1, et2s), 0.0)
    sp2 = du ** 2 + dv ** 2
    vi1 = jnp.sqrt(jnp.maximum(d.gamma0,
                               jnp.maximum(d.gamma1 * jnp.sqrt(sp2),
                                           d.gamma2 * sp2)) * length)
    U_c = _accum_edge_to_elem(du * vi1, mesh)
    V_c = _accum_edge_to_elem(dv * vi1, mesh)
    lmask = mesh.elem_layer_mask
    U_c = jnp.where(lmask, U_c, 0.0)
    V_c = jnp.where(lmask, V_c, 0.0)
    du2 = jnp.where(shared, _edge_diff(U_c, mesh, et1, et2s), 0.0)
    dv2 = jnp.where(shared, _edge_diff(V_c, mesh, et1, et2s), 0.0)
    vi2 = -cfg.dt * vi1
    return _apply_edge_filter(du2 * vi2, dv2 * vi2, mesh, et1, et2s,
                              u_rhs, v_rhs)


def _smooth_elem(arr, mesh: MeshTables, n: int):
    """n rounds of elem->node->elem mass-matrix smoothing applied per level
    without level masks (ref smooth_elem2D gen_support.F90:183-212)."""
    en = mesh.elem_nodes
    for _ in range(n):
        aux = elem_to_node_mean(arr, mesh, respect_levels=False)
        arr = jnp.take(aux, en, axis=-1).mean(-1)
    return arr


def backscatter_coef(uke, mesh: MeshTables, cfg):
    """Negative backscatter viscosity v_back [nl-1, E] from the UKE reservoir
    (ref backscatter_coef oce_dyn.F90:958-986)."""
    d = cfg.dyn
    vb = -d.c_back * jnp.sqrt(mesh.elem_area)[None] \
        * jnp.sqrt(jnp.maximum(2.0 * uke, 0.0))
    vb = jnp.minimum(vb, 0.2 * mesh.elem_area[None] / cfg.dt)
    return jnp.where(mesh.elem_layer_mask, vb, 0.0)


def uke_update(state, mesh: MeshTables, cfg, U_dis, V_dis, U_back, V_back,
               uke_dif):
    """Unresolved-kinetic-energy budget with AB2 stepping
    (ref uke_update oce_dyn.F90:988-1153).

    Deviations from the reference, both deliberate:
    - the V_work accumulation bug (:1062 assigns the U mean to V_work) is NOT
      reproduced; the true area-weighted V node mean is used;
    - the hard-coded Southern-Pacific distance taper (:1106-1123, a workaround
      for one quarter-degree-mesh trouble spot) is omitted.
    """
    d = cfg.dyn
    lmask = mesh.elem_layer_mask
    uke_dis = jnp.where(lmask, state.u * U_dis + state.v * V_dis, 0.0)
    uke_back = jnp.where(lmask, state.u * U_back + state.v * V_back, 0.0)
    uke_back = _smooth_elem(uke_back, mesh, d.smooth_back)

    # local Rossby number from node-averaged velocity gradients (ref :1045-1080)
    en = mesh.elem_nodes
    Uw = elem_to_node_mean(state.u, mesh, respect_levels=False)
    Vw = elem_to_node_mean(state.v, mesh, respect_levels=False)
    ue = jnp.take(Uw, en, axis=-1)                     # [nl-1, E, 3]
    ve = jnp.take(Vw, en, axis=-1)
    gx = mesh.gradient_sca[:, 0:3]
    gy = mesh.gradient_sca[:, 3:6]
    t1 = (ue * gx).sum(-1) - (ve * gy).sum(-1)
    t2 = (ue * gy).sum(-1) + (ve * gx).sum(-1)
    rosb = jnp.sqrt(t1 ** 2 + t2 ** 2)                 # [nl-1, E]

    c_min, f_min, r_max = 0.5, 1.0e-6, 200000.0        # ref :1014
    if d.uke_scaling:
        # resolution / first-baroclinic-Rossby-radius cutoff (ref :1083-1100)
        reso = jnp.sqrt(mesh.elem_area * 4.0 / jnp.sqrt(3.0))
        bv = jnp.sqrt(jnp.maximum(state.bvfreq, 0.0))  # [nl, N]
        integ = state.hnode_new * 0.5 * (bv[:-1] + bv[1:])
        c1 = jnp.where(mesh.node_layer_mask, integ, 0.0).sum(0)
        c1 = jnp.maximum(c_min, c1 / jnp.pi)
        rr = jnp.minimum(c1 / jnp.maximum(jnp.abs(mesh.coriolis_node), f_min),
                         r_max)
        rosb_rad = jnp.take(rr, en, axis=-1).mean(-1)  # [E]
        scaling = 1.0 / (1.0 + d.uke_scaling_factor * reso / rosb_rad)
    else:
        scaling = jnp.ones_like(mesh.elem_area)

    fsum = jnp.abs(jnp.take(mesh.coriolis_node, en, axis=-1).sum(-1))
    rosb = rosb / jnp.maximum(fsum, f_min)[None]
    uke_dis = uke_dis * scaling[None] / (1.0 + rosb / d.rosb_dis)
    uke_dis = _smooth_elem(uke_dis, mesh, d.smooth_dis)

    # AB2 (ref :1142-1148); uke_rhs carries last step's rhs into the update
    uke_rhs = jnp.where(lmask, -uke_dis - uke_back + uke_dif, 0.0)
    uke = state.uke + 1.5 * uke_rhs - 0.5 * state.uke_rhs
    return replace(state, uke=jnp.where(lmask, uke, 0.0), uke_rhs=uke_rhs)


def visc_filt_dbcksc(state: OceanState, mesh: MeshTables, cfg, u_rhs, v_rhs):
    """Dynamic backscatter: biharmonic dissipation plus a negative harmonic
    viscosity whose magnitude is set by the UKE reservoir
    (ref visc_filt_dbcksc oce_dyn.F90:806-954). Returns (state, u_rhs, v_rhs);
    state carries the updated UKE fields."""
    d = cfg.dyn
    dt = cfg.dt
    shared, et1, et2s = _edge_internal_shared(mesh)
    lmask = mesh.elem_layer_mask
    inv_area = 1.0 / jnp.maximum(mesh.elem_area, 1e-30)

    v_back = backscatter_coef(state.uke, mesh, cfg)

    du = jnp.where(shared, _edge_diff(state.u, mesh, et1, et2s), 0.0)
    dv = jnp.where(shared, _edge_diff(state.v, mesh, et1, et2s), 0.0)
    # first biharmonic stage, 3rd-order-upwind-like coefficient (ref :857-869)
    U_c = _accum_edge_to_elem(du, mesh)
    V_c = _accum_edge_to_elem(dv, mesh)
    vi = jnp.maximum(0.2, jnp.sqrt(state.u ** 2 + state.v ** 2)) \
        * (dt * jnp.sqrt(mesh.elem_area) / 30.0)[None]
    U_c = jnp.where(lmask, -U_c * vi, 0.0)
    V_c = jnp.where(lmask, -V_c * vi, 0.0)

    # edge length / circumcenter-distance geometry (ref :877-884)
    lex = mesh.edge_dxdy[:, 0] * (mesh.elem_cos[et1] + mesh.elem_cos[et2s]) \
        * 0.25
    ley = mesh.edge_dxdy[:, 1]
    length = jnp.sqrt(lex ** 2 + ley ** 2) * r_earth
    cx = mesh.edge_cross_dxdy[:, 0] - mesh.edge_cross_dxdy[:, 2]
    cy = mesh.edge_cross_dxdy[:, 1] - mesh.edge_cross_dxdy[:, 3]
    lc = length / jnp.maximum(jnp.sqrt(cx ** 2 + cy ** 2), 1e-30)

    # backscatter tendency: harmonic operator with v_back < 0 (ref :886-905)
    vi_b = dt * lc[None] * (v_back[:, et1] + v_back[:, et2s])
    U_back = _accum_edge_to_elem(jnp.where(shared, du * vi_b, 0.0), mesh) \
        * inv_area[None]
    V_back = _accum_edge_to_elem(jnp.where(shared, dv * vi_b, 0.0), mesh) \
        * inv_area[None]

    # UKE diffusion (ref :893-907)
    sq = jnp.sqrt(mesh.elem_area / d.scale_area)
    vi_d = dt * lc * d.K_back * (sq[et1] + sq[et2s])
    duke = jnp.where(shared,
                     _edge_diff(state.uke, mesh, et1, et2s) * vi_d[None], 0.0)
    uke_dif = _accum_edge_to_elem(duke, mesh) * inv_area[None]

    # second biharmonic stage (ref :909-917)
    du2 = jnp.where(shared, _edge_diff(U_c, mesh, et1, et2s), 0.0)
    dv2 = jnp.where(shared, _edge_diff(V_c, mesh, et1, et2s), 0.0)
    U_dis = _accum_edge_to_elem(du2, mesh) * inv_area[None]
    V_dis = _accum_edge_to_elem(dv2, mesh) * inv_area[None]

    U_back = _smooth_elem(U_back, mesh, d.smooth_back_tend)
    V_back = _smooth_elem(V_back, mesh, d.smooth_back_tend)

    u_rhs = u_rhs + jnp.where(lmask, U_dis + U_back, 0.0)
    v_rhs = v_rhs + jnp.where(lmask, V_dis + V_back, 0.0)

    state = uke_update(state, mesh, cfg, U_dis, V_dis, U_back, V_back, uke_dif)
    return state, u_rhs, v_rhs


def viscosity_filter(state: OceanState, mesh: MeshTables, cfg, u_rhs, v_rhs):
    """Dispatch on visc_option (ref viscosity_filter oce_dyn.F90:171-234).

    Options: 1 harmonic Leith; 2 Laplacian Leith + biharmonic background;
    3 biharmonic Leith; 4 biharmonic flow-aware; 5 easy backscatter;
    6 biharmonic (Laplacian-based); 7 biharmonic (difference-based);
    8 dynamic backscatter with the UKE budget.
    Returns (state, u_rhs, v_rhs) — only option 8 modifies state.
    """
    opt = cfg.dyn.visc_option
    if opt == 1:
        visc = h_viscosity_leith(state, mesh, cfg)
        out = visc_filt_harmon_leith(state, mesh, cfg, u_rhs, v_rhs, visc)
    elif opt == 2:
        visc = h_viscosity_leith(state, mesh, cfg)
        out = visc_filt_hbhmix(state, mesh, cfg, u_rhs, v_rhs, visc)
    elif opt == 3:
        visc = h_viscosity_leith(state, mesh, cfg)
        out = visc_filt_biharm(state, mesh, cfg, u_rhs, v_rhs, 2, visc)
    elif opt == 4:
        out = visc_filt_biharm(state, mesh, cfg, u_rhs, v_rhs, 1)
    elif opt == 5:
        out = visc_filt_bcksct(state, mesh, cfg, u_rhs, v_rhs)
    elif opt == 6:
        out = visc_filt_bilapl(state, mesh, cfg, u_rhs, v_rhs)
    elif opt == 7:
        out = visc_filt_bidiff(state, mesh, cfg, u_rhs, v_rhs)
    elif opt == 8:
        return visc_filt_dbcksc(state, mesh, cfg, u_rhs, v_rhs)
    else:
        out = visc_filt_harmon(state, mesh, cfg, u_rhs, v_rhs)
    u_rhs, v_rhs = out
    return state, u_rhs, v_rhs


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
    zbot = mesh.zbar_e_bot                        # partial-cell bottom
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
    # surface row = ulevels-1 (0 in open ocean, deeper under ice-shelf
    # cavities, where forcing.stress carries the cavity drag)
    is_surf = lay == (mesh.ulevels_elem - 1)[None, :]

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
    """Element->node velocity average (ref compute_vel_nodes oce_dyn.F90:133).
    One merged nod_in_elem gather for (u, v)."""
    uvn = elem_to_node_mean(jnp.stack([state.u, state.v]), mesh)
    nm = mesh.node_layer_mask
    return replace(state, unode=jnp.where(nm, uvn[0], 0.0),
                   vnode=jnp.where(nm, uvn[1], 0.0))
