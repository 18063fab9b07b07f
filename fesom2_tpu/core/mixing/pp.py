"""Pacanowski & Philander (1981) Richardson-number mixing + convection hooks.

Reference: ``src/oce_ale_mixing_pp.F90:2-88`` (oce_mixing_pp) and
``src/oce_mo_conv.F90:4-104`` (mo_convect; Monin-Obukhov part optional).
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ...mesh import MeshTables
from ..state import OceanState


def oce_mixing_pp(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """Av = mix_coeff_PP*<f^2>/3 + A_ver;  Kv = mix_coeff_PP*f^3 + K_ver,
    f = shear/(shear + 5 max(N^2,0) + 1e-14)."""
    mix_coeff_PP = 0.01  # o_PARAM default (oce_modules.F90:24)
    nl = mesh.nl
    Z3 = state.Z_3d
    dz = Z3[:-1] - Z3[1:]
    dz_inv = 1.0 / jnp.where(dz == 0, 1.0, dz)          # [nl-2, N]
    du = (state.unode[:-1] - state.unode[1:]) * dz_inv
    dv = (state.vnode[:-1] - state.vnode[1:]) * dz_inv
    shear = du * du + dv * dv                            # interfaces 1..nl-2
    f = shear / (shear + 5.0 * jnp.maximum(state.bvfreq[1:-1], 0.0) + 1.0e-14)
    fK = jnp.zeros_like(state.Kv).at[1:-1].set(f)
    # interface active: 1..nln-2 (ref loops nz=2..nzmax-1, 1-based)
    lev = jnp.arange(nl)[:, None]
    imask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
    fK = jnp.where(imask, fK, 0.0)

    # Av on elements from nodal f^2 (ref :48-57)
    fe = jnp.take(fK, mesh.elem_nodes, axis=-1)          # [nl, E, 3]
    emask = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
    Av = jnp.where(emask, mix_coeff_PP * (fe ** 2).mean(-1) + cfg.dyn.A_ver, 0.0)
    Kv = jnp.where(imask, mix_coeff_PP * fK ** 3 + cfg.tra.K_ver, 0.0)
    return replace(state, Av=Av, Kv=Kv)


def _mo_length(forcing, dt, mixlength):
    """Monin-Obukhov mixed-layer length of Timmermann & Beckmann 2004
    (ref mo_length/pmlktmo oce_mo_conv.F90:108-194), vectorized over nodes.
    Returns the relaxed mixlength (10-day retreat time constant)."""
    cosgam = 0.913632                     # cos(24 deg)
    qfm = forcing.water_flux * 34.0
    qtm = -2.38e-7 * forcing.heat_flux
    tau = jnp.sqrt(forcing.stress_atm_x ** 2 + forcing.stress_atm_y ** 2)
    ustar = jnp.sqrt(tau / 1030.0)
    uabs = jnp.sqrt(forcing.u_ice ** 2 + forcing.v_ice ** 2)
    a = forcing.a_ice
    qw = 1.25 * ustar ** 3 * (1.0 - a) + 0.005 * uabs ** 3 * cosgam * a

    # pmlktmo: 5 Newton iterations on 2 qw e^{-t/7} + g qrho t = 0
    qhw, betas, betat = 1.0 / 7.0, 0.0008, 0.00004
    qrho = betas * qfm - betat * qtm
    ttmp = jnp.full_like(qrho, 60.0)
    for _ in range(5):
        a1 = jnp.exp(-ttmp * qhw)
        f0 = 2.0 * qw * a1 + 9.81 * qrho * ttmp
        f1 = -2.0 * qw * a1 * qhw + 9.81 * qrho
        ttmp = jnp.maximum(ttmp - f0 / jnp.where(f1 == 0.0, -1e-30, f1), 10.0)
    obuk = jnp.maximum(jnp.where(qrho > 0.0, 0.0, ttmp), 10.0)

    rtc = dt / (10.0 * 86400.0)
    return jnp.where(obuk < mixlength,
                     mixlength + (obuk - mixlength) * rtc, obuk)


def mo_convect(state: OceanState, mesh: MeshTables, cfg,
               forcing=None) -> OceanState:
    """Monin-Obukhov (TB04) + instability/wind mixing enhancements
    (ref oce_mo_conv.F90:4-104)."""
    t = cfg.tra
    nl = mesh.nl
    lev = jnp.arange(nl)[:, None]
    Kv = state.Kv
    Av = state.Av
    if t.use_momix and forcing is not None:
        from ...constants import rad
        lat = mesh.geo_coords[:, 1]
        apply_n = lat <= t.momix_lat * rad                   # [N]
        # reference only evaluates/relaxes mixlength on qualifying nodes
        mixlength = jnp.where(apply_n,
                              _mo_length(forcing, cfg.dt, state.mixlength),
                              state.mixlength)
        imask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
        in_ml = jnp.abs(state.zbar_3d) <= mixlength[None, :]
        # build at the state dtype: a scalar-only where() is weak f64 under
        # x64 and its element mean would silently promote Av to f64
        mo = jnp.where(imask & in_ml & apply_n[None, :],
                       jnp.asarray(t.momix_kv, Kv.dtype),
                       jnp.asarray(0.0, Kv.dtype))
        Kv = Kv + mo
        # Av += elementwise mean of mo where mean element latitude qualifies
        mo_e = jnp.take(mo, mesh.elem_nodes, axis=-1).mean(-1)   # [nl, E]
        lat_e = jnp.take(lat, mesh.elem_nodes, axis=-1).mean(-1)
        emask = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
        Av = Av + jnp.where(emask & (lat_e <= t.momix_lat * rad)[None, :],
                            mo_e, 0.0)
        state = replace(state, mixlength=mixlength)
    if t.use_instabmix:
        imask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
        unstable = state.bvfreq < 0.0
        Kv = jnp.where(imask & unstable, jnp.maximum(Kv, t.instabmix_kv), Kv)
        une = jnp.take(unstable, mesh.elem_nodes, axis=-1).any(-1)
        emask = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
        Av = jnp.where(emask & une, jnp.maximum(Av, t.instabmix_kv), Av)
    if t.use_windmix:
        wmask = (lev >= 1) & (lev <= t.windmix_nl)
        nmask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
        emask2 = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
        Kv = jnp.where(wmask & nmask, jnp.maximum(Kv, t.windmix_kv), Kv)
        Av = jnp.where(wmask & emask2, jnp.maximum(Av, t.windmix_kv), Av)
    return replace(state, Kv=Kv, Av=Av)
