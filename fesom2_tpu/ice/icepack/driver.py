"""Icepack ice-step orchestration (replaces step_icepack,
``src/icepack_drivers/icedrv_step.F90:1119-1309``):

thermo1 (per-category BL99 vertical) -> thermo2 (frazil, lateral melt,
linear ITD remap) -> strength -> EVP (strength-coupled) -> category-tracer
FCT advection -> ridging -> cleanup -> aggregate + ocean fluxes.

The aggregate quantities and ocean fluxes are written into the familiar
``IceState`` fields so the rest of the coupled model (ocean2ice /
oce_fluxes) is untouched.
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ..state import IceState, IceForcing, OceanSurface, inv_rhowat
from ..evp import ice_dynamics, ridging_rates
from ..fct import fct_advect_fields
from ..thermo import tfrez, obudget
from ..state import cc as cc_ocean          # rhowat * 4190 [J/m^3/K]
from . import constants as c
from .state import (IcepackConfig, IcepackState, temperature_ice,
                    temperature_snow, salinity_profile, melt_temps)
from .shortwave import ccsm3_shortwave
from .thermo_vertical import temperature_solve, thickness_changes
from .thermo_itd import add_new_ice, lateral_melt
from .itd import (aggregate, aggregate_tsfc, linear_itd, rebin, cleanup_itd)
from .ridge import ice_strength, ridge_ice

h_ml = 2.5          # mixed-layer depth for the freezing/melting potential
                    # (same as the FESIM thermodynamics, ice_thermo_oce.F90)


def _pack_tracers(ipk: IcepackState, ipc: IcepackConfig):
    """[F, N] advection work array (state_to_work,
    icedrv_advection.F90:719-767): per category aicen, vicen, vsnon,
    aicen*Tsfc, per-layer ice/snow energies."""
    ncat, ni, ns = ipc.ncat, ipc.nilyr, ipc.nslyr
    ei = ipk.qin * (ipk.vicen / ni)[:, None, :]       # [ncat, ni, N]
    es = ipk.qsn * (ipk.vsnon / ns)[:, None, :]
    rows = [ipk.aicen, ipk.vicen, ipk.vsnon, ipk.aicen * ipk.Tsfcn]
    stack = jnp.concatenate([jnp.stack(rows, 1),      # [ncat, 4, N]
                             ei, es], axis=1)         # [ncat, 4+ni+ns, N]
    return stack.reshape(ncat * (4 + ni + ns), -1)


def _unpack_tracers(work, ipc: IcepackConfig) -> IcepackState:
    ncat, ni, ns = ipc.ncat, ipc.nilyr, ipc.nslyr
    w = work.reshape(ncat, 4 + ni + ns, -1)
    aicen = jnp.clip(w[:, 0], 0.0, 1.0)
    vicen = jnp.maximum(w[:, 1], 0.0)
    vsnon = jnp.maximum(w[:, 2], 0.0)
    has = (aicen > c.puny) & (vicen > c.puny)
    Tsfcn = jnp.where(has, w[:, 3] / jnp.maximum(aicen, c.puny), 0.0)
    Tsfcn = jnp.clip(Tsfcn, -100.0, 0.0)
    ei = w[:, 4:4 + ni]
    es = w[:, 4 + ni:]
    qin = jnp.where(has[:, None, :],
                    jnp.minimum(ei / jnp.maximum(
                        (vicen / ni)[:, None, :], c.puny), 0.0), 0.0)
    qsn = jnp.where((vsnon > c.puny)[:, None, :],
                    jnp.minimum(es / jnp.maximum(
                        (vsnon / ns)[:, None, :], c.puny), 0.0), 0.0)
    return IcepackState(aicen=aicen, vicen=vicen, vsnon=vsnon,
                        Tsfcn=Tsfcn, qin=qin, qsn=qsn)


def icepack_timestep(ipk: IcepackState, ice: IceState, mesh,
                     forcing: IceForcing, ocean: OceanSurface, cfg,
                     ipc: IcepackConfig, use_virt_salt: bool,
                     ref_sss: float = 34.0, ref_sss_local: bool = False):
    """One coupled icepack step.  Returns (IcepackState, IceState) — the
    IceState carries aggregate fields, velocities and the ocean fluxes."""
    dt = cfg.dt * cfg.ice.ice_ave_steps
    ncat, ni, ns = ipc.ncat, ipc.nilyr, ipc.nslyr
    sal = salinity_profile(ni)
    Tmlt = melt_temps(ni)

    T_oc, S_oc = ocean.T_oc, ocean.S_oc
    tf = tfrez(S_oc)
    ug = jnp.sqrt(forcing.u_wind ** 2 + forcing.v_wind ** 2)
    Ta = forcing.Tair
    rain = jnp.where(Ta >= 0.0, forcing.prec_rain, 0.0)
    snowfall = jnp.where(Ta >= 0.0, 0.0, forcing.prec_rain)  # [m water/s]

    a0, v0, vs0 = ipk.aicen, ipk.vicen, ipk.vsnon
    vice_before = v0.sum(0)
    vsno_before = vs0.sum(0)

    # ---------------- thermo1: per-category vertical physics --------------
    has = a0 > c.puny
    hi = jnp.where(has, v0 / jnp.maximum(a0, c.puny), 0.0)
    hs = jnp.where(has, vs0 / jnp.maximum(a0, c.puny), 0.0)
    Tin0 = temperature_ice(ipk.qin, jnp.asarray(sal, hi.dtype)[None, :, None])
    Tsn0 = temperature_snow(ipk.qsn)
    Tin0 = jnp.where(has[:, None, :], Tin0, -2.0)
    Tsn0 = jnp.where(has[:, None, :], Tsn0, -2.0)
    Tsf0 = jnp.where(has, jnp.minimum(ipk.Tsfcn, 0.0), jnp.minimum(Ta, -0.1))

    albedo, fswsfc, iabs, fswthru = ccsm3_shortwave(
        ipc, hi, hs, Tsf0, forcing.shortwave)

    sol = temperature_solve(ipc, hi, hs, Tsf0, Tsn0, Tin0, fswsfc, iabs,
                            forcing.longwave, Ta, forcing.shum, ug, tf, dt,
                            sal, Tmlt)

    # ocean -> ice-bottom heat flux (per unit ice area)
    ustar = jnp.maximum(jnp.sqrt(((ice.u_ice - ocean.u_w) ** 2
                                  + (ice.v_ice - ocean.v_w) ** 2)
                                 * cfg.ice.Cd_oce_ice), ipc.ustar_min)
    fbot = 0.006 * ustar * cc_ocean * (T_oc - tf)         # [W/m^2] +melts

    tc = thickness_changes(ipc, hi, hs,
                           jnp.where(has[:, None, :], ipk.qin, 0.0),
                           jnp.where(has[:, None, :], ipk.qsn, 0.0),
                           sol["Tsf"], sol, fbot, tf, snowfall, Ta, dt, sal)

    # masked per-category updates
    aicen = a0
    vicen = jnp.where(has, tc["hi"] * a0, v0)
    vsnon = jnp.where(has, tc["hs"] * a0, vs0)
    Tsfcn = jnp.where(has, sol["Tsf"], ipk.Tsfcn)
    qin = jnp.where(has[:, None, :], tc["qin"], ipk.qin)
    qsn = jnp.where(has[:, None, :], tc["qsn"], ipk.qsn)

    aw = jnp.where(has, a0, 0.0)                          # weights
    fresh_kg = (aw * tc["fresh"]).sum(0)                  # kg/m^2/s grid mean
    fsalt_kg = (aw * tc["fsalt"]).sum(0)
    fhocn = (aw * (tc["eextra"] - fbot[None, :])).sum(0)  # W/m^2 into ocean
    fswthru_g = (aw * fswthru).sum(0)
    evap_sub = (aw * tc["evap"]).sum(0)                   # kg/m^2/s to atm
    flat_g = (aw * sol["flat"]).sum(0)
    fsens_g = (aw * sol["fsens"]).sum(0)

    # ---------------- thermo2: frazil + lateral melt + ITD remap ----------
    aice_mid = aicen.sum(0)
    pot = (tf - T_oc) * cc_ocean * h_ml / dt              # [W/m^2] +freezing
    frzmlt = jnp.maximum(pot, 0.0)
    (aicen, vicen, vsnon, Tsfcn, qin, qsn, dvfraz,
     fhocn_fraz) = add_new_ice(ipc, aicen, vicen, vsnon, Tsfcn, qin, qsn,
                               frzmlt, tf, dt)
    fresh_kg = fresh_kg - c.rhoi * dvfraz
    fsalt_kg = fsalt_kg - c.rhoi * dvfraz * c.ice_ref_salinity * 1e-3
    fhocn = fhocn + fhocn_fraz

    melt_pot = jnp.maximum(-pot, 0.0) * aice_mid          # lateral only w/ ice
    (aicen, vicen, vsnon, Tsfcn, qin, qsn, dfr, dfs,
     dfh) = lateral_melt(ipc, aicen, vicen, vsnon, Tsfcn, qin, qsn,
                         T_oc, tf, melt_pot, dt)
    fresh_kg = fresh_kg + dfr
    fsalt_kg = fsalt_kg + dfs
    fhocn = fhocn + dfh

    if ipc.kitd == 1:
        aicen, vicen, vsnon, Tsfcn, qin, qsn = linear_itd(
            a0, v0, aicen, vicen, vsnon, Tsfcn, qin, qsn, ipc.hin_max)
    aicen, vicen, vsnon, Tsfcn, qin, qsn = rebin(
        aicen, vicen, vsnon, Tsfcn, qin, qsn, ipc.hin_max)
    (aicen, vicen, vsnon, Tsfcn, qin, qsn, dfr, dfs,
     dfh) = cleanup_itd(aicen, vicen, vsnon, Tsfcn, qin, qsn, dt)
    fresh_kg = fresh_kg + dfr
    fsalt_kg = fsalt_kg + dfs
    fhocn = fhocn + dfh

    # ---------------- dynamics: strength-coupled EVP ----------------------
    strength = ice_strength(ipc, aicen, vicen)
    aice_d, vice_d, vsno_d = aggregate(aicen, vicen, vsnon)
    ice = replace(ice, a_ice=aice_d, m_ice=vice_d, m_snow=vsno_d)
    ice = ice_dynamics(ice, mesh, forcing, ocean, cfg,
                       strength_node=strength)
    rdg_conv, rdg_shear = ridging_rates(ice, mesh, cfg)

    # ---------------- advection of category tracers -----------------------
    ipk2 = IcepackState(aicen=aicen, vicen=vicen, vsnon=vsnon, Tsfcn=Tsfcn,
                        qin=qin, qsn=qsn)
    work = _pack_tracers(ipk2, ipc)
    work = fct_advect_fields(ice.u_ice, ice.v_ice, work, mesh,
                             cfg.ice.ice_gamma_fct, dt)
    ipk2 = _unpack_tracers(work, ipc)
    aicen, vicen, vsnon = ipk2.aicen, ipk2.vicen, ipk2.vsnon
    Tsfcn, qin, qsn = ipk2.Tsfcn, ipk2.qin, ipk2.qsn

    # ---------------- ridging ---------------------------------------------
    (aicen, vicen, vsnon, Tsfcn, qin, qsn, dfr,
     dfh) = ridge_ice(ipc, aicen, vicen, vsnon, Tsfcn, qin, qsn,
                      rdg_conv, rdg_shear, dt, ipc.hin_max)
    fresh_kg = fresh_kg + dfr
    fhocn = fhocn + dfh

    aicen, vicen, vsnon, Tsfcn, qin, qsn = rebin(
        aicen, vicen, vsnon, Tsfcn, qin, qsn, ipc.hin_max)
    (aicen, vicen, vsnon, Tsfcn, qin, qsn, dfr, dfs,
     dfh) = cleanup_itd(aicen, vicen, vsnon, Tsfcn, qin, qsn, dt)
    fresh_kg = fresh_kg + dfr
    fsalt_kg = fsalt_kg + dfs
    fhocn = fhocn + dfh

    # ---------------- aggregate + ocean fluxes ----------------------------
    aice, vice, vsno = aggregate(aicen, vicen, vsnon)
    tskin = aggregate_tsfc(aicen, Tsfcn)

    # open-water atmospheric budget (same bulk as the FESIM scheme)
    fh_ow, evap_ow, hflatow, hfsenow, hflwrdout = obudget(
        forcing.shum, forcing.shortwave, forcing.longwave, T_oc, ug, Ta,
        forcing.Ch_atm_oce, forcing.Ce_atm_oce, cfg.ice.emiss_wat,
        cfg.ice.albw)
    ow = 1.0 - aice
    hftot_ow = (1.0 - cfg.ice.albw) * forcing.shortwave \
        + forcing.longwave + hflwrdout + hfsenow + hflatow

    # total heat into the ocean [W/m^2]
    ehf = ow * hftot_ow + fhocn + fswthru_g

    # freshwater [m/s] and salt [psu m/s] in the FESIM conventions
    prec = rain + forcing.runoff + snowfall * ow
    evap = evap_ow * ow
    if use_virt_salt:
        # linfs: virtual-salt formulation — the ice-melt water is scaled by
        # (S_ref - S_ice)/S_ref and no real salt flux is applied (mirrors
        # ice_thermo_oce.F90:406-415)
        rsss = jnp.where(ref_sss_local, S_oc, ref_sss)
        fw = prec + evap + fresh_kg * inv_rhowat \
            * (rsss - c.ice_ref_salinity) / jnp.maximum(rsss, 1.0)
        rsf = jnp.zeros_like(T_oc)
    else:
        fw = prec + evap + fresh_kg * inv_rhowat
        rsf = fsalt_kg * 1000.0 * inv_rhowat               # [psu m/s]

    thdgr = (vice - vice_before) / dt                      # [m ice / s]
    thdgrsn = (vsno - vsno_before) / dt
    # sublimation leaves to the atmosphere (counted like FESIM's subli)
    evap_total = evap - evap_sub / 1000.0

    ice = replace(ice, a_ice=aice, m_ice=vice, m_snow=vsno, t_skin=tskin,
                  fresh_wa_flux=fw, net_heat_flux=ehf,
                  real_salt_flux=rsf, evaporation=evap_total,
                  thdgr=thdgr, thdgrsn=thdgrsn,
                  flice=(aw * tc["snoice"]).sum(0) / dt,
                  a_ice_old=a0.sum(0))
    ipk_out = IcepackState(aicen=aicen, vicen=vicen, vsnon=vsnon,
                           Tsfcn=Tsfcn, qin=qin, qsn=qsn)
    return ipk_out, ice
