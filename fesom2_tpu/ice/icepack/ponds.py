"""Melt ponds (CESM scheme) and the simple aux tracers (age, first-year
area, level-ice partition).

Reference behavior: the pond/tracer options of the externally-downloaded
Icepack library selected by ``config/namelist.icepack.cesm.ponds``
(trpnd=1, tr_pond_cesm=.true.) and the tracer_nml switches tr_iage /
tr_FY / tr_lvl (``config/namelist.icepack:31-38``).  The CESM pond
parameterization follows Holland et al. 2012 (J. Climate 25, "Improved
sea ice shortwave radiation physics in CCSM4"): a fraction

    r = rfracmin + (rfracmax - rfracmin) * aice

of each category's surface melt water (top ice melt + snow melt, in
liquid-water equivalent) is retained in ponds; the pond volume decays
exponentially when the surface temperature drops below Tp = -Td_pond,
``V <- V * exp(rexp * max(Tp - Tsfc, 0) / Tp)``; pond geometry follows a
fixed aspect ratio h_p = pndaspect * a_p so V = pndaspect * a_p^2 (all
per unit category area).  Ponds are removed on thin ice (h_i < 0.1 m)
and the depth is capped at dpthhi * h_i.  Pond water is "virtual"
(l_mpond_fresh=.false., namelist.icepack:93): it never alters the
freshwater budget, only the surface albedo.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import constants as c


def compute_ponds_cesm(ipc, aicen, vicen, Tsfcn, meltt, melts, apnd, hpnd):
    """Advance the per-category pond tracers one step.

    meltt/melts: per-category top ice / snow melt this step [m per unit
    category area]; apnd: pond area fraction OF the category area;
    hpnd: pond depth [m].  Returns (apnd, hpnd)."""
    has = aicen > c.puny
    hi = jnp.where(has, vicen / jnp.maximum(aicen, c.puny), 0.0)
    aice = jnp.clip(aicen.sum(0), 0.0, 1.0)

    # retained surface melt water [m over category area]
    rfrac = ipc.rfracmin + (ipc.rfracmax - ipc.rfracmin) * aice
    dvol = rfrac[None, :] * (meltt * c.rhoi + melts * c.rhos) / c.rhow

    volp = apnd * hpnd + dvol
    # exponential refreezing below Tp (Holland et al. 2012 eq. for the
    # 'cesm' frzpnd branch; Tp = Timelt - Td < 0 so the factor <= 1)
    Tp = -ipc.Td_pond
    dTs = jnp.maximum(Tp - Tsfcn, 0.0)
    volp = volp * jnp.exp(ipc.rexp_pond * dTs / Tp)

    # geometry: V = pndaspect * a_p^2  =>  a_p = sqrt(V / pndaspect)
    apnd_new = jnp.sqrt(jnp.maximum(volp, 0.0) / ipc.pndaspect)
    apnd_new = jnp.clip(apnd_new, 0.0, 1.0)
    hpnd_new = ipc.pndaspect * apnd_new
    # cap the depth at a fraction of the ice thickness (excess drains)
    hcap = ipc.dpthhi * hi
    apnd_new = jnp.where(hpnd_new > hcap,
                         jnp.where(hcap > c.puny,
                                   volp / jnp.maximum(hcap, c.puny), 0.0),
                         apnd_new)
    apnd_new = jnp.clip(apnd_new, 0.0, 1.0)
    hpnd_new = jnp.minimum(hpnd_new, hcap)

    # ponds only on substantial ice
    ok = has & (hi >= ipc.hi_min_pond)
    apnd_new = jnp.where(ok, apnd_new, 0.0)
    hpnd_new = jnp.where(ok, hpnd_new, 0.0)
    return apnd_new, hpnd_new


def advance_age(iage, aicen, dt):
    """Ice age tracer: existing ice ages by dt each step (volume-weighted
    transport handles mixing)."""
    return jnp.where(aicen > c.puny, iage + dt, 0.0)


def reset_first_year(FY, lat, yday):
    """Zero the first-year area tracer once a year at the end of the melt
    season: NH on day 258 (Sept 15), SH on day 74 (March 15) — the CICE
    convention.  yday: scalar day-of-year (traced); lat [N] radians."""
    north = lat > 0.0
    hit_n = jnp.logical_and(north, jnp.abs(yday - 258.0) < 0.5)
    hit_s = jnp.logical_and(~north, jnp.abs(yday - 74.0) < 0.5)
    hit = jnp.logical_or(hit_n, hit_s)[None, :]
    return jnp.where(hit, 0.0, FY)


def dilute_on_new_ice(ipc, ta, tv, a_before, a_after, v_before, v_after):
    """Aux-tracer update when frazil adds (a_after - a_before) of new ice
    area / volume to a category: intensive area tracers dilute; new ice is
    first-year and level (FY/alvl mix toward 1), ponds toward 0, age
    toward 0, new volume is level (vlvl toward 1)."""
    if ta.shape[1]:
        da = jnp.maximum(a_after - a_before, 0.0)
        aw = jnp.maximum(a_after, c.puny)
        new_val_a = {"apnd": 0.0, "hpnd": 0.0, "FY": 1.0, "alvl": 1.0}
        if getattr(ipc, "tr_fsd", False):
            # fsd_add_new_ice placement: pancakes (smallest bin) under a
            # wave field, consolidated growth (largest bin) otherwise
            tgt = 0 if ipc.wave_spec else ipc.nfsd - 1
            new_val_a.update({f"fsd{k:02d}": (1.0 if k == tgt else 0.0)
                              for k in range(ipc.nfsd)})
        if getattr(ipc, "tr_bgc", False):
            # new frazil traps mixed-layer nutrients and the algal seed
            from .bgc import bgc_defaults
            new_val_a.update(bgc_defaults(ipc))
        vals = jnp.asarray([new_val_a[n] for n in ipc.area_tracers],
                           ta.dtype)[None, :, None]
        ta = jnp.where(a_after[:, None, :] > c.puny,
                       (ta * a_before[:, None, :] + vals * da[:, None, :])
                       / aw[:, None, :], ta)
    if tv.shape[1]:
        dv = jnp.maximum(v_after - v_before, 0.0)
        vw = jnp.maximum(v_after, c.puny)
        new_val_v = {"vlvl": 1.0, "iage": 0.0}
        vals = jnp.asarray([new_val_v[n] for n in ipc.vol_tracers],
                           tv.dtype)[None, :, None]
        tv = jnp.where(v_after[:, None, :] > c.puny,
                       (tv * v_before[:, None, :] + vals * dv[:, None, :])
                       / vw[:, None, :], tv)
    return ta, tv


def pond_albedo_adjust(ipc, albedo, fswsfc, apnd, hpnd, hs, sw):
    """Pond-aware surface albedo adjustment (the role dEdd shortwave plays
    for the CESM ponds; parameterized fit in the spirit of Briegleb &
    Light 2007 rather than full delta-Eddington multiple scattering).

    The ponded fraction of the (snow-free part of the) category has albedo
    relaxing from the bare-ice value to a deep-pond albedo with e-folding
    depth h_e:  alb_p = alb_deep + (alb_ice - alb_deep) * exp(-h_p/h_e).

    Returns (albedo, fswsfc) with the extra absorbed shortwave deposited
    at the surface."""
    alb_deep = 0.20          # broadband deep-pond albedo
    h_e = 0.10               # e-folding pond depth [m]
    snow_free = jnp.exp(-hs / max(ipc.snowpatch, 1e-6))   # pond visibility
    ap_eff = apnd * snow_free
    alb_p = alb_deep + (albedo - alb_deep) * jnp.exp(-hpnd / h_e)
    alb_new = (1.0 - ap_eff) * albedo + ap_eff * jnp.minimum(alb_p, albedo)
    fswsfc_new = fswsfc + (albedo - alb_new) * sw
    return alb_new, fswsfc_new
