"""Ice-thickness-distribution machinery: category bounds, aggregation,
linear remapping (Lipscomb 2001), rebinning and small-ice cleanup.

Reference behavior: the icepack_itd module of the externally-downloaded
Icepack library, driven from ``src/icepack_drivers/icedrv_step.F90``
(step_therm2 :296-384, update_state :391-477) with kitd=1, kcatbound=1
(``config/namelist.icepack:27,42``).

All functions are fixed-shape: categories are a static leading axis,
boundary-by-boundary transfers are an unrolled Python loop over the
(static, small) ncat-1 boundaries with fully vectorized [N] arithmetic.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .constants import puny, ice_ref_salinity, rhoi, rhos


# --------------------------------------------------------------------------
# category boundaries
# --------------------------------------------------------------------------
def category_bounds(ncat: int, kcatbound: int = 1) -> np.ndarray:
    """hin_max[0..ncat]: thickness boundaries [m].

    kcatbound=1 ("new" round-number scheme, the reference default,
    namelist.icepack:27): increments grow linearly, d_n = (3 + (n-1))/ncat,
    giving 0, 0.6, 1.4, 2.4, 3.6 m for ncat=5.  kcatbound=0 is the original
    tanh formula. The top boundary is open (huge)."""
    b = np.zeros(ncat + 1)
    if kcatbound == 0:
        cc1 = 3.0 / ncat
        cc2 = 15.0 * cc1
        cc3 = 3.0
        for n in range(1, ncat + 1):
            x1 = (n - 1) / ncat
            b[n] = b[n - 1] + cc1 + cc2 * (1.0 + np.tanh(cc3 * (x1 - 1.0)))
    elif kcatbound == 1:
        cc1 = 3.0 / ncat
        cc2 = 1.0 / ncat
        for n in range(1, ncat + 1):
            b[n] = n * cc1 + cc2 * n * (n - 1) / 2.0
    else:
        raise ValueError(f"kcatbound={kcatbound} not supported")
    b[ncat] = 999.9
    return b


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------
def aggregate(aicen, vicen, vsnon):
    """Sum over categories -> (aice, vice, vsno), aice clipped to [0,1]."""
    aice = jnp.clip(aicen.sum(0), 0.0, 1.0)
    return aice, vicen.sum(0), vsnon.sum(0)


def aggregate_tsfc(aicen, Tsfcn):
    """Area-weighted mean surface temperature (0 where no ice)."""
    a = aicen.sum(0)
    return jnp.where(a > puny, (aicen * Tsfcn).sum(0) / jnp.maximum(a, puny),
                     0.0)


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------
def _mix(dst, w_dst, src, dw):
    """Conservative mix of an intensive quantity when dw of weight moves
    from src into a pool of weight w_dst."""
    wt = w_dst + dw
    return jnp.where(wt > puny, (dst * w_dst + src * dw) / jnp.maximum(wt, puny),
                     dst)


def _transfer(state_n, state_m, da, dv):
    """Move (da area, dv ice volume) from category tuple state_n into
    state_m.  Area-based tracers (Tsfc, snow volume+energy, ta) move with
    fa=da/a; ice-volume tracers (ice energy, tv) move with fv=dv/v.
    Returns updated tuples.

    state_* = (a, v, vs, Tsf, qin[nilyr,N], qsn[nslyr,N],
               ta[Ka,N], tv[Kv,N]) — ta/tv may be zero-size."""
    a_n, v_n, vs_n, t_n, qi_n, qs_n, ta_n, tv_n = state_n
    a_m, v_m, vs_m, t_m, qi_m, qs_m, ta_m, tv_m = state_m

    da = jnp.clip(da, 0.0, a_n * (1.0 - puny))
    dv = jnp.clip(dv, 0.0, v_n * (1.0 - puny))
    # degenerate guards: only move when donor has substance
    ok = (a_n > puny) & (v_n > puny)
    da = jnp.where(ok, da, 0.0)
    dv = jnp.where(ok, dv, 0.0)

    fa = da / jnp.maximum(a_n, puny)
    dvs = vs_n * fa

    t_m2 = _mix(t_m, a_m, t_n, da)
    qi_m2 = _mix(qi_m, v_m[None], qi_n, dv[None])
    qs_m2 = _mix(qs_m, vs_m[None], qs_n, dvs[None])
    ta_m2 = _mix(ta_m, a_m[None], ta_n, da[None])
    tv_m2 = _mix(tv_m, v_m[None], tv_n, dv[None])

    new_n = (a_n - da, v_n - dv, vs_n - dvs, t_n, qi_n, qs_n, ta_n, tv_n)
    new_m = (a_m + da, v_m + dv, vs_m + dvs, t_m2, qi_m2, qs_m2,
             ta_m2, tv_m2)
    return new_n, new_m


def _aux_or_empty(ta, tv, like):
    """Default zero-size aux stacks shaped [ncat, 0, N]."""
    ncat, N = like.shape
    if ta is None:
        ta = jnp.zeros((ncat, 0, N), like.dtype)
    if tv is None:
        tv = jnp.zeros((ncat, 0, N), like.dtype)
    return ta, tv


def _unpack(aicen, vicen, vsnon, Tsfcn, qin, qsn, ta, tv, n):
    return (aicen[n], vicen[n], vsnon[n], Tsfcn[n], qin[n], qsn[n],
            ta[n], tv[n])


def _pack(cats):
    """cats: list of per-category tuples -> stacked arrays."""
    outs = []
    for k in range(8):
        outs.append(jnp.stack([c[k] for c in cats]))
    return tuple(outs)


# --------------------------------------------------------------------------
# linear remapping (Lipscomb 2001) — kitd=1
# --------------------------------------------------------------------------
def _fit_line(a, hice, hL, hR):
    """Fit g(h) = g0 + g1*(h-hL) on [hL,hR] with integral a and mean hice,
    adjusting the support to keep g >= 0 (Lipscomb 2001 eq. 14-16)."""
    # shrink support where the mean is in the outer thirds
    eta = hice - hL
    w = hR - hL
    hR = jnp.where(eta < w / 3.0, hL + 3.0 * eta, hR)
    hL = jnp.where(eta > 2.0 * w / 3.0, hR - 3.0 * (hR - hice), hL)
    w = hR - hL
    eta = hice - hL
    ok = (a > puny) & (w > puny)
    ws = jnp.maximum(w, puny)
    g0 = jnp.where(ok, (a / ws) * (4.0 - 6.0 * eta / ws), 0.0)
    g1 = jnp.where(ok, (6.0 * a / ws ** 2) * (2.0 * eta / ws - 1.0), 0.0)
    return g0, g1, hL, hR


def _integrate_g(g0, g1, hL, hR, x0, x1):
    """(area, volume) integrals of g over [x0,x1] clipped to [hL,hR];
    eta coordinates are relative to hL."""
    e0 = jnp.clip(x0, hL, hR) - hL
    e1 = jnp.clip(x1, hL, hR) - hL
    e1 = jnp.maximum(e1, e0)
    da = g0 * (e1 - e0) + 0.5 * g1 * (e1 ** 2 - e0 ** 2)
    dv = hL * da + 0.5 * g0 * (e1 ** 2 - e0 ** 2) \
        + g1 * (e1 ** 3 - e0 ** 3) / 3.0
    da = jnp.maximum(da, 0.0)
    dv = jnp.maximum(dv, 0.0)
    return da, dv


def linear_itd(aicen_init, vicen_init, aicen, vicen, vsnon, Tsfcn, qin, qsn,
               hin_max, ta=None, tv=None):
    """Linear remapping of the thickness distribution after thermodynamic
    growth/melt (kitd=1).  *_init are pre-thermo values; the remap moves
    ice across category boundaries displaced with the growth field.

    Returns updated (aicen, vicen, vsnon, Tsfcn, qin, qsn[, ta, tv]) —
    the aux stacks are returned iff one was passed."""
    had_aux = ta is not None or tv is not None
    ta, tv = _aux_or_empty(ta, tv, aicen)
    ncat = aicen.shape[0]
    hb = [jnp.asarray(hin_max[n], aicen.dtype) for n in range(ncat + 1)]

    def thick(a, v):
        return jnp.where(a > puny, v / jnp.maximum(a, puny), 0.0)

    h_init = [thick(aicen_init[n], vicen_init[n]) for n in range(ncat)]
    h_now = [thick(aicen[n], vicen[n]) for n in range(ncat)]
    dh = [jnp.where((aicen_init[n] > puny) & (aicen[n] > puny),
                    h_now[n] - h_init[n], 0.0) for n in range(ncat)]

    # --- displaced boundaries (Lipscomb 2001 eq. 21-22) -------------------
    hbnew = [None] * (ncat + 1)
    hbnew[0] = jnp.zeros_like(aicen[0])
    hbnew[ncat] = jnp.full_like(aicen[0], float(hin_max[ncat]))
    for n in range(1, ncat):
        lo, hi = n - 1, n
        has_lo = aicen_init[lo] > puny
        has_hi = aicen_init[hi] > puny
        dspan = h_init[hi] - h_init[lo]
        slope = jnp.where(jnp.abs(dspan) > puny,
                          (dh[hi] - dh[lo]) / jnp.where(jnp.abs(dspan) > puny,
                                                        dspan, 1.0), 0.0)
        disp_both = dh[lo] + slope * (hb[n] - h_init[lo])
        disp = jnp.where(has_lo & has_hi, disp_both,
                         jnp.where(has_lo, dh[lo],
                                   jnp.where(has_hi, dh[hi], 0.0)))
        # boundaries must stay ordered between the neighboring fixed bounds
        hbnew[n] = jnp.clip(hb[n] + disp,
                            hb[n - 1] * (1.0 + puny) + puny,
                            hb[n + 1] * (1.0 - puny))

    # --- fit g(h) in each category over the displaced support -------------
    fits = []
    for n in range(ncat):
        g0, g1, hL, hR = _fit_line(aicen[n], h_now[n], hbnew[n], hbnew[n + 1])
        fits.append((g0, g1, hL, hR))

    # --- transfer across each fixed boundary -------------------------------
    cats = [_unpack(aicen, vicen, vsnon, Tsfcn, qin, qsn, ta, tv, n)
            for n in range(ncat)]
    for n in range(1, ncat):
        bnd = hb[n]
        moved_up = hbnew[n] > bnd          # ice grew past the boundary
        # donor when moving up is category n-1 (index lo), integrating
        # its g over [bnd, hbnew]; when moving down the donor is n.
        g0, g1, hL, hR = fits[n - 1]
        da_up, dv_up = _integrate_g(g0, g1, hL, hR, bnd, hbnew[n])
        g0, g1, hL, hR = fits[n]
        da_dn, dv_dn = _integrate_g(g0, g1, hL, hR, hbnew[n], bnd)

        da_up = jnp.where(moved_up, da_up, 0.0)
        dv_up = jnp.where(moved_up, dv_up, 0.0)
        da_dn = jnp.where(moved_up, 0.0, da_dn)
        dv_dn = jnp.where(moved_up, 0.0, dv_dn)

        cats[n - 1], cats[n] = _transfer(cats[n - 1], cats[n], da_up, dv_up)
        cats[n], cats[n - 1] = _transfer(cats[n], cats[n - 1], da_dn, dv_dn)

    out = _pack(cats)
    return out if had_aux else out[:6]


# --------------------------------------------------------------------------
# rebin — shift whole categories whose mean thickness escaped their bounds
# --------------------------------------------------------------------------
def rebin(aicen, vicen, vsnon, Tsfcn, qin, qsn, hin_max, ta=None, tv=None):
    """Restore hin_max(n-1) <= vicen/aicen <= hin_max(n) by moving entire
    category contents to the neighbor (used after ridging and as the
    kitd=0 'delta-function' ITD)."""
    had_aux = ta is not None or tv is not None
    ta, tv = _aux_or_empty(ta, tv, aicen)
    ncat = aicen.shape[0]
    cats = [_unpack(aicen, vicen, vsnon, Tsfcn, qin, qsn, ta, tv, n)
            for n in range(ncat)]

    def hicen(c):
        return jnp.where(c[0] > puny, c[1] / jnp.maximum(c[0], puny), 0.0)

    for n in range(ncat - 1):          # shift up
        move = hicen(cats[n]) > hin_max[n + 1]
        da = jnp.where(move, cats[n][0], 0.0)
        dv = jnp.where(move, cats[n][1], 0.0)
        cats[n], cats[n + 1] = _transfer(cats[n], cats[n + 1], da, dv)
    for n in range(ncat - 1, 0, -1):   # shift down
        move = hicen(cats[n]) < hin_max[n]
        da = jnp.where(move, cats[n][0], 0.0)
        dv = jnp.where(move, cats[n][1], 0.0)
        cats[n], cats[n - 1] = _transfer(cats[n], cats[n - 1], da, dv)
    out = _pack(cats)
    return out if had_aux else out[:6]


# --------------------------------------------------------------------------
# cleanup: zap tiny categories, bound total area
# --------------------------------------------------------------------------
def cleanup_itd(aicen, vicen, vsnon, Tsfcn, qin, qsn, dt, sss=None,
                ta=None, tv=None):
    """Zero categories with negligible area/volume, returning their water,
    salt and (negative) heat to the ocean flux accumulators; rescale area
    if the total exceeds 1 (cleanup_itd of icepack_itd).

    Returns (arrays..., [ta, tv,] dfresh [kg/m^2/s], dfsalt [kg/m^2/s],
    dfhocn [W/m^2]) — aux stacks appear iff one was passed."""
    had_aux = ta is not None or tv is not None
    nilyr = qin.shape[1]
    nslyr = qsn.shape[1]
    zap = (aicen <= puny) | (vicen <= puny)

    # energy content of zapped ice/snow (J/m^2, negative)
    ei = (qin * (vicen / nilyr)[:, None, :]).sum(1)       # [ncat, N]
    es = (qsn * (vsnon / nslyr)[:, None, :]).sum(1)
    dfhocn = jnp.where(zap, ei + es, 0.0).sum(0) / dt
    dfresh = jnp.where(zap, rhoi * vicen + rhos * vsnon, 0.0).sum(0) / dt
    dfsalt = jnp.where(zap, rhoi * vicen * ice_ref_salinity * 1e-3,
                       0.0).sum(0) / dt

    keep = ~zap
    aicen = jnp.where(keep, aicen, 0.0)
    vicen = jnp.where(keep, vicen, 0.0)
    vsnon = jnp.where(keep, vsnon, 0.0)
    Tsfcn = jnp.where(keep, Tsfcn, 0.0)
    qin = jnp.where(keep[:, None, :], qin, 0.0)
    qsn = jnp.where(keep[:, None, :], qsn, 0.0)
    if had_aux:
        ta, tv = _aux_or_empty(ta, tv, aicen)
        ta = jnp.where(keep[:, None, :], ta, 0.0)
        tv = jnp.where(keep[:, None, :], tv, 0.0)

    # bound the total area at 1 by proportional reduction (thickness kept:
    # volume reduced with area, meltwater returned to the ocean)
    aice = aicen.sum(0)
    scale = jnp.where(aice > 1.0, 1.0 / jnp.maximum(aice, puny), 1.0)
    da_fac = 1.0 - scale
    dfresh = dfresh + (rhoi * vicen + rhos * vsnon).sum(0) * da_fac / dt
    dfsalt = dfsalt + (rhoi * vicen).sum(0) * da_fac \
        * ice_ref_salinity * 1e-3 / dt
    dfhocn = dfhocn + (ei + es).sum(0) * da_fac / dt
    aicen = aicen * scale
    vicen = vicen * scale
    vsnon = vsnon * scale
    # aux tracers are intensive (per area / per volume): unchanged by the
    # proportional area rescale
    if had_aux:
        return (aicen, vicen, vsnon, Tsfcn, qin, qsn, ta, tv,
                dfresh, dfsalt, dfhocn)
    return aicen, vicen, vsnon, Tsfcn, qin, qsn, dfresh, dfsalt, dfhocn
