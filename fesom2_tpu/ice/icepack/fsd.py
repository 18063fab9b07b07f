"""Floe size distribution (FSD) tracers.

Reference behavior: the optional FSD tracer family of the externally
downloaded Icepack library, whose hooks the reference driver declares
(``src/icepack_drivers/icedrv_main.F90:49`` nfsd, ``:677-697``
floe_rad_l/floe_binwidth/d_afsd_* history), after Roach et al. 2018
(JGR Oceans 123, "An emergent sea ice floe size distribution in a global
coupled ocean-sea ice model") and Horvat & Tziperman 2015.

Per thickness category n, ``afsd[k]`` is the fraction of the category's
area occupied by floes whose radius falls in size bin k; ``sum_k afsd = 1``
wherever the category has ice.  The bins ride the generic area-weighted
aux-tracer machinery (state.IcepackConfig.area_tracers), so horizontal
FCT advection, linear ITD remapping, ridging and restart handle them with
no FSD-specific code.

Column processes implemented here (all fully vectorized over nodes):

- **new ice**: frazil area enters the smallest bin when a surface wave
  field is present (pancake formation) and the largest bin otherwise
  (quiescent consolidation) — expressed through the per-tracer "new ice
  value" of ponds.dilute_on_new_ice;
- **radial growth / lateral melt**: floes grow or shrink radially;
  transport in floe-size space with an upwind flux between adjacent bins
  plus the perimeter area term (Roach et al. 2018 eq. 2).  The melt rate
  is the Maykut & Perovich (1987) closure wlat = m1*dT^m2 shared with
  thermo_itd.lateral_melt;
- **welding**: in freezing conditions floes weld together — binned
  Smoluchowski coagulation with a constant kernel (Roach, Smith &
  Dean 2018b, GRL 45);
- **feedback**: the FSD replaces the constant-floe-diameter assumption in
  the lateral-melt closure: rside scales with the area-weighted mean
  inverse diameter (fsd_lateral_melt_scale).

Wave fracture requires a coupled surface-wave spectrum, which neither the
reference (no wave model) nor this framework carries; new-ice placement
honours ``wave_spec`` but the fracture redistribution itself is not
modelled.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import constants as c

# Icepack's standard 12-category floe radius boundaries [m] (lims of
# icepack_fsd::icepack_init_fsd_bounds; Roach et al. 2018 sec. 2.2)
FSD_BOUNDS_12 = np.array([
    6.65000000e-02, 5.31030847e+00, 1.42865861e+01, 2.90576686e+01,
    5.24122136e+01, 8.78691405e+01, 1.39518470e+02, 2.11635752e+02,
    3.08037274e+02, 4.31203059e+02, 5.81277225e+02, 7.55141047e+02,
    9.45812834e+02])


def fsd_bounds(nfsd: int) -> np.ndarray:
    """Floe radius bin boundaries [m], nfsd+1 values."""
    if nfsd == 12:
        return FSD_BOUNDS_12.copy()
    # other bin counts: geometric spacing over the same span
    return np.geomspace(FSD_BOUNDS_12[0], FSD_BOUNDS_12[-1], nfsd + 1)


def fsd_centers(lims: np.ndarray) -> np.ndarray:
    return 0.5 * (lims[1:] + lims[:-1])


def fsd_widths(lims: np.ndarray) -> np.ndarray:
    return lims[1:] - lims[:-1]


def afsd_normalize(afsd, aicen):
    """Renormalize so sum_k afsd = 1 where the category has ice, 0 where
    not.  afsd [ncat, nfsd, N], aicen [ncat, N]."""
    afsd = jnp.maximum(afsd, 0.0)
    s = afsd.sum(1, keepdims=True)
    has = (aicen > c.puny)[:, None, :]
    uniform = 1.0 / afsd.shape[1]
    # ice present but empty distribution (fresh start): all mass in the
    # largest bin would bias melt; choose the largest bin to match the
    # quiescent new-ice convention
    fallback = jnp.zeros_like(afsd).at[:, -1].set(1.0)
    out = jnp.where(s > c.puny, afsd / jnp.maximum(s, c.puny), fallback)
    del uniform
    return jnp.where(has, out, 0.0)


def fsd_radial_evolve(afsd, dr, lims):
    """Advect the distribution in floe-size space by a radial change dr
    (positive growth, negative melt) over the step.

    afsd [ncat, nfsd, N]; dr [ncat, N] (metres of radius change).
    Upwind transfer between adjacent bins (fraction |dr|/width of the
    donor bin crosses the boundary) plus the within-bin perimeter area
    term f <- f*(1 + 2 dr/r) (area of a floe of radius r changes at
    relative rate 2 dr/r; Roach et al. 2018 eq. 2).  The result is
    renormalized by the caller — the net area change itself is carried by
    the ordinary (aicen, vicen) thermodynamics."""
    dt_ = afsd.dtype
    w = jnp.asarray(fsd_widths(lims), dt_)[None, :, None]      # [1,nfsd,1]
    r = jnp.asarray(fsd_centers(lims), dt_)[None, :, None]
    drx = dr[:, None, :]                                       # [ncat,1,N]
    move = jnp.clip(drx / w, -1.0, 1.0)
    up = jnp.maximum(move, 0.0)        # toward larger floes
    dn = jnp.maximum(-move, 0.0)       # toward smaller floes
    out = afsd * (1.0 - up) * (1.0 - dn)
    # gain from the smaller neighbor (growth) and larger neighbor (melt);
    # the largest bin retains its outgoing growth flux, the smallest its
    # outgoing melt flux (true area loss is rside's job)
    gain_up = jnp.concatenate([jnp.zeros_like(afsd[:, :1]),
                               (afsd * up)[:, :-1]], axis=1)
    gain_dn = jnp.concatenate([(afsd * dn)[:, 1:],
                               jnp.zeros_like(afsd[:, :1])], axis=1)
    keep_top = (afsd * up).at[:, :-1].set(0.0)
    keep_bot = (afsd * dn).at[:, 1:].set(0.0)
    out = out + gain_up + gain_dn + keep_top + keep_bot
    # perimeter area term
    out = out * jnp.maximum(1.0 + 2.0 * drx / r, 0.0)
    return jnp.maximum(out, 0.0)


def _weld_targets(lims: np.ndarray) -> np.ndarray:
    """T[i,j]: bin index receiving the floe formed by welding a bin-i and a
    bin-j floe (area-conserving merge: r_new = sqrt(ri^2 + rj^2))."""
    r = fsd_centers(lims)
    rn = np.sqrt(r[:, None] ** 2 + r[None, :] ** 2)
    return np.clip(np.searchsorted(lims, rn, side="right") - 1,
                   0, len(r) - 1)


def fsd_weld(afsd, aicen, freezing, dt, kweld, lims):
    """Floe welding (Roach et al. 2018b): in freezing conditions floes in
    contact merge.  Ordered-pair Smoluchowski step with constant kernel:
    a fraction dt*kweld*aice*afsd_j of bin i's area welds onto bin-j floes
    and lands in the merged bin T[i,j]; summing over j, every bin loses at
    rate dt*kweld*aice (times its content) and the total is conserved.

    kweld [1/s]: welding rate at full ice cover (tunable; the published
    coagulation kernel c_weld = 1e-8 m^2/s acts on number density — this
    area-fraction form absorbs the floe geometry into one constant)."""
    nfsd = afsd.shape[1]
    T = _weld_targets(lims)
    onehot = jnp.asarray(np.eye(nfsd)[T], afsd.dtype)       # [i, j, k]
    rate = jnp.clip(dt * kweld * aicen, 0.0, 0.5) \
        * freezing.astype(afsd.dtype)                       # [ncat, N]
    # contract the Smoluchowski pair sums without materializing the
    # [ncat, nfsd, nfsd, N] pair tensor (that transient is ~1.6 GB f32 at
    # CORE2+ node counts): loss_i = afsd_i * sum_j afsd_j, and the gain is
    # two chained small matmuls over the [i, j] bin axes.
    tot = afsd.sum(1, keepdims=True)                        # [ncat, 1, N]
    loss = afsd * tot * rate[:, None, :]                    # [ncat, i, N]
    # gain_k = sum_i afsd_i * (onehot[i]^T @ afsd)_k; the static i-loop
    # (nfsd=12) keeps every transient at afsd's own [ncat, nfsd, N] size
    gain = jnp.zeros_like(afsd)
    for i in range(nfsd):
        redist = jnp.einsum("jk,cjn->ckn", onehot[i], afsd)
        gain = gain + afsd[:, i, None, :] * redist
    gain = gain * rate[:, None, :]
    return jnp.maximum(afsd - loss + gain, 0.0)


def fsd_lateral_melt_scale(afsd, lims, floediam=None):
    """Per-category multiplier on the Steele (1992) rside: the FSD's
    area-weighted mean inverse diameter over the constant-floediam
    assumption.  scale = floediam * sum_k afsd_k / (2 r_k)."""
    if floediam is None:
        floediam = c.floediam
    r = jnp.asarray(fsd_centers(lims), afsd.dtype)[None, :, None]
    inv_d = (afsd / (2.0 * r)).sum(1)                       # [ncat, N]
    s = afsd.sum(1)
    # empty distribution -> neutral scale 1
    return jnp.where(s > c.puny, floediam * inv_d / jnp.maximum(s, c.puny),
                     1.0)


def fsd_mean_radius(afsd, aicen, lims):
    """Aggregate area-weighted mean floe radius [m] (history field
    fsdrad of the reference driver's FSD output)."""
    r = jnp.asarray(fsd_centers(lims), afsd.dtype)[None, :, None]
    num = (aicen[:, None, :] * afsd * r).sum((0, 1))
    den = (aicen[:, None, :] * afsd).sum((0, 1))
    return jnp.where(den > c.puny, num / jnp.maximum(den, c.puny), 0.0)


def fsd_radial_growth_rate(ipc, afsd, aicen, vicen, dvfraz, dt, lims):
    """Radial growth dr [m per step] of existing floes in freezing
    conditions, from the frazil production rate: the new-ice volume grows
    laterally on the existing floe perimeter (Horvat & Tziperman 2015
    lead-region closure, collapsed to its perimeter scaling).

    dvfraz [m ice / s] grid-mean frazil rate; perimeter density per unit
    ice area P = sum_k 2 afsd_k / r_k [1/m]; dr = dvfraz*dt/(hi * P)
    capped at one bin width per step."""
    r = jnp.asarray(fsd_centers(lims), afsd.dtype)[None, :, None]
    P = (2.0 * afsd / r).sum(1)                             # [ncat, N]
    hi = jnp.where(aicen > c.puny,
                   vicen / jnp.maximum(aicen, c.puny), 0.0)
    dr = dvfraz[None, :] * dt / jnp.maximum(hi * P, c.puny)
    # stability cap: at most half the smallest bin width per step (keeps
    # the upwind transfer fractions and the perimeter factor well inside
    # their valid range)
    wmin = float(fsd_widths(lims).min())
    dr = jnp.clip(dr, 0.0, 0.5 * wmin)
    return jnp.where((aicen > c.puny) & (dvfraz[None, :] > 0.0), dr, 0.0)
