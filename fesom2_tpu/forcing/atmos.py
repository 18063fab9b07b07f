"""Atmospheric forcing engine for CORE/NCEP-style netCDF series.

Reference: ``src/gen_surface_forcing.F90`` (module g_sbf: sbc_ini :877, sbc_do
:1040, data_timeinterp :851) and the standalone branch of update_atm_forcing
(``src/gen_forcing_couple.F90:255-325``).

Round-1 design: at setup, EVERY record of each forcing file is interpolated to
mesh nodes (numpy) and stacked into a device array ``[T, N]`` — for the
shipped test year (5 records) this is tiny and makes the per-step forcing a
pure on-device time interpolation (jittable, async-prefetch-free).  A
streaming prefetch provider (reference ``forcing_provider_async_module``)
is the planned path for multi-year production data.
"""
from __future__ import annotations

from dataclasses import dataclass, replace as dreplace
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import rad
from ..mesh import MeshTables
from ..mesh.rotation import rotation_matrix
from ..io.netcdf import read_vars
from ..ice.state import IceForcing, rhoair, tmelt
from .interp import bilinear_weights, apply_weights
from .bulk import ncar_ocean_fluxes

Cd_atm_ice = 1.32e-3     # gen_modules_forcing.F90:19


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AtmData:
    """Nodal time series of atmospheric state + per-file time axes [s]."""
    u_wind: jnp.ndarray     # [T, N] (rotated frame)
    v_wind: jnp.ndarray
    tair: jnp.ndarray       # [T, N] Celsius
    shum: jnp.ndarray
    t_wind: jnp.ndarray     # [T] seconds since year start
    swdn: jnp.ndarray       # [Tr, N]
    lwdn: jnp.ndarray
    t_rad: jnp.ndarray
    prec: jnp.ndarray       # [Tp, N] m/s water
    snow: jnp.ndarray       # [Tp, N] m/s water-equivalent
    t_prec: jnp.ndarray
    runoff: jnp.ndarray     # [N] climatological, m/s


def _interp_series(path, varnames, mesh_lon_deg, mesh_lat_deg):
    data = read_vars(path, ["LON", "LAT", "TIME"] + varnames)
    idx, w = bilinear_weights(data["LON"].astype(np.float64),
                              data["LAT"].astype(np.float64),
                              mesh_lon_deg, mesh_lat_deg)
    out = [apply_weights(data[v].astype(np.float64), idx, w) for v in varnames]
    return out, data["TIME"].astype(np.float64)


def load_core_forcing(mesh: MeshTables, path: str,
                      dtype=jnp.float64) -> AtmData:
    """Load the NCEP/CORE test forcing (``test/input/global``)."""
    glon = np.asarray(mesh.geo_coords)[:, 0] / rad
    glat = np.asarray(mesh.geo_coords)[:, 1] / rad

    (u10,), t_wind = _interp_series(os.path.join(path, "u_10.1948.nc"),
                                    ["U_10_MOD"], glon, glat)
    (v10,), _ = _interp_series(os.path.join(path, "v_10.1948.nc"),
                               ["V_10_MOD"], glon, glat)
    (t10,), _ = _interp_series(os.path.join(path, "t_10.1948.nc"),
                               ["T_10_MOD"], glon, glat)
    (q10,), _ = _interp_series(os.path.join(path, "q_10.1948.nc"),
                               ["Q_10_MOD"], glon, glat)
    (sw, lw), t_rad = _interp_series(os.path.join(path, "ncar_rad.1948.nc"),
                                     ["SWDN_MOD", "LWDN_MOD"], glon, glat)
    (pr, snow), t_prec = _interp_series(os.path.join(path, "ncar_precip.1948.nc"),
                                        ["RAIN", "SNOW"], glon, glat)

    # runoff: kg/m^2/s on its own grid with different variable naming
    ro = read_vars(os.path.join(path, "runoff.nc"),
                   ["lon", "lat", "Foxx_o_roff"])
    idx, w = bilinear_weights(ro["lon"].astype(np.float64),
                              ro["lat"].astype(np.float64), glon, glat)
    roff = ro["Foxx_o_roff"][0].astype(np.float64)
    roff = np.where(np.abs(roff) > 1e10, 0.0, roff)   # land fill values -> 0
    runoff = apply_weights(roff, idx, w) / 1000.0

    # rotate wind vectors into the mesh frame (ref gen_surface_forcing:1094)
    gcfg_alpha, gcfg_beta, gcfg_gamma = 50.0, 15.0, -90.0
    if not mesh.cartesian:
        m = rotation_matrix(gcfg_alpha, gcfg_beta, gcfg_gamma)
        # vector_g2r: rotate geographic vector components to rotated frame
        rlon = np.asarray(mesh.coords)[:, 0]
        rlat = np.asarray(mesh.coords)[:, 1]
        glon_r = glon * rad
        glat_r = glat * rad
        u10, v10 = _vector_g2r(m, glon_r, glat_r, rlon, rlat, u10, v10)

    # time axes: u/t/q 6-hourly "hours since 1948-01-01 03:00"; rad daily
    # "days since 1948-01-01 12:00"; precip monthly "hours since 1948-01-16 12:00"
    f = lambda x: jnp.asarray(x, dtype)
    return AtmData(
        u_wind=f(u10), v_wind=f(v10), tair=f(t10 - tmelt), shum=f(q10),
        t_wind=f(t_wind * 3600.0 + 3.0 * 3600.0),
        swdn=f(sw), lwdn=f(lw), t_rad=f(t_rad * 86400.0 + 12.0 * 3600.0),
        prec=f(pr / 1000.0), snow=f(snow / 1000.0),
        t_prec=f(t_prec * 3600.0 + 15.5 * 86400.0),
        runoff=f(runoff))


def _vector_g2r(m, glon, glat, rlon, rlat, u, v):
    """Rotate geographic vector components (u,v) to the rotated frame.

    Reference: gen_modules_rotate_grid.F90 vector_g2r (flag=0 path): convert
    lon/lat components to 3D Cartesian, rotate, project back.
    """
    # geographic basis
    tg = np.array([-np.sin(glon), np.cos(glon), np.zeros_like(glon)])       # e_lon
    ng = np.array([-np.sin(glat) * np.cos(glon), -np.sin(glat) * np.sin(glon),
                   np.cos(glat)])                                            # e_lat
    # 3D vector in geographic cartesian
    V = u[..., None, :] * tg[None, :, :] if u.ndim == 2 else u * tg
    if u.ndim == 2:
        V = u[:, None, :] * tg[None] + v[:, None, :] * ng[None]   # [T, 3, N]
    else:
        V = u * tg + v * ng
    # rotate: r = M . g  (M is r2g matrix; g->r uses M as row-transform)
    Vr = np.einsum("ij,tjn->tin", m, V) if V.ndim == 3 else m @ V
    # rotated basis
    tr = np.array([-np.sin(rlon), np.cos(rlon), np.zeros_like(rlon)])
    nr = np.array([-np.sin(rlat) * np.cos(rlon), -np.sin(rlat) * np.sin(rlon),
                   np.cos(rlat)])
    if Vr.ndim == 3:
        ur = np.einsum("tin,in->tn", Vr, tr)
        vr = np.einsum("tin,in->tn", Vr, nr)
    else:
        ur = (Vr * tr).sum(0)
        vr = (Vr * nr).sum(0)
    return ur, vr


def atm_window(atm: AtmData, t0: float, t1: float) -> AtmData:
    """Restrict the preloaded series to the model-time window [t0, t1] s.

    Keeps one bracketing row each side so _time_interp is exact inside the
    window (and clamps outside, as it already does at the series edges).
    At CORE2+ mesh sizes the full year of 6-hourly [T, N] fields is
    multi-GB of device memory — enough to push the big tracer stage into
    XLA rematerialization — while a run/bench segment only ever reads a
    few rows."""
    import dataclasses as _dc
    import numpy as _np

    def cut(series, taxis):
        t = _np.asarray(taxis)
        assert len(t) >= 2, "forcing series needs >= 2 time rows"
        # clamp i0 so the slice always keeps two bracketing rows even when
        # [t0, t1] lies at/after the end of the series
        i0 = min(max(0, int(_np.searchsorted(t, t0)) - 1), len(t) - 2)
        i1 = min(len(t), int(_np.searchsorted(t, t1)) + 1)
        i1 = max(i1, i0 + 2)                # >= 2 rows for interp
        return series[i0:i1], taxis[i0:i1]

    u, tw = cut(atm.u_wind, atm.t_wind)
    v, _ = cut(atm.v_wind, atm.t_wind)
    ta, _ = cut(atm.tair, atm.t_wind)
    q, _ = cut(atm.shum, atm.t_wind)
    sw, tr = cut(atm.swdn, atm.t_rad)
    lw, _ = cut(atm.lwdn, atm.t_rad)
    pr, tp = cut(atm.prec, atm.t_prec)
    sn, _ = cut(atm.snow, atm.t_prec)
    return _dc.replace(atm, u_wind=u, v_wind=v, tair=ta, shum=q, t_wind=tw,
                       swdn=sw, lwdn=lw, t_rad=tr, prec=pr, snow=sn,
                       t_prec=tp)


def _time_interp(series, taxis, t):
    """Linear interpolation of [T, N] series at scalar time t [s] (clamped)."""
    T = series.shape[0]
    i = jnp.clip(jnp.searchsorted(taxis, t) - 1, 0, T - 2)
    t0 = taxis[i]
    t1 = taxis[i + 1]
    w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1.0), 0.0, 1.0)
    return (1.0 - w) * series[i] + w * series[i + 1]


def atm_state_at(atm: AtmData, t_sec):
    """Atmospheric state at model time t_sec (jittable)."""
    return dict(
        u_wind=_time_interp(atm.u_wind, atm.t_wind, t_sec),
        v_wind=_time_interp(atm.v_wind, atm.t_wind, t_sec),
        tair=_time_interp(atm.tair, atm.t_wind, t_sec),
        shum=_time_interp(atm.shum, atm.t_wind, t_sec),
        shortwave=_time_interp(atm.swdn, atm.t_rad, t_sec),
        longwave=_time_interp(atm.lwdn, atm.t_rad, t_sec),
        prec=_time_interp(atm.prec, atm.t_prec, t_sec),
        snow=_time_interp(atm.snow, atm.t_prec, t_sec),
        runoff=atm.runoff,
    )


def update_atm_forcing(atm: AtmData, t_sec, ice_u, ice_v, ocean_u_w,
                       ocean_v_w, sst, base: IceForcing) -> IceForcing:
    """Standalone-forcing path of update_atm_forcing (ref :255-325):
    interp to time -> NCAR bulk coefficients -> wind stresses."""
    s = atm_state_at(atm, t_sec)
    cd, ch, ce = ncar_ocean_fluxes(s["tair"], sst, s["shum"], s["u_wind"],
                                   s["v_wind"], ocean_u_w, ocean_v_w)
    # ref :305-307 uses (1-Swind)*u_w with default Swind=0 => relative wind
    dux = s["u_wind"] - ocean_u_w
    dvy = s["v_wind"] - ocean_v_w
    aux = jnp.sqrt(dux ** 2 + dvy ** 2) * rhoair
    sox = cd * aux * dux
    soy = cd * aux * dvy
    dux = s["u_wind"] - ice_u
    dvy = s["v_wind"] - ice_v
    aux = jnp.sqrt(dux ** 2 + dvy ** 2) * rhoair
    six = Cd_atm_ice * aux * dux
    siy = Cd_atm_ice * aux * dvy
    return dreplace(base, shortwave=s["shortwave"], longwave=s["longwave"],
                    Tair=s["tair"], shum=s["shum"], prec_rain=s["prec"],
                    prec_snow=s["snow"], runoff=s["runoff"],
                    u_wind=s["u_wind"], v_wind=s["v_wind"],
                    stress_atmoce_x=sox, stress_atmoce_y=soy,
                    stress_atmice_x=six, stress_atmice_y=siy,
                    Ch_atm_oce=ch, Ce_atm_oce=ce)


# --------------------------------------------------------------------------
# generic per-variable forcing spec (&nam_sbc analog)
# --------------------------------------------------------------------------
@dataclass
class SbcVar:
    """One forcing variable: file (or yearly file prefix), variable name,
    and the netCDF time-axis origin offset in seconds (ref &nam_sbc
    namelist.forcing:28-56: nm_*_file/nm_*_var/nm_nc_*)."""
    file: str
    var: str
    time_unit: float = 3600.0      # seconds per time-axis unit
    time_offset: float = 0.0       # seconds added to the axis
    scale: float = 1.0             # unit conversion applied to the data
    offset: float = 0.0


@dataclass
class SbcConfig:
    """nm_sbc=2 style per-variable inputs (JRA55-do / ERA5 layouts)."""
    xwind: SbcVar = None
    ywind: SbcVar = None
    tair: SbcVar = None            # expected Kelvin in file (offset=-tmelt)
    humi: SbcVar = None
    qsr: SbcVar = None             # downward shortwave
    qlw: SbcVar = None             # downward longwave
    prec: SbcVar = None            # kg/m2/s in file (scale 1e-3 -> m/s)
    snow: SbcVar = None
    runoff_file: str = ""
    runoff_var: str = ""


def _detect_coords(path):
    """Find lon/lat/time variable names in a forcing file."""
    from ..io.netcdf import list_vars
    names = list_vars(path)
    low = {n.lower(): n for n in names}
    lon = next(low[k] for k in ("lon", "longitude", "x") if k in low)
    lat = next(low[k] for k in ("lat", "latitude", "y") if k in low)
    time = next(low[k] for k in ("time", "t") if k in low)
    return lon, lat, time


def _read_sbc_var(spec: SbcVar, year: int, glon, glat):
    path = spec.file
    if not os.path.exists(path):
        path = f"{spec.file}{year}.nc"
    lon_n, lat_n, t_n = _detect_coords(path)
    d = read_vars(path, [lon_n, lat_n, t_n, spec.var])
    idx, w = bilinear_weights(d[lon_n].astype(np.float64),
                              d[lat_n].astype(np.float64), glon, glat)
    vals = apply_weights(d[spec.var].astype(np.float64), idx, w)
    vals = vals * spec.scale + spec.offset
    t = d[t_n].astype(np.float64) * spec.time_unit + spec.time_offset
    return vals, t


def load_sbc_forcing(mesh: MeshTables, sbc: SbcConfig, year: int,
                     dtype=jnp.float64) -> AtmData:
    """Generic forcing loader for per-variable file/varname configs
    (the nm_sbc=2 path of sbc_ini/sbc_do, gen_surface_forcing.F90:877-1300).
    Produces the same AtmData the coupled step consumes."""
    glon = np.asarray(mesh.geo_coords)[:, 0] / rad
    glat = np.asarray(mesh.geo_coords)[:, 1] / rad

    u10, t_wind = _read_sbc_var(sbc.xwind, year, glon, glat)
    v10, _ = _read_sbc_var(sbc.ywind, year, glon, glat)
    t10, _ = _read_sbc_var(sbc.tair, year, glon, glat)
    q10, _ = _read_sbc_var(sbc.humi, year, glon, glat)
    sw, t_rad = _read_sbc_var(sbc.qsr, year, glon, glat)
    lw, _ = _read_sbc_var(sbc.qlw, year, glon, glat)
    pr, t_prec = _read_sbc_var(sbc.prec, year, glon, glat)
    snow, _ = _read_sbc_var(sbc.snow, year, glon, glat)

    runoff = np.zeros(mesh.n_nodes)
    if sbc.runoff_file:
        lon_n, lat_n, _t = _detect_coords(sbc.runoff_file)
        d = read_vars(sbc.runoff_file, [lon_n, lat_n, sbc.runoff_var])
        idx, w = bilinear_weights(d[lon_n].astype(np.float64),
                                  d[lat_n].astype(np.float64), glon, glat)
        r = d[sbc.runoff_var]
        r = r[0] if r.ndim == 3 else r
        r = np.where(np.abs(r) > 1e10, 0.0, r.astype(np.float64))
        runoff = apply_weights(r, idx, w) / 1000.0

    if not mesh.cartesian:
        m = rotation_matrix(50.0, 15.0, -90.0)
        rlon = np.asarray(mesh.coords)[:, 0]
        rlat = np.asarray(mesh.coords)[:, 1]
        u10, v10 = _vector_g2r(m, glon * rad, glat * rad, rlon, rlat,
                               u10, v10)

    f = lambda x: jnp.asarray(x, dtype)
    return AtmData(u_wind=f(u10), v_wind=f(v10), tair=f(t10 - tmelt),
                   shum=f(q10), t_wind=f(t_wind), swdn=f(sw), lwdn=f(lw),
                   t_rad=f(t_rad), prec=f(pr / 1000.0),
                   snow=f(snow / 1000.0), t_prec=f(t_prec),
                   runoff=f(runoff))
