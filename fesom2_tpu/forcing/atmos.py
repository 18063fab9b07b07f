"""Atmospheric forcing engine for CORE/NCEP-style netCDF series.

Reference: ``src/gen_surface_forcing.F90`` (module g_sbf: sbc_ini :877, sbc_do
:1040, data_timeinterp :851) and the standalone branch of update_atm_forcing
(``src/gen_forcing_couple.F90:255-325``).

Design: at setup, EVERY record of each forcing file for the active YEAR is
interpolated to mesh nodes (numpy) and stacked into a device array
``[T, N]`` — the per-step forcing becomes a pure on-device time
interpolation (jittable).  Sources are namelist-driven (&nam_sbc engine,
``load_sbc_forcing``); multi-year runs stream year-by-year with background
prefetch (``SbcProvider``, the forcing_provider_async_module analog at
year granularity); ``forcing/prefetch.py`` provides the record-level
lookahead readers for series too large to preload.
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


def _read_grid_var(path, varname):
    """Read (lon, lat, time, units, data) with the reference's coordinate-
    name alternatives (nc_readTimeGrid, gen_surface_forcing.F90:181-467:
    LON/lon/longitude/LON1, same for lat, TIME/time)."""
    from scipy.io import netcdf_file
    nc = netcdf_file(path, "r", mmap=False)
    try:
        def pick(*names):
            for n in names:
                if n in nc.variables:
                    return nc.variables[n]
            raise KeyError(f"none of {names} in {path}")
        lon = np.array(pick("LON", "lon", "longitude", "LON1")[:],
                       np.float64)
        lat = np.array(pick("LAT", "lat", "latitude", "LAT1")[:], np.float64)
        tv = pick("TIME", "time")
        t = np.array(tv[:], np.float64)
        units = getattr(tv, "units", b"")
        if isinstance(units, bytes):
            units = units.decode()
        data = np.array(nc.variables[varname][:], np.float64)
        # flip lat ascending (ref :453 "FLIP lat and data")
        if lat.size > 1 and lat[0] > lat[-1]:
            lat = lat[::-1].copy()
            data = data[:, ::-1].copy()
        return lon, lat, t, units, data
    finally:
        nc.close()


def _time_axis_seconds(t, units, year, sbc):
    """Convert a raw netCDF time axis to seconds since Jan 1 of ``year``.

    When the file carries a CF-ish units string ('hours since 1948-01-16
    12:00:00'), use it exactly (the shipped NCEP test files).  Otherwise
    fall back to the reference's namelist-driven convention
    (``nc_time/nm_nc_freq + julday(nm_nc_iyear,imm,idd)``,
    gen_surface_forcing.F90:433)."""
    import re as _re
    m = _re.match(r"\s*(\w+)\s+since\s+(\d+)-(\d+)-(\d+)[T ]?(\d+)?:?(\d+)?",
                  units or "")
    if m:
        scale = {"seconds": 1.0, "hours": 3600.0, "days": 86400.0,
                 "months": 86400.0 * 30.42}[m.group(1).lower()]
        ey, em, ed = int(m.group(2)), int(m.group(3)), int(m.group(4))
        eh = int(m.group(5) or 0)
        emin = int(m.group(6) or 0)
        mdays = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
        off = ((ey - year) * 365.0 + mdays[em - 1] + (ed - 1)) * 86400.0 \
            + eh * 3600.0 + emin * 60.0
        return t * scale + off
    mdays = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
    off = ((sbc.nm_nc_iyear - year) * 365.0 + mdays[sbc.nm_nc_imm - 1]
           + (sbc.nm_nc_idd - 1)) * 86400.0
    tt = t / max(sbc.nm_nc_freq, 1) * 86400.0 + off
    if not sbc.nm_nc_tmid and tt.size > 1:
        # shift stamps to interval mid-points (ref :433-439, JRA-style).
        # The reference updates in place, so the last stamp is extrapolated
        # from the already-midpointed N-1 stamp: t_N + (t_N - mid_{N-1})/2
        # = t_N + (t_N - t_{N-1})/4 — a quarter interval, not a half.
        tt = np.concatenate([0.5 * (tt[:-1] + tt[1:]),
                             [tt[-1] + 0.25 * (tt[-1] - tt[-2])]])
    return tt


def ncep_test_sbc(path: str):
    """SbcConfig describing the shipped NCEP-1948 test set
    (``test/input/global``) — the same layout `load_core_forcing` was
    hardcoded to, now expressed as data so renames/moves are a config
    change, not a code change."""
    from ..config import SbcConfig
    j = lambda p: os.path.join(path, p)
    return SbcConfig(
        nm_xwind_file=j("u_10."), nm_xwind_var="U_10_MOD",
        nm_ywind_file=j("v_10."), nm_ywind_var="V_10_MOD",
        nm_tair_file=j("t_10."), nm_tair_var="T_10_MOD",
        nm_humi_file=j("q_10."), nm_humi_var="Q_10_MOD",
        nm_qsr_file=j("ncar_rad."), nm_qsr_var="SWDN_MOD",
        nm_qlw_file=j("ncar_rad."), nm_qlw_var="LWDN_MOD",
        nm_prec_file=j("ncar_precip."), nm_prec_var="RAIN",
        nm_snow_file=j("ncar_precip."), nm_snow_var="SNOW",
        nm_runoff_file=j("runoff.nc"), runoff_data_source="CORE2",
        nm_sss_data_file=j("PHC2_salx.nc"), sss_data_source="CORE2")


def load_sbc_forcing(mesh: MeshTables, sbc, year: int = 1948,
                     dtype=jnp.float64) -> AtmData:
    """Namelist-driven forcing load (the ``&nam_sbc`` engine of
    ``gen_surface_forcing.F90:877-1040``): per-variable file prefix +
    varname, filename = prefix + year + '.nc' (nc_sbc_ini_fillnames :469),
    per-file coordinate/time handling, bilinear interp onto mesh nodes,
    wind rotation into the mesh frame.

    Unit conventions follow the reference data contracts: tair Kelvin ->
    Celsius, prec/snow kg/m^2/s -> m/s, CORE2-style constant-in-time
    runoff kg/m^2/s -> m/s (sbc_ini :1031-1037).  l_mslp is accepted but
    the pressure series is not carried (press_air stays zero, as in the
    repo's NCEP path)."""
    glon = np.asarray(mesh.geo_coords)[:, 0] / rad
    glat = np.asarray(mesh.geo_coords)[:, 1] / rad
    wcache = {}

    def load(prefix, varname):
        path = f"{prefix}{year}.nc"
        lon, lat, t, units, data = _read_grid_var(path, varname)
        key = (lon.tobytes(), lat.tobytes())
        if key not in wcache:
            wcache[key] = bilinear_weights(lon, lat, glon, glat)
        idx, w = wcache[key]
        series = apply_weights(data, idx, w)
        return series, _time_axis_seconds(t, units, year, sbc)

    u10, t_wind = load(sbc.nm_xwind_file, sbc.nm_xwind_var)
    v10, _ = load(sbc.nm_ywind_file, sbc.nm_ywind_var)
    t10, _ = load(sbc.nm_tair_file, sbc.nm_tair_var)
    q10, _ = load(sbc.nm_humi_file, sbc.nm_humi_var)
    sw, t_rad = load(sbc.nm_qsr_file, sbc.nm_qsr_var)
    lw, _ = load(sbc.nm_qlw_file, sbc.nm_qlw_var)
    if sbc.l_prec:
        pr, t_prec = load(sbc.nm_prec_file, sbc.nm_prec_var)
    else:
        pr, t_prec = np.zeros((2, glon.size)), np.array([0.0, 86400.0])
    if sbc.l_snow:
        sn, _ = load(sbc.nm_snow_file, sbc.nm_snow_var)
    else:
        sn = np.zeros_like(pr)

    # runoff (CORE-style: constant in time, own grid/var naming)
    runoff = np.zeros(glon.size)
    if sbc.nm_runoff_file and sbc.runoff_data_source in ("CORE1", "CORE2"):
        ro = read_vars(sbc.nm_runoff_file, ["lon", "lat", "Foxx_o_roff"])
        idx, w = bilinear_weights(ro["lon"].astype(np.float64),
                                  ro["lat"].astype(np.float64), glon, glat)
        roff = ro["Foxx_o_roff"][0].astype(np.float64)
        roff = np.where(np.abs(roff) > 1e10, 0.0, roff)
        runoff = apply_weights(roff, idx, w) / 1000.0

    if not mesh.cartesian:
        m = rotation_matrix(50.0, 15.0, -90.0)
        rlon = np.asarray(mesh.coords)[:, 0]
        rlat = np.asarray(mesh.coords)[:, 1]
        u10, v10 = _vector_g2r(m, glon * rad, glat * rad, rlon, rlat,
                               u10, v10)

    if np.nanmean(t10) > 100.0:          # Kelvin-coded air temperature
        t10 = t10 - tmelt
    f = lambda x: jnp.asarray(x, dtype)
    return AtmData(u_wind=f(u10), v_wind=f(v10), tair=f(t10), shum=f(q10),
                   t_wind=f(t_wind), swdn=f(sw), lwdn=f(lw), t_rad=f(t_rad),
                   prec=f(pr / 1000.0), snow=f(sn / 1000.0),
                   t_prec=f(t_prec), runoff=f(runoff))


class SbcProvider:
    """Year-switching forcing source with background prefetch.

    The reference reads forcing records on a lookahead thread
    (``forcing_provider_async_module.F90:35-133``); on TPU the preload-
    a-year-to-device path wins inside a year, so the async boundary moves
    to the YEAR switch: while year Y steps, year Y+1 loads on a host
    thread (file IO + interp release the GIL) and is ready when the clock
    rolls over.  This is the default data path for multi-year runs
    (run_pi wires it via model.sbc)."""

    def __init__(self, mesh, sbc, dtype=jnp.float64):
        import threading
        self.mesh = mesh
        self.sbc = sbc
        self.dtype = dtype
        self._cache = {}
        self._threads = {}
        self._lock = threading.Lock()

    def _load(self, year):
        atm = load_sbc_forcing(self.mesh, self.sbc, year=year,
                               dtype=self.dtype)
        with self._lock:
            self._cache[year] = atm

    def prefetch(self, year):
        import threading
        with self._lock:
            if year in self._cache or year in self._threads:
                return
            t = threading.Thread(target=self._load, args=(year,),
                                 daemon=True)
            self._threads[year] = t
        t.start()

    def get(self, year) -> AtmData:
        with self._lock:
            t = self._threads.pop(year, None)
        if t is not None:
            t.join()
        with self._lock:
            if year in self._cache:
                return self._cache[year]
        self._load(year)
        return self._cache[year]

    def evict(self, year):
        with self._lock:
            self._cache.pop(year, None)


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
