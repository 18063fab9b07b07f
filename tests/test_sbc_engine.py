"""Generic namelist-driven surface-forcing engine (&nam_sbc).

ref gen_surface_forcing.F90 sbc_ini :877-1040 (per-variable file/var
selection), nc_readTimeGrid :181-467 (coordinate-name alternatives, lat
flip, time-axis build), nc_sbc_ini_fillnames :469 (prefix+year+'.nc').
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.config import SbcConfig
from fesom2_tpu.forcing.atmos import (load_core_forcing, load_sbc_forcing,
                                      ncep_test_sbc)
from fesom2_tpu.io.netcdf import write_dataset

FORCING = "/root/reference/test/input/global"


def test_engine_matches_legacy_loader(pi_mesh):
    """The nam_sbc engine on the shipped test layout must reproduce the
    hardcoded NCEP loader exactly (same files, same interp, same time
    axes)."""
    legacy = load_core_forcing(pi_mesh, FORCING)
    eng = load_sbc_forcing(pi_mesh, ncep_test_sbc(FORCING), year=1948)
    for f in ("u_wind", "v_wind", "tair", "shum", "swdn", "lwdn", "prec",
              "snow", "runoff", "t_wind", "t_rad", "t_prec"):
        a = np.asarray(getattr(legacy, f))
        b = np.asarray(getattr(eng, f))
        assert np.allclose(a, b, atol=1e-12), \
            f"{f}: max diff {np.abs(a - b).max():.3e}"


def _write_jra_style(tmp, name, var, lat_desc, vals, tvals, ramp=0.0):
    """Tiny synthetic global field file, JRA-ish: own varname, descending
    latitude, units-free time axis."""
    nlon, nlat = 8, 5
    lon = np.linspace(0.0, 315.0, nlon)
    lat = np.linspace(80.0, -80.0, nlat) if lat_desc \
        else np.linspace(-80.0, 80.0, nlat)
    data = np.broadcast_to(vals[:, None, None],
                           (len(tvals), nlat, nlon)).copy()
    # optional latitude ramp so the flip is observable
    data = data + lat[None, :, None] * ramp
    attrs = {}
    variables = {
        "lon": (("lon",), lon),
        "lat": (("lat",), lat),
        "time": (("time",), np.asarray(tvals, np.float64)),
        var: (("time", "lat", "lon"), data),
    }
    path = os.path.join(tmp, name)
    write_dataset(path, {"lon": nlon, "lat": nlat, "time": len(tvals)},
                  variables, attrs=attrs)
    return path


def test_second_layout_jra_style(pi_mesh, tmp_path):
    """A JRA-style layout (different filenames, varnames, descending lat,
    namelist-driven time axis) loads through the same engine with only
    config changes (VERDICT r3 do #5 'synthetic second-layout test')."""
    tmp = str(tmp_path)
    tvals = np.array([0.0, 0.25, 0.5, 0.75])    # raw axis, nm_nc_freq=1 -> days
    for prefix, var, base in (("uas.", "uas", 1.0), ("vas.", "vas", 2.0),
                              ("tas.", "tas", 283.15), ("huss.", "huss", 0.01),
                              ("rsds.", "rsds", 100.0), ("rlds.", "rlds", 300.0),
                              ("prra.", "prra", 1.0e-5), ("prsn.", "prsn", 2.0e-6)):
        _write_jra_style(tmp, f"{prefix}1948.nc", var, lat_desc=True,
                         vals=np.full(4, base), tvals=tvals,
                         ramp=0.01 if var == "huss" else 0.0)
    sbc = SbcConfig(
        nm_xwind_file=os.path.join(tmp, "uas."),
        nm_ywind_file=os.path.join(tmp, "vas."),
        nm_tair_file=os.path.join(tmp, "tas."),
        nm_humi_file=os.path.join(tmp, "huss."),
        nm_qsr_file=os.path.join(tmp, "rsds."),
        nm_qlw_file=os.path.join(tmp, "rlds."),
        nm_prec_file=os.path.join(tmp, "prra."),
        nm_snow_file=os.path.join(tmp, "prsn."),
        nm_nc_iyear=1948, nm_nc_imm=1, nm_nc_idd=1,
        nm_nc_freq=1, nm_nc_tmid=0)
    atm = load_sbc_forcing(pi_mesh, sbc, year=1948)
    # Kelvin -> Celsius conversion fired
    assert np.nanmax(np.asarray(atm.tair)) < 50.0
    assert np.allclose(np.nanmean(np.asarray(atm.tair)), 10.0, atol=0.1)
    # kg/m^2/s -> m/s
    assert np.allclose(np.asarray(atm.prec).mean(), 1.0e-8, rtol=1e-6)
    # namelist time axis: days scaled to seconds, midpointed (tmid=0)
    t = np.asarray(atm.t_rad)
    assert np.allclose(t[:2], [0.125 * 86400.0, 0.375 * 86400.0])
    # latitude flip: the +0.01*lat ramp must come out with northern nodes
    # higher (shum has no K-conversion; base 0.01 + 0.01*lat)
    glat = np.degrees(np.asarray(pi_mesh.geo_coords)[:, 1])
    q = np.asarray(atm.shum)[0]
    north = q[glat > 60].mean()
    south = q[glat < -60].mean()
    assert north > south + 0.5


def test_mkrun_parses_nam_sbc():
    """The reference namelist.forcing's &nam_sbc ports verbatim into
    cfg.sbc (JRA paths/vars), selected per-variable."""
    from fesom2_tpu.mkrun import load_setup
    cfg = load_setup("/root/reference/setups/test_pi/setup.yml")[0]
    assert cfg.sbc.nm_xwind_var == "uas"
    assert cfg.sbc.nm_qsr_var == "rsds"
    assert cfg.sbc.nm_xwind_file.endswith("uas.")
    assert cfg.sbc.nm_nc_iyear == 1900
    assert cfg.sbc.l_mslp is False and cfg.sbc.l_snow is True
    # files do not exist here -> setup_pi_model falls back to the shipped
    # test layout (exercised by every pi test via _finish_pi_setup)


def test_sbc_year_provider(pi_mesh, tmp_path):
    """SbcProvider: year files load on demand, prefetch runs on a thread
    and get() joins it; per-year series carry the right values
    (the forcing_provider_async analog at year granularity)."""
    from fesom2_tpu.forcing.atmos import SbcProvider
    tmp = str(tmp_path)
    tvals = np.array([0.0, 90.0, 180.0, 270.0])
    for year, base in ((1948, 1.0), (1949, 2.0)):
        for prefix, var in (("uas.", "uas"), ("vas.", "vas"),
                            ("tas.", "tas"), ("huss.", "huss"),
                            ("rsds.", "rsds"), ("rlds.", "rlds"),
                            ("prra.", "prra"), ("prsn.", "prsn")):
            _write_jra_style(tmp, f"{prefix}{year}.nc", var,
                             lat_desc=False, vals=np.full(4, base),
                             tvals=tvals)
    sbc = SbcConfig(
        nm_xwind_file=os.path.join(tmp, "uas."),
        nm_ywind_file=os.path.join(tmp, "vas."),
        nm_tair_file=os.path.join(tmp, "tas."),
        nm_humi_file=os.path.join(tmp, "huss."),
        nm_qsr_file=os.path.join(tmp, "rsds."),
        nm_qlw_file=os.path.join(tmp, "rlds."),
        nm_prec_file=os.path.join(tmp, "prra."),
        nm_snow_file=os.path.join(tmp, "prsn."),
        nm_nc_freq=1)
    prov = SbcProvider(pi_mesh, sbc)
    prov.prefetch(1948)
    a48 = prov.get(1948)
    prov.prefetch(1949)
    a49 = prov.get(1949)
    # the u-wind base distinguishes years (rotation mixes u/v, so compare
    # the rotation-free shortwave series instead)
    assert np.allclose(np.asarray(a49.swdn).mean(),
                       2.0 * np.asarray(a48.swdn).mean(), rtol=1e-6)
    prov.evict(1948)
    assert 1948 not in prov._cache
