"""GOTM-derived bulk formulae (ref gen_surface_forcing.F90:1328-2104)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.forcing import gotm_bulk as gb


def test_humidity_methods():
    airp = jnp.asarray([101325.0])
    tw = jnp.asarray([15.0])
    ta = jnp.asarray([10.0])
    # method 4: specific humidity passthrough
    qa, qs, rhoa, ea, es = gb.humidity(4, jnp.asarray([0.007]), airp, tw, ta)
    assert float(qa[0]) == 0.007
    # saturation humidity at 15C ~ 0.0105 kg/kg (with the 0.98 salinity factor)
    assert 0.009 < float(qs[0]) < 0.012
    # air density ~ 1.2 kg/m3
    assert 1.1 < float(rhoa[0]) < 1.35
    # method 1 (RH%): 100% RH at ta=tw gives qa ~ qs/0.98
    qa1, qs1, _, _, _ = gb.humidity(1, jnp.asarray([100.0]), airp, tw, tw)
    assert float(qa1[0]) == pytest.approx(float(qs1[0]) / 0.98, rel=0.02)


def test_back_radiation_methods():
    lat = jnp.asarray([45.0])
    tw = jnp.asarray([288.0])
    ta = jnp.asarray([285.0])
    cloud = jnp.asarray([0.5])
    qa, qs, rhoa, ea, es = gb.humidity(4, jnp.asarray([0.007]),
                                       jnp.asarray([101325.0]),
                                       tw - 273.16, ta - 273.16)
    for m in (1, 2, 3, 4):
        qb = gb.back_radiation(m, lat, tw, ta, cloud, ea, qa)
        # net longwave cooling of the ocean: O(-30..-120) W/m2
        assert -150.0 < float(qb[0]) < 0.0, (m, float(qb[0]))


def test_solar_zenith_and_shortwave():
    # local noon at the equator near equinox: near-overhead sun
    z = gb.solar_zenith_angle(80, 12.0, jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert float(z[0]) < 5.0
    q_clear = gb.short_wave_radiation(z, 80, jnp.asarray([0.0]),
                                      jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert 700.0 < float(q_clear[0]) < 1100.0
    # overcast reduces it
    q_cloud = gb.short_wave_radiation(z, 80, jnp.asarray([0.0]),
                                      jnp.asarray([0.0]), jnp.asarray([1.0]))
    assert float(q_cloud[0]) < 0.6 * float(q_clear[0])
    # midnight: zenith 90, no shortwave
    z2 = gb.solar_zenith_angle(80, 0.0, jnp.asarray([0.0]), jnp.asarray([0.0]))
    q2 = gb.short_wave_radiation(z2, 80, jnp.asarray([0.0]),
                                 jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert float(q2[0]) <= 1.0


def test_fairall_fluxes():
    """COARE bulk: warm ocean + cold dry air + 8 m/s wind -> upward sensible
    and latent heat, stress aligned with the wind, plausible magnitudes."""
    sst = jnp.asarray([15.0, 15.0])
    airt = jnp.asarray([10.0, 10.0])
    u10 = jnp.asarray([8.0, 0.0])     # second point: calm -> no fluxes
    v10 = jnp.asarray([0.0, 0.0])
    prec = jnp.asarray([0.0, 0.0])
    qa, qs, rhoa, _, _ = gb.humidity(1, jnp.asarray([70.0, 70.0]),
                                     jnp.asarray([101325.0] * 2), sst, airt)
    evap, taux, tauy, qe, qh = gb.fairall(sst, airt, u10, v10, prec,
                                          qs, qa, rhoa)
    # stress: ~rho*Cd*W^2 with Cd~1.5e-3 -> ~0.1 N/m2, along +x
    assert 0.03 < float(taux[0]) < 0.4
    assert abs(float(tauy[0])) < 1e-10
    # sensible qe = cpa*rhoa*Wstar*Tstar < 0 (heat loss), O(10-100)
    assert -300.0 < float(qe[0]) < -5.0
    # latent qh < 0 (evaporation), larger magnitude than sensible typically
    assert -400.0 < float(qh[0]) < -5.0
    # evaporation negative (mass leaving ocean) in this sign convention
    assert float(evap[0]) < 0.0
    # calm point: everything zero
    assert float(jnp.abs(jnp.stack([taux[1], qe[1], qh[1]])).max()) == 0.0


def test_generic_sbc_loader(pi_mesh):
    """nm_sbc-style per-variable loader reproduces the dedicated CORE
    loader on the shipped NCEP files (ref sbc_ini gen_surface_forcing.F90;
    the full engine lives in test_sbc_engine.py — this pins the
    test-layout preset)."""
    from fesom2_tpu.forcing.atmos import (ncep_test_sbc,
                                          load_sbc_forcing,
                                          load_core_forcing)
    base = "/root/reference/test/input/global/"
    a = load_sbc_forcing(pi_mesh, ncep_test_sbc(base), 1948)
    b = load_core_forcing(pi_mesh, base)
    for f in ("u_wind", "v_wind", "tair", "shum", "swdn", "lwdn", "prec",
              "snow", "runoff", "t_wind", "t_rad", "t_prec"):
        va, vb = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert np.allclose(va, vb, atol=1e-12), f
