"""Luni-solar tidal potential (ref gen_modules_gpot.F90 mo_tidal)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.forcing import tides


def test_ephemeris_j2000():
    """At J2000 (2000-01-01): solar declination ~ -23 deg (10 days past the
    December solstice), distance factors near 1."""
    # mmccdt=1 -> t=0
    rekts, dekls, cris3, rektm, deklm, crim3 = tides._ephemeris(jnp.asarray(0.0))
    assert float(dekls) == pytest.approx(np.deg2rad(-23.0), abs=np.deg2rad(0.5))
    assert 1.0 < float(cris3) < 1.1            # sun near perihelion: r<1 AU
    assert 0.7 < float(crim3) < 1.4
    assert np.abs(float(deklm)) < np.deg2rad(28.7)  # lunar declination bound


def test_foreph_offset():
    """Timestep offset since 2000-01-01 (ref foreph_ini/eph)."""
    dt = 900.0
    # 1948 is 52 years before 2000, 13 leap years (1948..1996 step 4)
    days = -sum(365 + (1 if (y % 4 == 0 and y % 100 != 0) or y % 400 == 0
                       else 0) for y in range(1948, 2000))
    assert tides.foreph_offset(1948, 1, dt) == (days - 0.5) * 96
    # month offset: Feb 2000 = +31 days
    assert tides.foreph_offset(2000, 2, dt) == (31 - 0.5) * 96


def test_potential_structure():
    """Equilibrium tide: amplitude O(0.1-0.5 m)*g, semidiurnal part largest
    at the equator, time-varying over 6 hours."""
    from fesom2_tpu.constants import g
    dt = 900.0
    lon = jnp.linspace(-np.pi, np.pi, 73)
    for latdeg, lo, hi in ((0.0, 0.15, 0.75), (80.0, 0.0, 0.6)):
        lat = jnp.full_like(lon, np.deg2rad(latdeg))
        mm = tides.foreph_offset(1948, 1, dt)
        p1 = np.asarray(tides.tidal_potential(mm + 1, dt, lon, lat)) / g
        rng = p1.max() - p1.min()           # longitude sweep ~ diurnal cycle
        assert lo <= rng <= hi, (latdeg, rng)
    # semidiurnal lon-structure stronger at the equator
    lat0 = jnp.zeros_like(lon)
    lat80 = jnp.full_like(lon, np.deg2rad(80.0))
    mm = tides.foreph_offset(1948, 1, dt)
    pe = np.asarray(tides.tidal_potential(mm + 1, dt, lon, lat0))
    pp = np.asarray(tides.tidal_potential(mm + 1, dt, lon, lat80))
    # remove mean, compare oscillation amplitude
    assert (pe - pe.mean()).std() > (pp - pp.mean()).std()
    # potential evolves in time (6 h ~ quarter M2 cycle)
    p2 = np.asarray(tides.tidal_potential(mm + 1 + 24, dt, lon, lat0))
    assert np.abs(p2 - pe).max() > 0.05 * np.abs(pe).max()


def test_tides_in_coupled_step(pi_mesh):
    """use_global_tides changes the SSH evolution and stays stable."""
    from fesom2_tpu.model import setup_pi_model, pi_initial_state, \
        pi_coupled_step_fn
    etas = {}
    for tide in (False, True):
        model, atm = setup_pi_model()
        model.cfg.run.use_global_tides = tide
        state, ice = pi_initial_state(model)
        step = pi_coupled_step_fn(model, atm)
        for k in range(3):
            state, ice, _ = step(state, ice, jnp.asarray(k))
        assert np.isfinite(np.asarray(state.eta)).all()
        etas[tide] = np.asarray(state.eta)
    d = np.abs(etas[True] - etas[False]).max()
    assert 1e-6 < d < 0.2, d
