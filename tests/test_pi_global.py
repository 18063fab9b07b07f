"""Global pi-mesh coupled ocean+ice run with real NCEP forcing + WOA IC.

This is the CI `test_pi` analog (setups/test_pi/setup.yml): 3140-node global
mesh, 48 levels, 96 steps/day, mEVP ice, MUSCL+FCT tracers, NCAR bulk
forcing.  Checks physical sanity after several coupled steps.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.model import setup_pi_model, pi_initial_state, pi_coupled_step_fn


@pytest.fixture(scope="module")
def pi_setup():
    model, atm = setup_pi_model()
    state, ice = pi_initial_state(model)
    return model, atm, state, ice


def test_climatology_ic(pi_setup):
    model, atm, state, ice = pi_setup
    mask = np.asarray(model.mesh.node_layer_mask)
    T = np.asarray(state.tr[0])
    S = np.asarray(state.tr[1])
    assert np.isfinite(T).all() and np.isfinite(S).all()
    assert -3.0 < T[mask].min() and T[mask].max() < 35.0
    assert 2.0 < S[mask].min() and S[mask].max() < 42.0
    # polar surface water cold, tropics warm
    glat = np.asarray(model.mesh.geo_coords)[:, 1]
    trop = np.abs(glat) < np.deg2rad(15)
    assert T[0][trop].mean() > 15.0
    # some initial ice in polar regions
    assert float(ice.a_ice.max()) > 0.5


def test_forcing_loads(pi_setup):
    model, atm, state, ice = pi_setup
    for f in ("u_wind", "tair", "shum", "swdn", "lwdn", "prec"):
        arr = np.asarray(getattr(atm, f))
        assert np.isfinite(arr).all(), f
    assert np.abs(np.asarray(atm.u_wind)).max() < 60.0
    assert -80.0 < np.asarray(atm.tair).min() and np.asarray(atm.tair).max() < 60.0


def test_coupled_steps_run(pi_setup):
    model, atm, state, ice = pi_setup
    step = pi_coupled_step_fn(model, atm)
    for k in range(3):
        state, ice, oce_forcing = step(state, ice, jnp.asarray(k))
    mask = np.asarray(model.mesh.node_layer_mask)
    for name in ("u", "v", "eta", "w"):
        assert np.isfinite(np.asarray(getattr(state, name))).all(), name
    T = np.asarray(state.tr[0])[mask]
    S = np.asarray(state.tr[1])[mask]
    assert np.isfinite(T).all() and np.isfinite(S).all()
    assert T.min() > -4.0 and T.max() < 40.0
    assert S.min() >= 3.0 and S.max() <= 45.0
    assert np.abs(np.asarray(state.u)).max() < 3.0
    assert np.abs(np.asarray(state.eta)).max() < 3.0
    assert np.isfinite(np.asarray(ice.m_ice)).all()
    assert np.asarray(ice.m_ice).min() >= 0.0
    assert np.abs(np.asarray(ice.u_ice)).max() < 2.0
    # forcing produced nonzero surface stress over the ocean
    assert np.abs(np.asarray(oce_forcing.stress_x)).max() > 1e-4
    assert np.abs(np.asarray(oce_forcing.heat_flux)).max() > 1.0
