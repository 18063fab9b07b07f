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


def test_shortwave_penetration_conserves(pi_mesh):
    """Column sum of the sw_3d layer sources equals the surface visible flux
    (total heat deposited = what was removed from the surface flux); flux is
    monotone decreasing with depth and zero under ice
    (ref oce_shortwave_pene.F90:1-95)."""
    from fesom2_tpu.core.tracers import shortwave_penetration, sw_3d_source
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs

    N = pi_mesh.n_nodes
    state = init_thickness_linfs(allocate_state(pi_mesh), pi_mesh)
    sw_in = jnp.full(N, 200.0)
    a_ice = jnp.zeros(N).at[:10].set(0.5)        # some ice-covered nodes
    sw, dheat = shortwave_penetration(sw_in, a_ice, state.zbar_3d,
                                      pi_mesh, albw=0.1)
    sw = np.asarray(sw)
    assert np.isfinite(sw).all()
    # under ice: nothing penetrates, heat_flux unchanged
    assert np.abs(sw[:, :10]).max() == 0.0
    assert np.abs(np.asarray(dheat)[:10]).max() == 0.0
    # open water: surface interface carries the full visible flux
    expect = (1.0 - 0.1) * 200.0 * 0.54
    assert np.allclose(np.asarray(dheat)[10:], expect)
    assert np.allclose(sw[0, 10:] * 4.2e6, expect)
    # monotone non-increasing with depth
    assert (np.diff(sw[:, 10:], axis=0) <= 1e-15).all()
    # column heat budget: sum of layer sources * areasvol == sw[0] * area[0]
    dt = 900.0
    src = np.asarray(sw_3d_source(jnp.asarray(sw), pi_mesh, dt))
    av = np.asarray(pi_mesh.areasvol)[:-1]
    col = (src * av).sum(0)
    top = sw[0] * np.asarray(pi_mesh.area)[0] * dt
    ok = np.abs(col - top) <= 1e-8 * np.abs(top).max()
    assert ok[10:].all()
