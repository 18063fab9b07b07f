"""EVP ice-subdomain restriction must be exact while ice stays in the cap."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def pi():
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model(dtype=jnp.float64)
    state, ice = pi_initial_state(model, dtype=jnp.float64)
    return model, atm, state, ice


@pytest.mark.parametrize("which", [0, 1, 2])
def test_subdomain_dynamics_exact(pi, which):
    from fesom2_tpu.ice import coupling as ice_cpl
    from fesom2_tpu.ice.evp import ice_dynamics
    from fesom2_tpu.ice.subdomain import build_ice_subdomain
    from fesom2_tpu.ice.state import zero_ice_forcing
    import dataclasses

    model, atm, state, ice = pi
    cfg = model.cfg
    cfg = dataclasses.replace(cfg) if dataclasses.is_dataclass(cfg) else cfg
    old = cfg.ice.whichEVP
    cfg.ice.whichEVP = which
    try:
        mesh = model.mesh
        surf = ice_cpl.ocean2ice(state, mesh)
        forcing = zero_ice_forcing(mesh, jnp.float64)
        forcing = dataclasses.replace(
            forcing,
            stress_atmice_x=jnp.where(ice.a_ice > 0, 0.1, 0.0),
            stress_atmice_y=jnp.where(ice.a_ice > 0, -0.05, 0.0))
        sub = build_ice_subdomain(mesh, lat_deg=40.0)
        full = ice_dynamics(ice, mesh, forcing, surf, cfg)
        rest = ice_dynamics(ice, mesh, forcing, surf, cfg, sub=sub)
        for f in ("u_ice", "v_ice", "sigma11", "sigma12", "sigma22"):
            a = np.asarray(getattr(full, f))
            b = np.asarray(getattr(rest, f))
            assert np.allclose(a, b, rtol=1e-12, atol=1e-14), \
                (f, np.abs(a - b).max())
    finally:
        cfg.ice.whichEVP = old


def test_subdomain_covers_initial_ice(pi):
    from fesom2_tpu.ice.subdomain import build_ice_subdomain
    model, atm, state, ice = pi
    sub = build_ice_subdomain(model.mesh, lat_deg=40.0)
    outside = np.asarray(ice.a_ice)[~np.asarray(sub.node_mask)]
    assert (outside == 0).all()


def test_cap_escape_guard(pi):
    """Ice outside the EVP subdomain cap must trip check_blowup
    (ice/subdomain.py contract; VERDICT r1: the documented guard)."""
    import dataclasses
    from fesom2_tpu.core.diag import check_blowup
    from fesom2_tpu.ice.subdomain import build_ice_subdomain

    model, atm, state, ice = pi
    sub = build_ice_subdomain(model.mesh, lat_deg=40.0)
    assert int(check_blowup(state, model.mesh, ice, ice_sub=sub)) == 0
    # plant ice at an equatorial node (outside the cap)
    glat = np.asarray(model.mesh.geo_coords)[:, 1]
    eq = int(np.argmin(np.abs(glat)))
    assert not bool(sub.node_mask[eq])
    ice_bad = dataclasses.replace(ice, a_ice=ice.a_ice.at[eq].set(0.5))
    assert int(check_blowup(state, model.mesh, ice_bad, ice_sub=sub)) == 1


def test_ice_ave_steps_sequential(pi):
    """ice_ave_steps=2 holds the ice state on non-update steps and steps
    it with ice_dt = 2*dt on update steps (fvom_main.F90:231-239)."""
    from fesom2_tpu.model import pi_coupled_step_fn

    model, atm, state, ice = pi
    old = model.cfg.ice.ice_ave_steps
    model.cfg.ice.ice_ave_steps = 2
    try:
        step = pi_coupled_step_fn(model, atm)
        s, i0 = state, ice
        s, i1, _ = step(s, i0, jnp.asarray(0))   # hold step: ice unchanged
        assert np.array_equal(np.asarray(i1.a_ice), np.asarray(i0.a_ice))
        assert np.array_equal(np.asarray(i1.u_ice), np.asarray(i0.u_ice))
        s, i2, _ = step(s, i1, jnp.asarray(1))   # update step: ice moves
        assert not np.array_equal(np.asarray(i2.u_ice), np.asarray(i1.u_ice))
        assert np.isfinite(np.asarray(s.eta)).all()
    finally:
        model.cfg.ice.ice_ave_steps = old
