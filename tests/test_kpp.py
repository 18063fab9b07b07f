"""KPP mixing scheme tests on the pi mesh."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fesom2_tpu.core.mixing.kpp import _wscale, oce_mixing_kpp, vonk, conc1


def test_wscale_limits():
    # stable: wm = ws = vonk*us/(1+conc1*zeta)
    us = jnp.asarray(0.02)
    zehat = jnp.asarray(2.0e-8)
    wm, ws = _wscale(zehat, us)
    zeta = float(zehat / us ** 3)
    assert float(wm) == pytest.approx(vonk * 0.02 / (1 + conc1 * zeta), rel=1e-6)
    assert float(ws) == pytest.approx(float(wm))
    # neutral: wm -> vonk*us
    wm0, ws0 = _wscale(jnp.asarray(0.0), us)
    assert float(wm0) == pytest.approx(vonk * 0.02, rel=1e-6)
    # unstable: ws > wm >= neutral
    wmu, wsu = _wscale(jnp.asarray(-3.0e-7), us)
    assert float(wsu) > float(wmu) >= float(wm0) * 0.99


def test_kpp_on_pi(pi_mesh):
    """KPP produces bounded, physically plausible mixing coefficients."""
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model()
    model.cfg.dyn.mix_scheme = "KPP"
    state, ice = pi_initial_state(model)
    from fesom2_tpu.core.state import zero_forcing
    from fesom2_tpu.core import eos, dynamics
    forcing = zero_forcing(model.mesh)
    forcing = dataclasses.replace(
        forcing,
        stress_x=jnp.full(model.mesh.n_elems, 0.1),
        heat_flux=jnp.full(model.mesh.n_nodes, 100.0))   # cooling -> convection
    state = dynamics.compute_vel_nodes(state, model.mesh)
    state = eos.pressure_bv(state, model.mesh, model.cfg, model.density_ref)
    out = jax.jit(lambda s: oce_mixing_kpp(s, model.mesh, model.cfg, forcing))(state)
    Kv = np.asarray(out.Kv)
    Av = np.asarray(out.Av)
    assert np.isfinite(Kv).all() and np.isfinite(Av).all()
    assert Kv.min() >= 0.0 and Av.min() >= 0.0
    # coefficients bounded by physical scales (<~1 m2/s)
    assert Kv.max() < 10.0 and Av.max() < 10.0
    # cooling + wind must produce boundary-layer mixing well above background
    assert Kv.max() > 1e-3
    # surface element viscosity floor (ref minmix trick)
    emask0 = np.asarray(model.mesh.elem_layer_mask)[0]
    assert Av[0][emask0].min() >= 3.0e-3 - 1e-12


def test_kpp_step_integrates(pi_mesh):
    """A few full ocean steps with KPP stay finite."""
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    from fesom2_tpu.core.state import zero_forcing
    model, atm = setup_pi_model()
    model.cfg.dyn.mix_scheme = "KPP"
    state, ice = pi_initial_state(model)
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(3):
        state = step(state, forcing)
    assert np.isfinite(np.asarray(state.tr)).all()
    assert np.isfinite(np.asarray(state.u)).all()
    assert np.abs(np.asarray(state.eta)).max() < 2.0
