"""Viscosity filter menu: every option integrates stably on the soufflet
channel and damps (or at most barely excites) kinetic energy relative to the
no-filter step (ref oce_dyn.F90:171-234 dispatch)."""
import numpy as np
import pytest

from fesom2_tpu.model import setup_soufflet_model
from fesom2_tpu.core.state import zero_forcing


@pytest.mark.parametrize("opt", [1, 2, 3, 4, 5, 6, 7, 8])
def test_visc_option_stable(opt):
    model = setup_soufflet_model()
    model.cfg.dyn.visc_option = opt
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(4):
        state = step(state, forcing)
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    assert np.isfinite(u).all() and np.isfinite(v).all(), opt
    # soufflet initial jet peaks around |u| ~ 1 m/s; a sane filter keeps the
    # 4-step velocity bounded well under any runaway growth
    assert np.abs(u).max() < 5.0 and np.abs(v).max() < 5.0, opt


def test_vorticity_of_uniform_flow():
    """Circulation of a constant velocity field vanishes on interior nodes
    (ref relative_vorticity oce_vel_rhs_vinv.F90:14-103)."""
    import dataclasses
    import jax.numpy as jnp
    from fesom2_tpu.core.dynamics import relative_vorticity
    model = setup_soufflet_model()
    mesh = model.mesh
    state = model.initial_state()
    u = jnp.where(mesh.elem_layer_mask, 0.1, 0.0)
    v = jnp.where(mesh.elem_layer_mask, 0.05, 0.0)
    state = dataclasses.replace(state, u=u, v=v)
    vort = np.asarray(relative_vorticity(state, mesh))
    # interior nodes: no incident boundary edge, all full-depth neighbors
    ne = np.asarray(mesh.node_edges)
    interior = ~(((ne >= mesh.n_edges_in) & (ne >= 0)).any(-1))
    nln = np.asarray(mesh.nlevels_node)
    full = interior & (nln == nln.max())
    assert full.sum() > 50
    # not exactly zero on the sphere: cos(lat) varies along the dual loop,
    # so the metric closure residual is O(1e-9) 1/s -- 5 orders below f
    assert np.abs(vort[0][full]).max() < 2e-8


def test_vinv_momentum_steps():
    """Soufflet channel with vector-invariant momentum (mom_adv=3) integrates
    stably and produces trajectories close to flux-form over short times
    (ref compute_vel_rhs_vinv oce_vel_rhs_vinv.F90:104-290)."""
    results = {}
    for adv in (2, 3):
        model = setup_soufflet_model()
        model.cfg.dyn.mom_adv = adv
        state = model.initial_state()
        step = model.step_fn()
        forcing = zero_forcing(model.mesh)
        for _ in range(6):
            state = step(state, forcing)
        u = np.asarray(state.u)
        assert np.isfinite(u).all(), f"mom_adv={adv}"
        assert np.abs(u).max() < 2.0
        results[adv] = u
    # same initial condition, short horizon: schemes agree to leading order
    diff = np.abs(results[2] - results[3]).max()
    assert diff < 0.05, diff
