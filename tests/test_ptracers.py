"""Passive tracers (ids 101, 301-303) and relax_to_clim
(ref oce_setup_step.F90:486-592, oce_tracer_mod.F90:87-119,
bc_surface oce_ale_tracer.F90:1178)."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.core.state import zero_forcing


@pytest.fixture(scope="module")
def ptr_model(pi_mesh):
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    # the light (linfs+PP) config: these tests probe passive-tracer
    # plumbing with tight locality bounds that KPP's deep boundary-layer
    # mixing would legitimately violate
    model, atm = setup_pi_model(parity="fast")
    model.cfg.tra.num_tracers = 4
    model.cfg.tra.tracer_ID = [0, 1, 101, 301]
    state, ice = pi_initial_state(model)
    return model, state, ice


def test_ptracer_init(ptr_model):
    model, state, ice = ptr_model
    mesh = model.mesh
    assert state.tr.shape[0] == 4
    # 101 starts zero; 301 starts 1 exactly in the Fram Strait box
    assert float(jnp.abs(state.tr[2]).max()) == 0.0
    pm = dict(model.ptracer_masks)
    assert 3 in pm
    from fesom2_tpu.constants import rad
    glat = np.asarray(mesh.geo_coords[:, 1]) / rad
    glon = np.asarray(mesh.geo_coords[:, 0]) / rad
    inbox = (glat > 77.5) & (glat < 78.0) & (glon > 0.0) & (glon < 10.0)
    assert (np.asarray(pm[3]) == inbox).all()
    t301 = np.asarray(state.tr[3])
    lmask = np.asarray(mesh.node_layer_mask)
    assert (t301[:, inbox][lmask[:, inbox]] == 1.0).all()
    assert (t301[:, ~inbox] == 0.0).all()


def test_ptracer_step_rain_and_restore(ptr_model):
    model, state, ice = ptr_model
    mesh = model.mesh
    step = model.step_fn()
    forcing = dataclasses.replace(
        zero_forcing(mesh),
        prec_rain=jnp.full(mesh.n_nodes, 1e-7))   # ~8.6 mm/day rain
    for _ in range(3):
        state = step(state, forcing)
    tr = np.asarray(state.tr)
    assert np.isfinite(tr).all()
    lmask = np.asarray(mesh.node_layer_mask)
    # rain tracer accumulated at the surface, nonnegative
    assert tr[2][lmask].min() >= -1e-12
    assert tr[2, 0].max() > 0.0
    # deep layers nearly untouched after 3 steps (implicit vertical
    # diffusion leaves an exponentially small tail)
    assert np.abs(tr[2, 10:][lmask[10:]]).max() < 1e-9
    # restored tracer still 1.0 in its box, bounded elsewhere
    pm = np.asarray(dict(model.ptracer_masks)[3])
    assert (tr[3][:, pm][lmask[:, pm]] == 1.0).all()
    assert tr[3].min() > -1e-6 and tr[3].max() < 1.0 + 1e-6


def test_relax_to_clim():
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model(parity="fast")
    model.cfg.tra.clim_relax = 1.0 / (10 * 86400.0)
    state, ice = pi_initial_state(model)
    # sponge everywhere at the namelist rate
    model.relax2clim = jnp.full(model.mesh.n_nodes, model.cfg.tra.clim_relax)
    # perturb T away from the climatology
    mesh = model.mesh
    tr = state.tr.at[0].add(jnp.where(mesh.node_layer_mask, 1.0, 0.0))
    state = dataclasses.replace(state, tr=tr, tr_old=tr)
    forcing = zero_forcing(mesh)

    def drift(n_steps, clim_relax):
        model.cfg.tra.clim_relax = clim_relax
        st = state
        step = model.step_fn()
        for _ in range(n_steps):
            st = step(st, forcing)
        return float(jnp.abs(jnp.where(mesh.node_layer_mask,
                                       st.tr[0] - model.Tclim, 0.0)).mean())

    # relaxation pulls towards Tclim relative to a no-relaxation control
    # (dynamic drift over 3 steps can exceed the small relaxation tendency,
    # so the control comparison is the robust assertion)
    rate = 1.0 / (10 * 86400.0)
    d_relax = drift(3, rate)
    d_free = drift(3, 0.0)
    expected_factor = (1.0 - rate * model.cfg.dt) ** 3
    assert d_relax < d_free
    assert abs(d_relax / d_free - expected_factor) < 5e-3
