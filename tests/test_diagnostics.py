"""Optional diagnostics (ref gen_modules_diag.F90): curls, energy fields,
density-space MOC binning, salt integral."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.core import diagnostics as dg
from fesom2_tpu.core.state import zero_forcing
from fesom2_tpu.core import eos, dynamics


@pytest.fixture(scope="module")
def pi_run(pi_mesh):
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model()
    state, ice = pi_initial_state(model)
    step = model.step_fn()
    forcing = dataclasses.replace(
        zero_forcing(model.mesh),
        stress_x=jnp.full(model.mesh.n_elems, 0.05),
        heat_flux=jnp.full(model.mesh.n_nodes, 50.0))
    for _ in range(2):
        state = step(state, forcing)
    state = dynamics.compute_vel_nodes(state, model.mesh)
    return model, state, forcing


def test_curl_stress_surf_uniform(pi_run):
    """Curl of a uniform stress vanishes (to metric residual) away from
    coasts (ref diag_curl_stress_surf)."""
    model, state, forcing = pi_run
    mesh = model.mesh
    c = np.asarray(dg.curl_stress_surf(forcing, mesh))
    assert np.isfinite(c).all()
    ne = np.asarray(mesh.node_edges)
    interior = ~(((ne >= mesh.n_edges_in) & (ne >= 0)).any(-1))
    # spherical metric closure residual (cos(lat) varies along the dual
    # loop) — orders below a physical wind-stress curl (~1e-6 N/m^3)
    assert np.abs(c[interior]).max() < 5e-7


def test_diag_energy_fields(pi_run):
    model, state, forcing = pi_run
    out = dg.diag_energy(state, model.mesh, forcing, model.cfg)
    un = np.asarray(state.unode)
    assert np.allclose(np.asarray(out["u_x_u"]),
                       np.where(np.asarray(model.mesh.node_layer_mask),
                                un * un, 0.0))
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # shear production is nonnegative by construction
    assert np.asarray(out["av_dudz_sq"]).min() >= 0.0
    # bottom drag opposes bottom velocity
    ub = np.asarray(out["u_bott"])
    sbx = np.asarray(out["stress_bott_x"])
    nz = np.abs(ub) > 1e-6
    assert (sbx[nz] * ub[nz] <= 0).all()


def test_dens_moc_binning(pi_run):
    """Fractional-overlap binning: weights sum to 1 per active layer, the
    binned volume equals the ocean volume, Z is within the depth range."""
    model, state, forcing = pi_run
    mesh = model.mesh
    al, be = eos.sw_alpha_beta(state.tr[0], state.tr[1], state.Z_3d)
    out = dg.diag_dens_moc(state, mesh, model.cfg, forcing=forcing,
                           sw_alpha=al, sw_beta=be)
    VOL = np.asarray(out["std_dens_VOL"])
    lmask = np.asarray(mesh.elem_layer_mask)
    vol_direct = (np.where(lmask, np.asarray(state.helem), 0.0)
                  * np.asarray(mesh.elem_area)[None, :]).sum()
    assert VOL.sum() == pytest.approx(vol_direct, rel=1e-10)
    UDZ = np.asarray(out["std_dens_UDZ"])
    udz_direct = (np.where(lmask, np.asarray(state.u * state.helem), 0.0)).sum()
    assert UDZ.sum() == pytest.approx(udz_direct, rel=1e-8, abs=1e-10)
    # most volume lands in realistic sigma2 classes (30..40)
    s = dg.STD_DENS
    mid = (s >= 30.0) & (s <= 40.0)
    assert VOL[mid].sum() / VOL.sum() > 0.99
    # surface flux binning sums to the domain total
    H = np.asarray(out["std_dens_flux_H"])
    en = np.asarray(mesh.elem_nodes)
    hf_direct = (np.asarray(al[0] * forcing.heat_flux)[en].mean(-1)
                 / 4.2e6 * np.asarray(mesh.elem_area)).sum()
    assert H.sum() == pytest.approx(hf_direct, rel=1e-8)


def test_salt3d_integral(pi_run):
    model, state, forcing = pi_run
    tot = float(dg.salt3d_integral(state, model.mesh))
    vol = float((np.where(np.asarray(model.mesh.node_layer_mask),
                          np.asarray(state.hnode), 0.0)
                 * np.asarray(model.mesh.areasvol[:-1])).sum())
    mean_s = tot / vol
    assert 30.0 < mean_s < 36.0


def test_dvd_uniform_tracer_vanishes():
    """Discrete variance decay (Klingbeil et al. 2014) is zero to roundoff
    for a spatially uniform tracer: advecting phi and phi^2 consistently
    gives target2 == adv1^2 (ref compute_diag_dvd, gen_modules_diag.F90)."""
    from fesom2_tpu.model import setup_soufflet_model

    model = setup_soufflet_model()
    model.cfg.diag.ldiag_DVD = True
    state = model.initial_state()
    mesh = model.mesh
    # overwrite T with a constant; S already uniform 35
    tr = state.tr.at[0].set(jnp.where(mesh.node_layer_mask, 10.0, 0.0))
    state = dataclasses.replace(state, tr=tr, tr_old=tr)
    step = model.step_fn()
    forcing = zero_forcing(mesh)
    state = step(state, forcing)  # first step: AB tAB == t
    dvd_h = np.asarray(state.dvd_h)
    dvd_v = np.asarray(state.dvd_v)
    assert dvd_h.shape[0] == 2
    assert np.isfinite(dvd_h).all() and np.isfinite(dvd_v).all()
    assert np.abs(dvd_h[0]).max() < 1e-8
    assert np.abs(dvd_v[0]).max() < 1e-8


def test_dvd_real_field_decays_variance():
    """On the stratified soufflet state the vertical DVD of temperature is
    net-positive (upwind-limited advection destroys variance)."""
    from fesom2_tpu.model import setup_soufflet_model

    model = setup_soufflet_model()
    model.cfg.diag.ldiag_DVD = True
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(5):
        state = step(state, forcing)
    mesh = model.mesh
    vol = np.where(np.asarray(mesh.node_layer_mask),
                   np.asarray(state.hnode * mesh.areasvol[:-1]), 0.0)
    dvd_v = np.asarray(state.dvd_v[0])
    assert np.isfinite(dvd_v).all()
    assert (dvd_v * vol).sum() > 0.0
    # and the diagnostics dispatch exposes the fields
    out = dg.compute_diagnostics(state, mesh, model.cfg, forcing)
    assert "tr_dvd_vert_T" in out and "tr_dvd_horiz_S" in out
