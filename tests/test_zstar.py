"""zstar ALE: moving layer thicknesses, varying-coefficient SSH operator."""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.model import setup_soufflet_model
from fesom2_tpu.core.state import zero_forcing


@pytest.fixture(scope="module")
def zstar_run():
    model = setup_soufflet_model(which_ale="zstar")
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    states = [state]
    for _ in range(6):
        states.append(step(states[-1], forcing))
    return model, states


def test_zstar_runs_finite(zstar_run):
    model, states = zstar_run
    s = states[-1]
    for f in ("u", "v", "eta", "tr", "w", "hnode", "hbar"):
        assert np.isfinite(np.asarray(getattr(s, f))).all(), f


def test_zstar_thickness_moves_with_hbar(zstar_run):
    """Layer thicknesses must deviate from nominal following hbar."""
    model, states = zstar_run
    s = states[-1]
    mask = np.asarray(model.mesh.node_layer_mask)
    dz_nom = np.asarray(model.mesh.zbar[:-1] - model.mesh.zbar[1:])[:, None]
    dev = np.where(mask, np.asarray(s.hnode) - dz_nom, 0.0)
    assert np.abs(dev).max() > 1e-8     # layers actually moved
    # column integral of hnode == depth + hbar (volume bookkeeping)
    H = np.where(mask, np.asarray(s.hnode), 0.0).sum(0)
    nln = np.asarray(model.mesh.nlevels_node)
    depth = -np.asarray(model.mesh.zbar)[nln - 1]
    hbar = np.asarray(s.hbar)
    assert np.allclose(H, depth + hbar, atol=1e-8)


def test_zstar_volume_conserved(zstar_run):
    """Zero freshwater flux: total ocean volume constant."""
    model, states = zstar_run
    area = np.asarray(model.mesh.areasvol)[:-1]
    mask = np.asarray(model.mesh.node_layer_mask)

    def vol(s):
        return float((np.where(mask, np.asarray(s.hnode), 0.0) * area).sum())

    v0, v1 = vol(states[0]), vol(states[-1])
    assert abs(v1 - v0) / v0 < 1e-9


def test_zstar_tracer_content_conserved(zstar_run):
    """Salt content conserved under advection+ALE (no fluxes, S init uniform 35)."""
    model, states = zstar_run
    area = np.asarray(model.mesh.areasvol)[:-1]
    mask = np.asarray(model.mesh.node_layer_mask)

    def salt(s):
        return float((np.where(mask, np.asarray(s.tr[1] * s.hnode), 0.0) * area).sum())

    s0, s1 = salt(states[0]), salt(states[-1])
    assert abs(s1 - s0) / abs(s0) < 1e-7


def test_shchepetkin_pgf_no_sigma_error():
    """With density a pure (linear) function of actual depth, the density-
    Jacobian PGF must vanish to roundoff even on horizontally-distorted
    zstar layers (the defining property of Shchepetkin & McWilliams 2003;
    ref pressure_force_4_zxxxx_shchepetkin oce_ale_pressure_bv.F90:1878)."""
    import dataclasses
    from fesom2_tpu.core import ale
    from fesom2_tpu.core.dynamics import pressure_force_zxxxx_shchepetkin

    model = setup_soufflet_model(which_ale="zstar")
    mesh = model.mesh
    state = model.initial_state()
    # distort layer thicknesses with a smooth horizontal modulation
    x = np.asarray(mesh.coords)[:, 0]
    mod = 1.0 + 0.08 * np.sin(2 * np.pi * (x - x.min())
                              / (x.max() - x.min() + 1e-30))
    hnew = state.hnode * jnp.asarray(mod)[None, :]
    state = dataclasses.replace(state, hnode_new=hnew)
    state = ale.update_thickness(state, mesh, model.cfg)
    # density linear in actual depth
    rho = -0.01 * state.Z_3d
    state = dataclasses.replace(state, density_m_rho0=jnp.where(
        mesh.node_layer_mask, rho, 0.0))
    out = pressure_force_zxxxx_shchepetkin(state, mesh)
    pgf = np.asarray(out.pgf_x)
    # the uncorrected along-layer term alone would be O(drho_dx*h*g/rho0)
    from fesom2_tpu.core.ops import scalar_gradient
    gx, _ = scalar_gradient(state.density_m_rho0, mesh)
    lmask = np.asarray(mesh.elem_layer_mask)
    naive = np.abs(np.cumsum(np.where(lmask, np.asarray(gx), 0.0)
                             * np.asarray(state.helem), axis=0)).max() \
        * 9.81 / 1030.0
    assert naive > 1e-8          # the distortion does create a raw signal
    assert np.abs(pgf[lmask]).max() < 1e-6 * naive
