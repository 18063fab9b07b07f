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


def test_zlevel_with_local_zstar_fallback():
    """zlevel integrates stably; the local-zstar machinery activates when
    the surface layer would thin below min_hnode (ref oce_ale.F90:1836-2016)."""
    import dataclasses
    model = setup_soufflet_model(which_ale="zlevel")
    state = model.initial_state()
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(6):
        state = step(state, forcing)
    mask = np.asarray(model.mesh.node_layer_mask)
    hn = np.asarray(state.hnode)
    assert np.isfinite(hn).all()
    # thicknesses stay positive everywhere active
    assert hn[mask].min() > 0.0
    # volume bookkeeping: column sum == depth + hbar
    H = np.where(mask, hn, 0.0).sum(0)
    nln = np.asarray(model.mesh.nlevels_node)
    depth = -np.asarray(model.mesh.zbar)[nln - 1]
    assert np.allclose(H, depth + np.asarray(state.hbar), atol=1e-9)


def test_local_zstar_distribution_unit():
    """Unit check of the greedy dhbar distribution: a drawdown larger than
    the surface-layer allowance spreads over subsurface layers respecting
    min_hnode capacity; a following rise refills deficits bottom-up first."""
    import dataclasses
    from fesom2_tpu.core import ale
    model = setup_soufflet_model(which_ale="zlevel")
    mesh = model.mesh
    cfg = model.cfg
    state = model.initial_state()
    forcing = zero_forcing(mesh)
    nom = np.asarray(mesh.zbar[:-1] - mesh.zbar[1:])
    h0 = nom[0]
    # drawdown: surface would go to 0.25*h0 < min_hnode(0.5)*h0
    dh = -0.75 * h0
    state = dataclasses.replace(
        state, hbar=jnp.full(mesh.n_nodes, dh),
        hbar_old=jnp.zeros(mesh.n_nodes))
    out = ale.vert_vel_ale(state, mesh, cfg, forcing)
    hn = np.asarray(out.hnode_new)
    # surface layer clamped at min_hnode * nominal
    assert np.allclose(hn[0], nom[0] * cfg.ale.min_hnode, rtol=1e-6)
    # remainder taken from deeper layers, conservation of total
    col = (hn - np.asarray(state.hnode))[:
        cfg.ale.lzstar_lev].sum(0)
    assert np.allclose(col, dh, atol=1e-9)
    assert (hn[1] < nom[1]).all()

    # refill: same deficit state, now positive dhbar of half the drawdown
    state2 = dataclasses.replace(
        state, hnode=jnp.asarray(hn), hbar=jnp.full(mesh.n_nodes, dh + 0.3 * h0),
        hbar_old=jnp.full(mesh.n_nodes, dh))
    out2 = ale.vert_vel_ale(state2, mesh, cfg, forcing)
    hn2 = np.asarray(out2.hnode_new)
    # deepest deficit layers refill before the surface layer
    assert (hn2[1] - hn[1] > -1e-12).all()
    col2 = (hn2 - hn)[:cfg.ale.lzstar_lev].sum(0)
    assert np.allclose(col2, 0.3 * h0, atol=1e-9)
    # surface refills only after subsurface deficits are gone: where layer 1
    # still below nominal, surface unchanged
    still_def = hn2[1] < nom[1] - 1e-9
    if still_def.any():
        assert np.allclose(hn2[0][still_def], hn[0][still_def], atol=1e-9)


def test_salt_plume_redistribution():
    """SPP moves rejected brine from the surface layer into the mixed layer,
    conserving column salt (ref oce_spp.F90)."""
    import dataclasses
    from fesom2_tpu.core import tracers, eos, dynamics
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model()
    model.cfg.dyn.SPP = True
    state, ice = pi_initial_state(model)
    mesh = model.mesh
    state = dynamics.compute_vel_nodes(state, mesh)
    state = eos.pressure_bv(state, mesh, model.cfg, model.density_ref)
    forcing = dataclasses.replace(
        zero_forcing(mesh), thdgr=jnp.full(mesh.n_nodes, 1e-6))  # growing ice
    S0 = state.tr[1]
    S1 = tracers.salt_plume(S0, state, mesh, forcing, model.cfg)
    dS = np.asarray(S1 - S0)
    assert np.isfinite(dS).all()
    lat = np.asarray(mesh.geo_coords[:, 1])
    nh = lat > 0
    changed = np.abs(dS).max(0) > 0
    # changes only in the NH
    assert not changed[~nh].any()
    assert changed[nh].sum() > 10
    # surface freshens, subsurface gains
    assert (dS[0][changed] < 0).all()
    assert dS[1:, changed].max() > 0
    # column salt conserved: sum(dS * areasvol * hnode) == 0 relative to the
    # redistributed amount (which scales like |dS[0]| * vol[0])
    vol = np.asarray(mesh.areasvol[:-1]) * np.asarray(state.hnode)
    col = (dS * vol).sum(0)
    moved = np.abs(dS[0]) * vol[0]
    assert np.abs(col).max() < 1e-9 * moved.max()


def test_ring_ale_matches_matrix_free(zstar_run):
    """The packed ALE ring operator (ssh.build_ssh_ring_ale) must equal the
    matrix-free edge-stencil operator for the same hbar perturbation —
    the value-update split of the reference (oce_ale.F90:1371-1470)."""
    import jax.numpy as jnp
    from fesom2_tpu.core import ssh
    model, states = zstar_run
    mesh, cfg = model.mesh, model.cfg
    s = states[-1]
    ring = ssh.build_ssh_ring_ale(mesh, cfg)
    hbar_e = ssh.elem_mean_node(s.hbar, mesh)
    hbar_e = jnp.where(mesh.ulevels_elem == 1, hbar_e, 0.0)
    op_ref = ssh.ssh_operator(mesh, cfg, hbar_e=hbar_e)
    op_ring = ring.materialize(hbar_e)
    rng = np.random.RandomState(7)
    for _ in range(2):
        eta = jnp.asarray(rng.randn(mesh.n_nodes))
        y_ref = np.asarray(op_ref(eta))
        y_ring = np.asarray(op_ring(eta))
        scale = np.abs(y_ref).max()
        assert np.allclose(y_ring, y_ref, atol=1e-9 * scale)
    # the hbar dependence is actually exercised (non-zero correction)
    y0 = np.asarray(ring.materialize(jnp.zeros_like(hbar_e))(eta))
    assert np.abs(y0 - y_ring).max() > 0.0
