"""Partial bottom cells (ref oce_ale.F90:199-418, namelist.config:33).

The reference CI/production default is use_partial_cell=.true.: the bottom
layer of each element follows the real topographic depth (clamped to ±1/2
layer), the node bottom is the deepest adjacent element, and the geometry
threads through hnode/helem, zbar_3d/Z_3d, PGF, and the SSH stiffness.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.mesh import build_mesh

PI_MESH = "/root/reference/test/meshes/pi"


@pytest.fixture(scope="module")
def meshes():
    full = build_mesh(PI_MESH, force_rotation=True)
    part = build_mesh(PI_MESH, force_rotation=True, use_partial_cell=True)
    return full, part


def test_full_cell_default_unchanged(meshes):
    """use_partial_cell=False must reproduce the full-cell depths exactly."""
    full, _ = meshes
    zb = np.asarray(full.zbar)
    nle = np.asarray(full.nlevels_elem)
    nln = np.asarray(full.nlevels_node)
    assert np.array_equal(np.asarray(full.zbar_e_bot), zb[nle - 1])
    assert np.array_equal(np.asarray(full.zbar_n_bot), zb[nln - 1])
    assert np.allclose(np.asarray(full.bottom_elem_thickness),
                       zb[nle - 2] - zb[nle - 1])


def test_partial_bottom_clamped(meshes):
    """ref :231-296: the adjustment is at most +1/2 of the deeper layer and
    at most -1/2 of the bottom layer; thickness stays positive."""
    _, part = meshes
    zb = np.asarray(part.zbar)
    Z = np.asarray(part.Z)
    nle = np.asarray(part.nlevels_elem)
    nl = part.nl
    zeb = np.asarray(part.zbar_e_bot)
    bet = np.asarray(part.bottom_elem_thickness)
    assert (bet > 0).all()
    assert np.allclose(bet, zb[nle - 2] - zeb)
    # not shallower than the bottom-layer mid depth
    assert (zeb <= Z[nle - 2] + 1e-12).all()
    # not deeper than the mid of the (virtual) layer below
    lower = np.where(nle == nl, zb[nle - 1] + (zb[nle - 1] - Z[nle - 2]),
                     Z[np.minimum(nle, nl - 1) - 1])
    assert (zeb >= lower - 1e-12).all()
    # node bottom = deepest adjacent element (ref :400)
    nie = np.asarray(part.nod_in_elem)
    zadj = np.where(nie >= 0, zeb[np.clip(nie, 0, None)], np.inf)
    assert np.allclose(np.asarray(part.zbar_n_bot), zadj.min(1))


def test_partial_cell_threshold(meshes):
    """Cells whose full bottom-layer thickness is under the threshold stay
    full (ref :231-236)."""
    full, _ = meshes
    thr = 50.0
    m = build_mesh(PI_MESH, force_rotation=True, use_partial_cell=True,
                   partial_cell_thresh=thr)
    zb = np.asarray(m.zbar)
    nle = np.asarray(m.nlevels_elem)
    thick_full = zb[nle - 2] - zb[nle - 1]
    thin = thick_full <= thr
    assert thin.any() and (~thin).any()
    assert np.array_equal(np.asarray(m.zbar_e_bot)[thin], zb[nle - 1][thin])


def test_init_thickness_partial(meshes):
    """hnode/helem bottom rows and zbar_3d/Z_3d carry the partial geometry."""
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs
    _, part = meshes
    st = init_thickness_linfs(allocate_state(part), part)
    nln = np.asarray(part.nlevels_node)
    nle = np.asarray(part.nlevels_elem)
    cols = np.arange(part.n_nodes)
    ecols = np.arange(part.n_elems)
    hn = np.asarray(st.hnode)
    he = np.asarray(st.helem)
    assert np.allclose(hn[nln - 2, cols],
                       np.asarray(part.bottom_node_thickness))
    assert np.allclose(he[nle - 2, ecols],
                       np.asarray(part.bottom_elem_thickness))
    z3 = np.asarray(st.zbar_3d)
    Z3 = np.asarray(st.Z_3d)
    znb = np.asarray(part.zbar_n_bot)
    zb = np.asarray(part.zbar)
    assert np.allclose(z3[nln - 1, cols], znb)
    assert np.allclose(Z3[nln - 2, cols], 0.5 * (zb[nln - 2] + znb))
    # column integral: sum of hnode == surface - bottom depth
    mask = np.asarray(part.node_layer_mask)
    H = np.where(mask, hn, 0.0).sum(0)
    assert np.allclose(H, -znb)


def test_ssh_operator_uses_partial_depth(meshes):
    """The SSH stiffness must see (zbar_e_bot - zbar_e_srf) (ref :1223)."""
    from fesom2_tpu.core import ssh
    from fesom2_tpu.config import ModelConfig
    full, part = meshes
    cfg = ModelConfig()
    H_full = np.asarray(ssh.elem_depth(full))
    H_part = np.asarray(ssh.elem_depth(part))
    assert np.abs(H_full - H_part).max() > 1.0
    assert np.allclose(H_part, np.asarray(part.zbar_e_bot)
                       - np.asarray(part.zbar)[np.asarray(part.ulevels_elem)
                                               - 1])


def test_ring_ale_exact_on_partial_mesh(meshes):
    """Packed ring-ALE operator == matrix-free operator on a partial-cell
    mesh (the H0 baked into the ring must be the partial depth)."""
    from fesom2_tpu.core import ssh
    from fesom2_tpu.config import ModelConfig
    _, part = meshes
    cfg = ModelConfig()
    cfg.ale.which_ALE = "zstar"
    ring = ssh.build_ssh_ring_ale(part, cfg)
    rng = np.random.RandomState(3)
    hbar_e = jnp.asarray(rng.randn(part.n_elems) * 0.1)
    op_ref = ssh.ssh_operator(part, cfg, hbar_e=hbar_e)
    op_ring = ring.materialize(hbar_e)
    eta = jnp.asarray(rng.randn(part.n_nodes))
    y_ref = np.asarray(op_ref(eta))
    y_ring = np.asarray(op_ring(eta))
    assert np.allclose(y_ring, y_ref, atol=1e-9 * np.abs(y_ref).max())


def test_pi_step_partial_cells_finite():
    """A few coupled CI-parity steps with partial cells ON stay finite and
    conserve column volume bookkeeping."""
    from fesom2_tpu.model import setup_pi_model, pi_initial_state, \
        pi_coupled_step_fn
    from fesom2_tpu.forcing.atmos import atm_window
    model, atm = setup_pi_model(parity="ci")
    assert model.cfg.ale.use_partial_cell
    atm = atm_window(atm, 0.0, 5 * model.cfg.dt)
    state, ice = pi_initial_state(model)
    step = pi_coupled_step_fn(model, atm)
    for k in range(3):
        state, ice, _ = step(state, ice, jnp.asarray(k))
    assert np.isfinite(np.asarray(state.eta)).all()
    assert np.isfinite(np.asarray(state.tr)).all()
    mask = np.asarray(model.mesh.node_layer_mask)
    H = np.where(mask, np.asarray(state.hnode), 0.0).sum(0)
    depth = -np.asarray(model.mesh.zbar_n_bot)
    hbar = np.asarray(state.hbar)
    assert np.allclose(H, depth + hbar, atol=1e-6)
