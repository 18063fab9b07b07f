"""End-to-end soufflet channel: the reference's minimal full-physics config.

Checks: step runs under jit, stays finite, conserves volume (linfs SSH mean),
and produces physically sane fields after several steps.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.model import setup_soufflet_model


@pytest.fixture(scope="module")
def model():
    return setup_soufflet_model()


@pytest.fixture(scope="module")
def state0(model):
    return model.initial_state()


def test_initial_state_sane(model, state0):
    m = model.mesh
    T = np.asarray(state0.tr[0])
    mask = np.asarray(m.node_layer_mask)
    assert np.isfinite(T).all()
    # Soufflet temperatures ~ 2..20 C in active cells
    assert T[mask].min() > 0.0 and T[mask].max() < 25.0
    U = np.asarray(state0.u)
    emask = np.asarray(m.elem_layer_mask)
    assert np.abs(U[emask]).max() < 2.0
    assert np.abs(U[emask]).max() > 0.01  # geostrophic jet present


def test_steps_run_finite(model, state0):
    step = model.step_fn()
    from fesom2_tpu.core.state import zero_forcing
    forcing = zero_forcing(model.mesh)
    s = state0
    for _ in range(5):
        s = step(s, forcing)
    for name in ("u", "v", "eta", "tr", "w", "hbar"):
        arr = np.asarray(getattr(s, name))
        assert np.isfinite(arr).all(), name
    # velocities bounded
    assert np.abs(np.asarray(s.u)).max() < 3.0
    assert np.abs(np.asarray(s.eta)).max() < 2.0
    # temperature within initial bounds (FCT should not overshoot much)
    mask = np.asarray(model.mesh.node_layer_mask)
    T = np.asarray(s.tr[0])[mask]
    assert T.min() > -1.0 and T.max() < 26.0


def test_ssh_solver_converges(model, state0):
    import jax
    from fesom2_tpu.core import ssh
    from fesom2_tpu.core.state import zero_forcing
    forcing = zero_forcing(model.mesh)
    # manufactured rhs
    rhs = jnp.asarray(np.sin(np.asarray(model.mesh.coords)[:, 1] * 50.0)) \
        * model.mesh.area[0]
    d_eta, it, res = ssh.solve_ssh(state0, model.mesh, model.cfg,
                                   model.ssh_diag_inv, rhs)
    assert float(res) < 1e-9
    assert int(it) < 500
    # verify residual against operator
    op = ssh.ssh_operator(model.mesh, model.cfg)
    err = np.asarray(op(d_eta) - rhs)
    assert np.abs(err).max() / np.abs(np.asarray(rhs)).max() < 1e-7


def test_volume_conservation_linfs(model, state0):
    """For linfs with zero water flux, area-integrated hbar stays ~0."""
    step = model.step_fn()
    from fesom2_tpu.core.state import zero_forcing
    forcing = zero_forcing(model.mesh)
    s = state0
    for _ in range(3):
        s = step(s, forcing)
    a = np.asarray(model.mesh.area[0])
    hbar_int = float((np.asarray(s.hbar) * a).sum() / a.sum())
    assert abs(hbar_int) < 1e-6
