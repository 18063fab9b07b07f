"""PGF menu variants: nemo (linfs) and cubicspline (linfs + zstar).

Reference: oce_ale_pressure_bv.F90 pressure_force_4_linfs_nemo :479-635,
pressure_force_4_linfs_cubicspline :1252-1444,
pressure_force_4_zxxxx_cubicspline :1697-1866.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.model import setup_pi_model, pi_initial_state
from fesom2_tpu.core import dynamics, eos


@pytest.fixture(scope="module")
def zstate():
    model, atm = setup_pi_model()            # zstar CI config
    state, _ = pi_initial_state(model)
    state = eos.pressure_bv(state, model.mesh, model.cfg, model.density_ref)
    return model, state


def _stats(p, lmask):
    p = np.asarray(p)[np.asarray(lmask)]
    return p


def test_zxxxx_cubicspline_close_to_shchepetkin(zstate):
    """Same physics, different vertical reconstruction: fields must agree
    closely on a smooth state (both are consistent discretizations of the
    same integral)."""
    model, state = zstate
    mesh = model.mesh
    lmask = mesh.elem_layer_mask
    a = dynamics.pressure_force_zxxxx_shchepetkin(state, mesh)
    b = dynamics.pressure_force_zxxxx_cubicspline(state, mesh)
    for f in ("pgf_x", "pgf_y"):
        pa, pb = _stats(getattr(a, f), lmask), _stats(getattr(b, f), lmask)
        assert np.isfinite(pb).all()
        scale = np.abs(pa).max()
        # same magnitude and highly correlated
        assert np.abs(pb).max() < 3.0 * scale
        corr = np.corrcoef(pa, pb)[0, 1]
        assert corr > 0.99, corr
        assert np.abs(pa - pb).mean() < 0.05 * scale


def test_linfs_variants_match_fullcell_above_bottom():
    """linfs nemo keeps the hydrostatic-pressure gradient above the bottom
    layer (identical to fullcell by construction, ref :530-533);
    cubicspline keeps the direct density gradient there.  The bottom layer
    must be finite and of comparable magnitude."""
    model, atm = setup_pi_model(parity="fast")   # linfs config
    state, _ = pi_initial_state(model)
    mesh, cfg = model.mesh, model.cfg
    state = eos.pressure_bv(state, mesh, cfg, model.density_ref)
    lev = np.arange(mesh.nl - 1)[:, None]
    nle0 = np.asarray(mesh.nlevels_elem) - 2
    lmask = np.asarray(mesh.elem_layer_mask)
    above = lmask & (lev < nle0[None, :])
    botrow = lmask & (lev == nle0[None, :])

    full = dynamics.pressure_force_linfs(state, mesh)
    nemo = dynamics.pressure_force_linfs_nemo(state, mesh, cfg)
    spl = dynamics.pressure_force_linfs_cubicspline(state, mesh)

    fx = np.asarray(full.pgf_x)
    nx = np.asarray(nemo.pgf_x)
    sx = np.asarray(spl.pgf_x)
    scale = np.abs(fx[lmask]).max()
    # nemo == fullcell above the bottom layer (same hpressure gradient)
    assert np.abs((nx - fx))[above].max() < 1e-12 * max(scale, 1.0)
    # bottom rows finite and same order of magnitude
    for arr in (nx, sx):
        assert np.isfinite(arr[botrow]).all()
        assert np.abs(arr[botrow]).max() < 10.0 * scale
    # cubicspline interior rows are the direct density gradient -> highly
    # correlated with fullcell's pressure gradient
    corr = np.corrcoef(fx[above], sx[above])[0, 1]
    assert corr > 0.98, corr


def test_cubicspline_coupled_steps_stable(zstate):
    """3 coupled steps with which_pgf='cubicspline' stay finite/sane."""
    from fesom2_tpu.model import pi_coupled_step_fn
    model, atm = setup_pi_model()
    model.cfg.dyn.which_pgf = "cubicspline"
    state, ice = pi_initial_state(model)
    step = pi_coupled_step_fn(model, atm)
    for k in range(3):
        state, ice, _ = step(state, ice, jnp.asarray(k))
    mask = np.asarray(model.mesh.node_layer_mask)
    T = np.asarray(state.tr[0])[mask]
    assert np.isfinite(np.asarray(state.eta)).all()
    assert np.abs(np.asarray(state.u)).max() < 3.0
    assert T.min() > -4.0 and T.max() < 40.0


def test_linfs_partial_cell_dispatch():
    """The dispatch follows the reference decision matrix
    (pressure_force_4_linfs :371-427): full-cell linfs -> fullcell form;
    +partial cells -> shchepetkin by default; +cavity partial -> sergey
    reachable; unsupported combinations raise with the menu."""
    from fesom2_tpu.config import ModelConfig
    from fesom2_tpu.mesh import build_mesh
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs
    mesh = build_mesh("/root/reference/test/meshes/pi", force_rotation=True,
                      use_partial_cell=True)
    cfg = ModelConfig()
    cfg.ale.which_ALE = "linfs"
    cfg.ale.use_partial_cell = True
    st = init_thickness_linfs(allocate_state(mesh), mesh)
    st = eos.pressure_bv(st, mesh, cfg,
                         jnp.zeros_like(st.density_m_rho0))
    # default: shchepetkin body on static geometry
    out = dynamics.pressure_force(st, mesh, cfg)
    assert np.isfinite(np.asarray(out.pgf_x)).all()
    # sergey requires cavity partial cells
    cfg.dyn.which_pgf = "sergey"
    with pytest.raises(ValueError):
        dynamics.pressure_force(st, mesh, cfg)
    cfg.run.use_cavity_partial_cell = True
    out = dynamics.pressure_force(st, mesh, cfg)
    assert np.isfinite(np.asarray(out.pgf_x)).all()
    cfg.dyn.which_pgf = "nosuch"
    with pytest.raises(ValueError):
        dynamics.pressure_force(st, mesh, cfg)


def test_linfs_cavity_matches_fullcell_in_bulk():
    """'sergey' bulk layers are the plain hpressure gradient (ref
    :1576-1580); only surface-under-cavity and partial bottom rows
    differ."""
    from fesom2_tpu.config import ModelConfig
    from fesom2_tpu.mesh import build_mesh
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs
    mesh = build_mesh("/root/reference/test/meshes/pi", force_rotation=True,
                      use_partial_cell=True)
    cfg = ModelConfig()
    st = init_thickness_linfs(allocate_state(mesh), mesh)
    rng = np.random.RandomState(5)
    tr = st.tr.at[0].set(jnp.asarray(
        np.where(np.asarray(mesh.node_layer_mask),
                 10.0 + rng.randn(mesh.nl - 1, mesh.n_nodes), 0.0)))
    tr = tr.at[1].set(jnp.where(mesh.node_layer_mask, 34.0, 0.0))
    st = st.__class__(**{**st.__dict__, "tr": tr})
    st = eos.pressure_bv(st, mesh, cfg, jnp.zeros_like(st.density_m_rho0))
    a = dynamics.pressure_force_linfs(st, mesh)
    b = dynamics.pressure_force_linfs_cavity(st, mesh)
    lev = np.arange(mesh.nl - 1)[:, None]
    nle0 = (np.asarray(mesh.nlevels_elem) - 2)[None, :]
    bulk = np.asarray(mesh.elem_layer_mask) & (lev < nle0)
    assert np.allclose(np.asarray(a.pgf_x)[bulk], np.asarray(b.pgf_x)[bulk])
    # the partial bottom row actually differs from the naive form
    bot = np.asarray(mesh.elem_layer_mask) & (lev == nle0)
    assert np.abs(np.asarray(a.pgf_x)[bot]
                  - np.asarray(b.pgf_x)[bot]).max() > 0.0
