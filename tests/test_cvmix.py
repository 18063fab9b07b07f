"""CVMix-family mixing schemes: cvmix_PP, cvmix_TKE, cvmix_IDEMIX,
cvmix_TIDAL (ref gen_modules_cvmix_*.F90 + cvmix_{shear,tke,idemix,tidal}.F90)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fesom2_tpu.core.state import zero_forcing
from fesom2_tpu.core import eos, dynamics
from fesom2_tpu.core.mixing import cvmix


@pytest.fixture(scope="module")
def pi_state(pi_mesh):
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model()
    state, ice = pi_initial_state(model)
    state = dynamics.compute_vel_nodes(state, model.mesh)
    state = eos.pressure_bv(state, model.mesh, model.cfg, model.density_ref)
    forcing = dataclasses.replace(
        zero_forcing(model.mesh),
        stress_x=jnp.full(model.mesh.n_elems, 0.1))
    return model, state, forcing


def test_qiang_background():
    """Kv0_background_qiang pointwise values (ref oce_ale_mixing_pp.F90:91-125)."""
    f = cvmix.kv0_background_qiang
    # equator, 2500 m: aux = 0.6e-5, ratio 1
    assert float(f(0.0, 2500.0)) == pytest.approx(0.6e-5, rel=1e-6)
    # mid-latitude scaling capped at 10
    assert float(f(60.0, 2500.0)) == pytest.approx(0.6e-5 * 10.0, rel=1e-6)
    # arctic shallow: ratio 4 + 6*(50-dep)/50
    assert float(f(80.0, 0.0)) == pytest.approx(0.6e-5 * 10.0
                                                * 0.0 + float(f(80.0, 0.0)))
    aux0 = (0.6 + 1.0598 / 3.1415926 * np.arctan(4.5e-3 * (0.0 - 2500.0))) * 1e-5
    assert float(f(80.0, 0.0)) == pytest.approx(aux0 * 10.0, rel=1e-6)
    assert float(f(80.0, 100.0)) == pytest.approx(
        (0.6 + 1.0598 / 3.1415926 * np.arctan(4.5e-3 * (100.0 - 2500.0))) * 1e-5 * 4.0,
        rel=1e-6)


def test_cvmix_pp(pi_state):
    model, state, forcing = pi_state
    out = jax.jit(lambda s: cvmix.calc_cvmix_pp(s, model.mesh, model.cfg))(state)
    Kv, Av = np.asarray(out.Kv), np.asarray(out.Av)
    assert np.isfinite(Kv).all() and np.isfinite(Av).all()
    lev = np.arange(model.mesh.nl)[:, None]
    nb = np.asarray(model.mesh.nlevels_node) - 1
    interior = (lev >= 1) & (lev <= nb[None, :] - 1)
    # Av within [Avbckg, Av0 + Avbckg]
    cv = model.cfg.cvmix
    assert Av.min() >= 0.0
    assert np.all(Av <= cv.pp_Av0 + cv.pp_Avbckg + 1e-12)
    a_int = Kv[interior]
    # Kv includes the qiang background: strictly positive in the interior
    assert a_int.min() > 0.0
    # boundary rows zero
    assert np.abs(Kv[0]).max() == 0.0


def test_cvmix_tke_integrates(pi_state):
    """TKE builds up under wind forcing, respects kappaM_max, stays finite
    over repeated steps; tke >= tke_min on active interfaces."""
    model, state, forcing = pi_state
    cfg = model.cfg
    f = jax.jit(lambda s: cvmix.calc_cvmix_tke(s, model.mesh, cfg, forcing))
    s = state
    for _ in range(5):
        s = f(s)
    tke = np.asarray(s.tke)
    Kv = np.asarray(s.Kv)
    lev = np.arange(model.mesh.nl)[:, None]
    nb = np.asarray(model.mesh.nlevels_node) - 1
    active = lev <= nb[None, :]
    assert np.isfinite(tke).all() and np.isfinite(Kv).all()
    assert tke[active].min() >= cfg.cvmix.tke_min - 1e-15
    # wind input: surface TKE well above the floor
    assert tke[0].max() > 1e-4
    assert Kv.max() <= cfg.cvmix.tke_kappaM_max
    assert Kv.min() >= 0.0
    # deep unforced interfaces stay at the floor
    deep = active & (lev >= 30)
    assert np.median(tke[deep]) == pytest.approx(cfg.cvmix.tke_min, rel=1e-3)


def test_cvmix_idemix(pi_state):
    """Bottom+surface wave forcing builds internal wave energy; dissipation
    is a positive TKE source; standalone Kv within the clip range."""
    model, state, forcing = pi_state
    N = model.mesh.n_nodes
    bot = jnp.full(N, 1e-3)   # W/m2 / rho
    surf = jnp.full(N, 1e-4)
    f = jax.jit(lambda s: cvmix.calc_cvmix_idemix(
        s, model.mesh, model.cfg, forcing, iw_surf=surf, iw_bot=bot,
        standalone=True))
    s = state
    for _ in range(3):
        s = f(s)
    iwe = np.asarray(s.iwe)
    assert np.isfinite(iwe).all()
    assert iwe.max() > 0.0
    diss = np.asarray(s.iwe_diss)
    assert diss.min() >= 0.0 and diss.max() > 0.0
    Kv = np.asarray(s.Kv)
    lev = np.arange(model.mesh.nl)[:, None]
    nb = np.asarray(model.mesh.nlevels_node) - 1
    interior = (lev >= 1) & (lev <= nb[None, :] - 1)
    assert Kv[interior].min() >= 1e-9 - 1e-18
    assert Kv.max() <= 1.0 + 1e-12


def test_cvmix_tidal(pi_state):
    """Simmons tidal mixing: Kv addition bounded by max_coefficient, zero
    without forcing, bottom-intensified with it."""
    model, state, forcing = pi_state
    cfg = model.cfg
    out0 = cvmix.calc_cvmix_tidal(state, model.mesh, cfg)  # no forcing
    assert np.allclose(np.asarray(out0.Kv), np.asarray(state.Kv))

    N = model.mesh.n_nodes
    tf = jnp.full(N, 1.0)     # 1 W/m2 bottom dissipation
    out = jax.jit(lambda s: cvmix.calc_cvmix_tidal(s, model.mesh, cfg,
                                                   tidal_forc=tf))(state)
    dKv = np.asarray(out.Kv) - np.asarray(state.Kv)
    assert np.isfinite(dKv).all()
    assert dKv.min() >= 0.0
    assert dKv.max() <= cfg.cvmix.tidal_max_coefficient + 1e-15
    assert dKv.max() > 0.0
    # bottom intensification: mean deposition deeper > shallow (where N2>0)
    nb = np.asarray(model.mesh.nlevels_node) - 1
    deep_cols = nb >= 40
    col = dKv[:, deep_cols]
    assert col[35:45].mean() > col[1:10].mean()


def test_mix_scheme_dispatch_tke_idemix(pi_mesh):
    """Full ocean step with mix_scheme='cvmix_TKE+cvmix_IDEMIX' and
    'cvmix_PP' runs and stays finite (ref dispatch oce_ale.F90:2596-2660)."""
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    for scheme in ("cvmix_PP", "cvmix_TKE", "cvmix_TKE+cvmix_IDEMIX"):
        model, atm = setup_pi_model()
        model.cfg.dyn.mix_scheme = scheme
        state, ice = pi_initial_state(model)
        step = model.step_fn()
        forcing = zero_forcing(model.mesh)
        for _ in range(2):
            state = step(state, forcing)
        assert np.isfinite(np.asarray(state.tr)).all(), scheme
        assert np.isfinite(np.asarray(state.Kv)).all(), scheme


def test_cvmix_kpp(pi_state):
    """CVMix KPP: bounded coefficients, OBL deepens under strong cooling +
    wind relative to calm conditions, nonlocal transport active when
    unstable (ref gen_modules_cvmix_kpp.F90 + cvmix_kpp.F90)."""
    model, state0, forcing = pi_state
    mesh = model.mesh
    # homogenize the top ~95 m so the OBL search is forcing-limited, not
    # stratification-limited (WOA columns are stratified from the surface)
    K = 10
    tr = state0.tr
    tr = tr.at[:, :K].set(jnp.broadcast_to(tr[:, K:K + 1],
                                           tr[:, :K].shape))
    state = dataclasses.replace(state0, tr=tr)
    state = eos.pressure_bv(state, mesh, model.cfg, model.density_ref)
    forc_strong = dataclasses.replace(
        forcing,
        stress_atm_x=jnp.full(mesh.n_nodes, 0.2),
        heat_flux=jnp.full(mesh.n_nodes, 400.0))      # strong cooling
    forc_calm = dataclasses.replace(
        forcing,
        stress_atm_x=jnp.full(mesh.n_nodes, 1e-4),
        heat_flux=jnp.full(mesh.n_nodes, -50.0))      # warming, calm
    f = jax.jit(lambda s, fo: cvmix.calc_cvmix_kpp(s, mesh, model.cfg, fo))
    out_s = f(state, forc_strong)
    out_c = f(state, forc_calm)
    for out in (out_s, out_c):
        Kv, Av = np.asarray(out.Kv), np.asarray(out.Av)
        assert np.isfinite(Kv).all() and np.isfinite(Av).all()
        assert Kv.min() >= 0.0 and Av.min() >= 0.0
        assert Kv.max() < 20.0 and Av.max() < 20.0
    nln = np.asarray(mesh.nlevels_node)
    deep = nln > 30
    obl_s = np.asarray(out_s.mld1)
    obl_c = np.asarray(out_c.mld1)
    # boundary layer much deeper under destabilizing forcing
    assert obl_s[deep].mean() > 2.0 * obl_c[deep].mean()
    # nonlocal transport present in the unstable case; absent under warming
    # where alpha > 0 (cold fresh polar columns have alpha < 0, so warming
    # destabilizes them — exclude those)
    assert np.asarray(out_s.kpp_nonloc).max() > 0.0
    alpha0, _ = eos.sw_alpha_beta(state.tr[0], state.tr[1], state.Z_3d)
    warmed_stable = np.asarray(alpha0[0]) > 0.0
    assert np.asarray(out_c.kpp_nonloc)[:, warmed_stable].max() == 0.0
    # boundary-layer Kv well above interior background under forcing
    assert np.asarray(out_s.Kv)[1:5].max() > 1e-3


def test_cvmix_kpp_step():
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    model, atm = setup_pi_model()
    model.cfg.dyn.mix_scheme = "cvmix_KPP"
    state, ice = pi_initial_state(model)
    step = model.step_fn()
    forcing = zero_forcing(model.mesh)
    for _ in range(2):
        state = step(state, forcing)
    assert np.isfinite(np.asarray(state.tr)).all()
    assert np.isfinite(np.asarray(state.Kv)).all()
