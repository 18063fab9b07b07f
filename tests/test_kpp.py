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


def test_momix_tb04(pi_mesh):
    """Monin-Obukhov (TB04) mixing: southern-ocean nodes under strong cooling
    get Kv += momix_kv within the MO length; northern nodes untouched;
    mixlength relaxes with the 10-day constant on retreat
    (ref oce_mo_conv.F90:22-57,108-194)."""
    from dataclasses import replace
    from fesom2_tpu.config import ModelConfig
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs, \
        zero_forcing
    from fesom2_tpu.core.mixing.pp import mo_convect, _mo_length

    cfg = ModelConfig()
    cfg.tra.use_momix = True
    cfg.tra.use_instabmix = False
    state = init_thickness_linfs(allocate_state(pi_mesh), pi_mesh)
    # stable stratification so instab path (off anyway) is irrelevant
    state = replace(state, bvfreq=jnp.full_like(state.bvfreq, 1e-5))
    forcing = zero_forcing(pi_mesh)
    # strong cooling + some wind everywhere
    forcing = replace(forcing,
                      heat_flux=jnp.full(pi_mesh.n_nodes, 300.0),
                      stress_atm_x=jnp.full(pi_mesh.n_nodes, 0.1))
    out = mo_convect(state, pi_mesh, cfg, forcing)

    lat = np.asarray(pi_mesh.geo_coords[:, 1])
    south = lat <= np.deg2rad(-50.0)
    north = ~south
    assert south.sum() > 10  # pi mesh covers the Southern Ocean
    Kv = np.asarray(out.Kv)
    ml = np.asarray(out.mixlength)
    # cooling -> qrho<0 -> Newton converges to >=10 m MO length
    assert (ml[south] >= 10.0).all()
    assert (ml[north] == 0.0).all()           # untouched (allocated zero)
    # Kv enhanced by momix_kv at interface 1 (depth ~10m <= mixlength)
    nln = np.asarray(pi_mesh.nlevels_node)
    act = south & (nln > 3)
    zb1 = np.abs(np.asarray(state.zbar_3d))[1]
    enhanced = act & (zb1 <= ml)
    assert enhanced.sum() > 0
    assert np.allclose(Kv[1][enhanced], cfg.tra.momix_kv)
    assert np.abs(Kv[1][north]).max() == 0.0

    # retreat relaxation: warming (obuk -> 10) from a deep mixlength
    f2 = replace(forcing, heat_flux=jnp.full(pi_mesh.n_nodes, -300.0),
                 stress_atm_x=jnp.zeros(pi_mesh.n_nodes))
    deep = jnp.full(pi_mesh.n_nodes, 500.0)
    ml2 = np.asarray(_mo_length(f2, 900.0, deep))
    rtc = 900.0 / (10.0 * 86400.0)
    assert np.allclose(ml2, 500.0 + (10.0 - 500.0) * rtc)


def test_kpp_double_diffusion():
    """ddmix (oce_ale_mixing_kpp.F90:857-934): double diffusion splits the
    T/S diffusivities; salt-fingering adds <= dsfmax to Kv_s and 0.7x to
    Kv; salinity evolution differs from the no-dd run."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    from fesom2_tpu.core.state import zero_forcing
    from fesom2_tpu.core.mixing import kpp as kpp_mixing
    from fesom2_tpu.core import eos, dynamics

    model, atm = setup_pi_model(dtype=jnp.float64)
    state, _ = pi_initial_state(model, dtype=jnp.float64)
    mesh, cfg = model.mesh, model.cfg
    forcing = zero_forcing(mesh, jnp.float64)
    state = dynamics.compute_vel_nodes(state, mesh)
    state = eos.pressure_bv(state, mesh, cfg, model.density_ref)

    cfg.tra.double_diffusion = False
    s_no = kpp_mixing.oce_mixing_kpp(state, mesh, cfg, forcing)
    cfg.tra.double_diffusion = True
    try:
        s_dd = kpp_mixing.oce_mixing_kpp(state, mesh, cfg, forcing)
    finally:
        cfg.tra.double_diffusion = False

    Kv, Kv_s, Kv_t = np.asarray(s_no.Kv), np.asarray(s_dd.Kv_s), \
        np.asarray(s_dd.Kv)
    assert np.isfinite(Kv_s).all() and np.isfinite(Kv_t).all()
    # dd is additive: never reduces the interior diffusivity
    assert (Kv_t - Kv).min() > -1e-14
    # the WOA January state has salt-fingering regions: S diffusivity must
    # exceed the T diffusivity somewhere, and nowhere by more than dsfmax
    # + diffusive-convection prandtl corrections
    diff = Kv_s - Kv_t
    assert diff.max() > 1e-6, "no salt fingering found (suspicious)"
    assert diff.max() < 2e-4


def test_pgf_easypgf_variant():
    """which_pgf='easypgf' (oce_ale_pressure_bv.F90:2116-2546) agrees with
    the Shchepetkin density-Jacobian PGF to leading order on a smooth
    stratified state (both are consistent discretizations of the same
    integral) and is exactly masked."""
    import jax.numpy as jnp
    import numpy as np
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    from fesom2_tpu.core import eos, dynamics

    model, atm = setup_pi_model(dtype=jnp.float64)
    state, _ = pi_initial_state(model, dtype=jnp.float64)
    mesh, cfg = model.mesh, model.cfg
    state = eos.pressure_bv(state, mesh, cfg, model.density_ref)

    s_shch = dynamics.pressure_force_zxxxx_shchepetkin(state, mesh)
    s_easy = dynamics.pressure_force_easypgf(state, mesh, cfg)
    for s in (s_shch, s_easy):
        assert np.isfinite(np.asarray(s.pgf_x)).all()
        assert np.abs(np.asarray(s.pgf_x))[~np.asarray(
            mesh.elem_layer_mask)].max() == 0.0
    a = np.asarray(s_shch.pgf_x)
    b = np.asarray(s_easy.pgf_x)
    scale = np.abs(a).max()
    # same field to ~15% of the max PGF (different discretizations of the
    # same integral on a coarse mesh)
    assert np.abs(a - b).max() / scale < 0.15
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99
