"""Multi-category (Icepack-equivalent) sea-ice tests.

Reference: src/icepack_drivers/ (driver) + config/namelist.icepack
(configuration); the column physics follows BL99 / Lipscomb 2001 /
Lipscomb et al. 2007.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fesom2_tpu.config import ModelConfig
from fesom2_tpu.ice.state import allocate_ice, zero_ice_forcing, OceanSurface
from fesom2_tpu.ice.icepack import (IcepackConfig, IcepackState,
                                    init_icepack_state, icepack_timestep)
from fesom2_tpu.ice.icepack.itd import (category_bounds, linear_itd, rebin,
                                        cleanup_itd, aggregate)
from fesom2_tpu.ice.icepack.state import (enthalpy_ice, temperature_ice,
                                          enthalpy_snow, temperature_snow,
                                          salinity_profile, melt_temps)
from fesom2_tpu.ice.icepack.shortwave import ccsm3_shortwave
from fesom2_tpu.ice.icepack.thermo_vertical import (temperature_solve,
                                                    thickness_changes)
from fesom2_tpu.ice.icepack.ridge import ice_strength, ridge_ice
from fesom2_tpu.ice.icepack import constants as c


@pytest.fixture(scope="module")
def ipc():
    return IcepackConfig()


def test_category_bounds_match_cice_tables(ipc):
    """kcatbound=1 for ncat=5 gives the documented 0.6/1.4/2.4/3.6 m
    boundaries; kcatbound=0 the original tanh values."""
    b1 = category_bounds(5, 1)
    assert np.allclose(b1[1:5], [0.6, 1.4, 2.4, 3.6])
    b0 = category_bounds(5, 0)
    assert np.allclose(b0[1:5], [0.6445, 1.3914, 2.4702, 4.5673], atol=1e-3)


def test_enthalpy_temperature_roundtrip():
    S = jnp.asarray(salinity_profile(4))
    T = jnp.asarray([-25.0, -10.0, -2.0, -0.5])
    assert np.allclose(np.asarray(temperature_ice(enthalpy_ice(T, S), S)),
                       np.asarray(T), atol=1e-10)
    q = enthalpy_snow(jnp.asarray(-7.0))
    assert abs(float(temperature_snow(q)) + 7.0) < 1e-12


@pytest.fixture(scope="module")
def random_state(ipc):
    rng = np.random.RandomState(0)
    N = 24
    a = jnp.asarray(np.clip(rng.rand(N), 0, 0.95))
    hi = jnp.asarray(0.1 + 4.0 * rng.rand(N))
    return init_icepack_state(ipc, a, a * hi, a * 0.15,
                              jnp.full((N,), -8.0)), a, hi


def test_linear_remap_conserves(ipc, random_state):
    st, a, hi = random_state
    vic2 = st.vicen * 1.2          # uniform growth
    out = linear_itd(st.aicen, st.vicen, st.aicen, vic2, st.vsnon,
                     st.Tsfcn, st.qin, st.qsn, ipc.hin_max)
    a2, v2, vs2, t2, qi2, qs2 = out
    assert np.allclose(np.asarray(a2.sum(0)), np.asarray(st.aicen.sum(0)),
                       atol=1e-13)
    assert np.allclose(np.asarray(v2.sum(0)), np.asarray(vic2.sum(0)),
                       rtol=1e-12)
    assert np.allclose(np.asarray(vs2.sum(0)), np.asarray(st.vsnon.sum(0)),
                       rtol=1e-12)
    E0 = (st.qin * (vic2 / ipc.nilyr)[:, None, :]).sum((0, 1))
    E1 = (qi2 * (v2 / ipc.nilyr)[:, None, :]).sum((0, 1))
    assert np.allclose(np.asarray(E0), np.asarray(E1), rtol=1e-10)
    # some transfer actually happened (growth pushes ice across bounds)
    assert float(jnp.abs(a2 - st.aicen).max()) > 1e-6


def test_rebin_restores_bounds(ipc, random_state):
    st, a, hi = random_state
    v_big = st.vicen * 3.0          # blow mean thickness out of bounds
    out = rebin(st.aicen, v_big, st.vsnon, st.Tsfcn, st.qin, st.qsn,
                ipc.hin_max)
    a2, v2 = np.asarray(out[0]), np.asarray(out[1])
    hic = np.where(a2 > c.puny, v2 / np.maximum(a2, c.puny), 0.0)
    for n in range(ipc.ncat):
        ok = a2[n] > c.puny
        assert (hic[n][ok] <= ipc.hin_max[n + 1] + 1e-9).all()
        assert (hic[n][ok] >= ipc.hin_max[n] - 1e-9).all()
    assert np.allclose(v2.sum(0), np.asarray(v_big.sum(0)), rtol=1e-12)


def test_cleanup_returns_fluxes(ipc, random_state):
    st, a, hi = random_state
    tiny = st.aicen.at[2].set(1e-13)
    out = cleanup_itd(tiny, st.vicen, st.vsnon, st.Tsfcn, st.qin, st.qsn,
                      900.0)
    a2, v2 = out[0], out[1]
    dfresh, dfhocn = out[6], out[8]
    assert float(a2[2].max()) == 0.0
    # zapped category water appears in the fresh flux, heat is negative
    mask = np.asarray(st.vicen[2]) > 0
    assert (np.asarray(dfresh)[mask] > 0).all()
    assert (np.asarray(dfhocn)[mask] < 0).all()


def test_shortwave_budget_closes(ipc):
    N = 8
    hi = jnp.asarray(np.linspace(0.05, 4.0, N))[None, :]
    hs = jnp.asarray(np.linspace(0.0, 0.4, N))[None, :]
    Tsf = jnp.full((1, N), -3.0)
    alb, fsfc, iabs, thru = ccsm3_shortwave(ipc, hi, hs, Tsf,
                                            jnp.full((N,), 250.0))
    total = fsfc + iabs.sum(1) + thru
    assert np.allclose(np.asarray(total), np.asarray((1 - alb) * 250.0),
                       rtol=1e-12)
    assert float(alb.min()) > 0.05 and float(alb.max()) < 1.0


def test_temperature_solve_conserves_energy(ipc):
    sal = salinity_profile(ipc.nilyr)
    Tmlt = melt_temps(ipc.nilyr)
    N = 3
    hi = jnp.full((1, N), 2.0)
    hs = jnp.asarray([[0.2, 0.0, 0.2]])
    Tsf0 = jnp.full((1, N), -20.0)
    Tin0 = jnp.broadcast_to(jnp.linspace(-15, -3, ipc.nilyr)[None, :, None],
                            (1, ipc.nilyr, N))
    Tsn0 = jnp.full((1, ipc.nslyr, N), -18.0)
    fswsfc = jnp.asarray([[0.0, 0.0, 300.0]])
    iabs = jnp.zeros((1, ipc.nilyr, N))
    flw = jnp.asarray([150.0, 150.0, 320.0])
    Tair = jnp.asarray([-25.0, -25.0, 5.0])
    shum = jnp.asarray([2e-4, 2e-4, 4e-3])
    wind = jnp.full((N,), 5.0)
    Tbot = jnp.full((N,), -1.8)
    dt = 900.0
    sol = temperature_solve(ipc, hi, hs, Tsf0, Tsn0, Tin0, fswsfc, iabs,
                            flw, Tair, shum, wind, Tbot, dt, sal, Tmlt)
    assert bool(sol["melting"][0, 2]) and not bool(sol["melting"][0, 0])
    assert float(sol["Tsf"].max()) <= 0.0

    sal_l = jnp.asarray(sal)[None, :, None]
    qi0 = enthalpy_ice(Tin0, sal_l)
    qi1 = enthalpy_ice(sol["Tin"], sal_l)
    qs0 = enthalpy_snow(Tsn0)
    qs1 = enthalpy_snow(sol["Tsn"])
    dzi = hi / ipc.nilyr
    dzs = jnp.maximum(hs, c.hs_min) / ipc.nslyr
    snow_on = hs >= c.hs_min
    dE = ((qi1 - qi0) * dzi[:, None, :]).sum(1) \
        + (((qs1 - qs0) * dzs[:, None, :]).sum(1)) * snow_on
    expect = dt * (sol["fcondtop"] + iabs.sum(1) + sol["fcondbot"])
    rel = np.abs(np.asarray(dE - expect)) / np.maximum(
        np.abs(np.asarray(expect)), 1.0)
    assert rel.max() < 1e-6

    # cold column grows at a plausible congelation rate
    tc = thickness_changes(ipc, hi, hs, qi1, qs1, sol["Tsf"], sol,
                           jnp.zeros(N), Tbot, jnp.zeros(N), Tair, dt, sal)
    growth_m_day = float(tc["congel"][0, 0]) * 86400 / dt
    assert 5e-4 < growth_m_day < 0.05
    # warm column melts from the top (snow first)
    assert float(tc["melts"][0, 2]) > 0.0


def test_thickness_changes_conserve_water(ipc):
    """Net ice+snow mass change equals -(fresh + evap-to-atm) * dt."""
    sal = salinity_profile(ipc.nilyr)
    Tmlt = melt_temps(ipc.nilyr)
    N = 4
    rng = np.random.RandomState(1)
    hi = jnp.asarray(0.5 + 2 * rng.rand(1, N))
    hs = jnp.asarray(0.3 * rng.rand(1, N))
    Tin0 = jnp.asarray(-12 + 8 * rng.rand(1, ipc.nilyr, N))
    Tsn0 = jnp.asarray(-15 + 5 * rng.rand(1, ipc.nslyr, N))
    Tsf0 = jnp.asarray(-20 + 18 * rng.rand(1, N))
    fswsfc = jnp.asarray(200 * rng.rand(1, N))
    iabs = jnp.asarray(10 * rng.rand(1, ipc.nilyr, N))
    flw = jnp.asarray(200 + 120 * rng.rand(N))
    Tair = jnp.asarray(-20 + 25 * rng.rand(N))
    shum = jnp.full((N,), 2e-3)
    wind = jnp.full((N,), 6.0)
    Tbot = jnp.full((N,), -1.8)
    snowfall = jnp.asarray(1e-8 * rng.rand(N))
    fbot = jnp.asarray(80 * rng.rand(N) - 20)
    dt = 3600.0
    sol = temperature_solve(ipc, hi, hs, Tsf0, Tsn0, Tin0, fswsfc, iabs,
                            flw, Tair, shum, wind, Tbot, dt, sal, Tmlt)
    sal_l = jnp.asarray(sal)[None, :, None]
    qi = enthalpy_ice(sol["Tin"], sal_l)
    qs = enthalpy_snow(sol["Tsn"])
    tc = thickness_changes(ipc, hi, hs, qi, qs, sol["Tsf"], sol, fbot,
                           Tbot, snowfall, Tair, dt, sal)
    m0 = c.rhoi * hi + c.rhos * hs
    m1 = c.rhoi * tc["hi"] + c.rhos * tc["hs"]
    dm = np.asarray(m1 - m0)[0]
    # mass balance: melt/growth water to ocean, sublimation to atm,
    # snowfall in
    expect = (-tc["fresh"] - tc["evap"]) * dt \
        + snowfall * dt * c.rhofresh
    assert np.allclose(dm, np.asarray(expect)[0], rtol=1e-9, atol=1e-9)


def test_strength_rothrock_vs_hibler(ipc):
    rng = np.random.RandomState(2)
    N = 16
    a = jnp.asarray(np.clip(rng.rand(5, N) * 0.3, 0, 1))
    hi = jnp.asarray(0.3 + 2 * rng.rand(5, N))
    v = a * hi
    P1 = ice_strength(ipc, a, v)
    assert bool(jnp.isfinite(P1).all()) and float(P1.min()) >= 0.0
    cfg0 = dataclasses.replace(ipc, kstrength=0)
    P0 = ice_strength(cfg0, a, v)
    expect = cfg0.P_star * np.asarray(v.sum(0)) \
        * np.exp(-cfg0.C_star * (1 - np.asarray(a.sum(0))))
    assert np.allclose(np.asarray(P0), expect, rtol=1e-12)
    # thicker pack is stronger (both closures)
    P1b = ice_strength(ipc, a, v * 2)
    assert (np.asarray(P1b) >= np.asarray(P1) - 1e-9).all()


def test_ridging_conserves_volume(ipc, random_state):
    st, a, hi = random_state
    N = st.aicen.shape[1]
    conv = jnp.full((N,), 1e-6)        # strong convergence
    shear = jnp.full((N,), 5e-7)
    out = ridge_ice(ipc, st.aicen, st.vicen, st.vsnon, st.Tsfcn,
                    st.qin, st.qsn, conv, shear, 3600.0, ipc.hin_max)
    a2, v2, vs2 = out[0], out[1], out[2]
    dfresh, dfhocn = out[6], out[7]
    # ice volume exactly conserved; area decreases under convergence
    assert np.allclose(np.asarray(v2.sum(0)), np.asarray(st.vicen.sum(0)),
                       rtol=1e-10)
    assert (np.asarray(a2.sum(0)) <= np.asarray(st.aicen.sum(0)) + 1e-12).all()
    # snow: half of the ridged snow goes to the ocean
    ds = np.asarray(st.vsnon.sum(0) - vs2.sum(0))
    assert np.allclose(ds, np.asarray(dfresh) * 3600.0 / c.rhos, rtol=1e-9)
    assert (np.asarray(dfhocn) <= 1e-15).all()


@pytest.fixture(scope="module")
def pi_icepack(pi_mesh):
    cfg = ModelConfig()
    cfg.timestep.step_per_day = 96
    cfg.ice.whichEVP = 1
    cfg.run.use_ice = True
    ipc = IcepackConfig()
    N = pi_mesh.n_nodes
    glat = np.asarray(pi_mesh.geo_coords)[:, 1]
    cold = np.abs(glat) > np.deg2rad(60.0)
    north = glat > 0
    m_ice = jnp.asarray(np.where(cold, np.where(north, 1.0, 2.0), 0.0))
    m_snow = jnp.asarray(np.where(cold, np.where(north, 0.1, 0.5), 0.0))
    a_ice = jnp.asarray(np.where(cold, 0.9, 0.0))
    ice = dataclasses.replace(allocate_ice(pi_mesh), m_ice=m_ice,
                              m_snow=m_snow, a_ice=a_ice)
    ipk = init_icepack_state(ipc, a_ice, m_ice, m_snow,
                             jnp.asarray(np.where(cold, -10.0, 0.0)))
    f = zero_ice_forcing(pi_mesh)
    f = dataclasses.replace(
        f, Tair=jnp.asarray(np.where(cold, -15.0, 10.0)),
        shortwave=jnp.full(N, 50.0), longwave=jnp.full(N, 200.0),
        shum=jnp.full(N, 1e-3), u_wind=jnp.full(N, 5.0),
        v_wind=jnp.full(N, 1.0), stress_atmice_x=jnp.full(N, 0.05),
        prec_rain=jnp.full(N, 1e-8))
    ocean = OceanSurface(T_oc=jnp.asarray(np.where(cold, -1.9, 15.0)),
                         S_oc=jnp.full(N, 34.0), u_w=jnp.zeros(N),
                         v_w=jnp.zeros(N), elevation=jnp.zeros(N))
    return cfg, ipc, ipk, ice, f, ocean


def test_icepack_step_pi(pi_mesh, pi_icepack):
    cfg, ipc, ipk, ice, f, ocean = pi_icepack
    step = jax.jit(lambda s, i: icepack_timestep(
        s, i, pi_mesh, f, ocean, cfg, ipc, use_virt_salt=False))
    ipk1, ice1 = step(ipk, ice)
    for k in ("aicen", "vicen", "vsnon", "Tsfcn", "qin", "qsn"):
        v = getattr(ipk1, k)
        assert bool(jnp.isfinite(v).all()), k
    assert float(ipk1.aicen.min()) >= 0.0
    assert float(ice1.a_ice.max()) <= 1.0 + 1e-12
    assert float(ipk1.Tsfcn.max()) <= 0.0
    assert float(jnp.abs(ice1.u_ice).max()) < 1.0
    # cold-air regions keep growing: positive growth somewhere
    assert float(ice1.thdgr.max()) > 0.0
    # second step remains stable
    ipk2, ice2 = step(ipk1, ice1)
    assert bool(jnp.isfinite(ipk2.vicen).all())
    assert bool(jnp.isfinite(ice2.net_heat_flux).all())


# ---------------------------------------------------------------------------
# aux tracers: CESM melt ponds, age, first-year, level-ice
# (namelist.icepack.cesm.ponds variant; tracer_nml :31-38)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ipc_aux():
    return IcepackConfig(tr_pond_cesm=True, tr_iage=True, tr_FY=True,
                         tr_lvl=True)


def test_aux_layout(ipc_aux):
    assert ipc_aux.area_tracers == ("apnd", "hpnd", "FY", "alvl")
    assert ipc_aux.vol_tracers == ("vlvl", "iage")
    assert ipc_aux.ta_ridge_keep == (False, False, True, False)
    assert ipc_aux.tv_ridge_keep == (False, True)


def test_ponds_grow_melt_and_refreeze(ipc_aux):
    from fesom2_tpu.ice.icepack.ponds import compute_ponds_cesm
    ncat, N = 5, 4
    aicen = jnp.full((ncat, N), 0.15)
    vicen = aicen * 1.5                       # 1.5 m ice everywhere
    apnd = jnp.zeros((ncat, N))
    hpnd = jnp.zeros((ncat, N))
    meltt = jnp.full((ncat, N), 0.02)         # 2 cm top melt
    melts = jnp.full((ncat, N), 0.01)
    warm = jnp.zeros((ncat, N))               # Tsfc = 0: no refreeze
    a1, h1 = compute_ponds_cesm(ipc_aux, aicen, vicen, warm, meltt, melts,
                                apnd, hpnd)
    assert float(a1.min()) > 0.0
    # geometry: h = pndaspect * a  and V = a*h matches retained melt water
    assert np.allclose(np.asarray(h1), ipc_aux.pndaspect * np.asarray(a1))
    aice = float(aicen.sum(0)[0])
    r = ipc_aux.rfracmin + (ipc_aux.rfracmax - ipc_aux.rfracmin) * aice
    vol_exp = r * (0.02 * c.rhoi + 0.01 * c.rhos) / c.rhow
    assert np.allclose(np.asarray(a1 * h1)[0], vol_exp, rtol=1e-6)

    # cold surface shrinks the pond (exponential refreeze)
    cold = jnp.full((ncat, N), -20.0)
    a2, h2 = compute_ponds_cesm(ipc_aux, aicen, vicen, cold,
                                jnp.zeros_like(meltt),
                                jnp.zeros_like(melts), a1, h1)
    assert float((a2 * h2).max()) < float((a1 * h1).min())

    # thin ice carries no ponds
    thin_v = aicen * 0.05
    a3, h3 = compute_ponds_cesm(ipc_aux, aicen, thin_v, warm, meltt, melts,
                                apnd, hpnd)
    assert float(jnp.abs(a3).max()) == 0.0 and float(jnp.abs(h3).max()) == 0.0


def test_pond_albedo_darkens(ipc_aux):
    from fesom2_tpu.ice.icepack.ponds import pond_albedo_adjust
    ncat, N = 5, 3
    alb = jnp.full((ncat, N), 0.7)
    fsw = jnp.full((ncat, N), 30.0)
    sw = jnp.full(N, 100.0)
    apnd = jnp.full((ncat, N), 0.4)
    hpnd = jnp.full((ncat, N), 0.25)
    hs = jnp.zeros((ncat, N))                 # snow-free
    alb2, fsw2 = pond_albedo_adjust(ipc_aux, alb, fsw, apnd, hpnd, hs, sw)
    assert float(alb2.max()) < 0.7            # ponds darken
    # the albedo drop reappears exactly as absorbed shortwave
    assert np.allclose(np.asarray(fsw2 - fsw),
                       np.asarray((alb - alb2) * sw), rtol=1e-12)
    # deep snow hides the ponds
    alb3, _ = pond_albedo_adjust(ipc_aux, alb, fsw, apnd, hpnd,
                                 jnp.full((ncat, N), 0.5), sw)
    assert float(alb3.min()) > float(alb2.min())


def test_aux_conserved_through_itd(ipc_aux, random_state):
    st, a, hi = random_state
    ncat = ipc_aux.ncat
    N = st.aicen.shape[1]
    rng = np.random.RandomState(7)
    ta = jnp.asarray(rng.rand(ncat, len(ipc_aux.area_tracers), N))
    tv = jnp.asarray(rng.rand(ncat, len(ipc_aux.vol_tracers), N))
    ta = ta * (st.aicen > c.puny)[:, None, :]
    tv = tv * (st.vicen > c.puny)[:, None, :]

    # grow the ice a bit, then remap: area- and volume-weighted aux totals
    # must be conserved by the boundary transfers
    vic2 = st.vicen * 1.12
    out = linear_itd(st.aicen, st.vicen, st.aicen, vic2, st.vsnon,
                     st.Tsfcn, st.qin, st.qsn, ipc_aux.hin_max,
                     ta=ta, tv=tv)
    a2, v2, ta2, tv2 = out[0], out[1], out[6], out[7]
    tot_a = np.asarray((ta * st.aicen[:, None, :]).sum(0))
    tot_a2 = np.asarray((ta2 * a2[:, None, :]).sum(0))
    assert np.allclose(tot_a, tot_a2, atol=1e-10)
    tot_v = np.asarray((tv * vic2[:, None, :]).sum(0))
    tot_v2 = np.asarray((tv2 * v2[:, None, :]).sum(0))
    assert np.allclose(tot_v, tot_v2, atol=1e-10)

    out = rebin(st.aicen, vic2, st.vsnon, st.Tsfcn, st.qin, st.qsn,
                ipc_aux.hin_max, ta=ta, tv=tv)
    a3, v3, ta3, tv3 = out[0], out[1], out[6], out[7]
    assert np.allclose(np.asarray((ta3 * a3[:, None, :]).sum(0)), tot_a,
                       atol=1e-10)
    assert np.allclose(np.asarray((tv3 * v3[:, None, :]).sum(0)), tot_v,
                       atol=1e-10)


def test_ridging_destroys_ponds_keeps_fy(ipc_aux, random_state):
    st, a, hi = random_state
    ncat = ipc_aux.ncat
    N = st.aicen.shape[1]
    ta = jnp.zeros((ncat, len(ipc_aux.area_tracers), N))
    ia = ipc_aux.ta_index("apnd")
    jf = ipc_aux.ta_index("FY")
    ta = ta.at[:, ia].set(0.3 * (st.aicen > c.puny))
    ta = ta.at[:, jf].set(1.0 * (st.aicen > c.puny))
    tv = jnp.zeros((ncat, len(ipc_aux.vol_tracers), N))
    conv = jnp.full(N, 1e-6)
    out = ridge_ice(ipc_aux, st.aicen, st.vicen, st.vsnon, st.Tsfcn,
                    st.qin, st.qsn, conv, jnp.zeros(N), 3600.0,
                    ipc_aux.hin_max, ta=ta, tv=tv)
    a2, ta2 = out[0], out[6]
    # pond area mass strictly decreases where ridging acted; FY area mass
    # is conserved up to the (conserving) receiver mixing
    pond0 = np.asarray((ta[:, ia] * st.aicen).sum(0))
    pond2 = np.asarray((ta2[:, ia] * a2).sum(0))
    assert (pond2 <= pond0 + 1e-12).all()
    assert pond2.sum() < pond0.sum()
    # FY area mass moves with the ridged area, which is compressed by
    # 1/krdg: it may only shrink (never appear from nowhere)
    fy0 = np.asarray((ta[:, jf] * st.aicen).sum(0))
    fy2 = np.asarray((ta2[:, jf] * a2).sum(0))
    assert (fy2 <= fy0 + 1e-10).all()
    assert np.allclose(fy0, fy2, rtol=5e-3)   # compression loss is small


def test_icepack_step_pi_with_aux(pi_mesh, pi_icepack):
    cfg, _, _, ice, f, ocean = pi_icepack
    ipc = IcepackConfig(tr_pond_cesm=True, tr_iage=True, tr_FY=True,
                        tr_lvl=True)
    glat = np.asarray(pi_mesh.geo_coords)[:, 1]
    cold = np.abs(glat) > np.deg2rad(60.0)
    north = glat > 0
    m_ice = jnp.asarray(np.where(cold, np.where(north, 1.0, 2.0), 0.0))
    m_snow = jnp.asarray(np.where(cold, np.where(north, 0.1, 0.5), 0.0))
    a_ice = jnp.asarray(np.where(cold, 0.9, 0.0))
    ipk = init_icepack_state(ipc, a_ice, m_ice, m_snow,
                             jnp.asarray(np.where(cold, -10.0, 0.0)))
    assert ipk.ta.shape[1] == 4 and ipk.tv.shape[1] == 2
    step = jax.jit(lambda s, i: icepack_timestep(
        s, i, pi_mesh, f, ocean, cfg, ipc, use_virt_salt=False,
        yday=jnp.asarray(180.0)))
    ipk1, ice1 = step(ipk, ice)
    ipk2, ice2 = step(ipk1, ice1)
    assert bool(jnp.isfinite(ipk2.ta).all())
    assert bool(jnp.isfinite(ipk2.tv).all())
    iv = ipc.tv_index("iage")
    has = np.asarray(ipk2.aicen) > c.puny
    # ice that persisted two steps aged by 2*dt
    age = np.asarray(ipk2.tv[:, iv])
    assert age[has].max() >= 2 * cfg.dt - 1e-6
    ia, ih = ipc.ta_index("apnd"), ipc.ta_index("hpnd")
    assert float(ipk2.ta[:, ia].min()) >= 0.0
    assert float(ipk2.ta[:, ia].max()) <= 1.0 + 1e-9
    assert float(ipk2.ta[:, ih].min()) >= 0.0
    # level-ice fractions stay in [0, 1]
    il = ipc.ta_index("alvl")
    assert float(ipk2.ta[:, il].max()) <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# delta-Eddington shortwave (shortwave='dEdd', ice/icepack/dedd.py)
# ---------------------------------------------------------------------------
def test_dedd_albedos_and_conservation(ipc):
    """Multi-layer two-stream dEdd: energy conservation to roundoff,
    broadband albedos in the canonical B&L07 ranges, correct ordering
    snow > bare ice > pond > open water, monotone brightening with snow."""
    from fesom2_tpu.ice.icepack.dedd import dedd_shortwave
    hi = jnp.asarray([[2.0, 2.0, 1.5, 0.05, 2.0]])
    hs = jnp.asarray([[0.30, 0.0, 0.0, 0.0, 0.03]])
    apnd = jnp.asarray([[0.0, 0.0, 1.0, 0.0, 0.0]])
    hpnd = jnp.asarray([[0.0, 0.0, 0.3, 0.0, 0.0]])
    Tsf = jnp.full((1, 5), -10.0)
    fsw = jnp.full((5,), 300.0)
    alb, sfc, iabs, thru = dedd_shortwave(ipc, hi, hs, Tsf, fsw, apnd, hpnd)
    a = np.asarray(alb)[0]
    # energy budget closes exactly
    bal = np.asarray(fsw * (1.0 - alb) - sfc - iabs.sum(1) - thru)
    assert np.abs(bal).max() < 1e-9
    assert (np.asarray(iabs) >= 0.0).all()
    assert (np.asarray(thru) >= 0.0).all()
    snow, bare, pond, thin, thin_snow = a
    assert 0.7 < snow < 0.9          # cold deep snow
    assert 0.35 < bare < 0.6         # thick bare ice
    assert 0.10 < pond < 0.35        # deep melt pond
    assert thin < 0.2                # thin ice ~ open water
    assert snow > bare > pond        # physical ordering
    assert bare < thin_snow < snow   # partial snow sits between


def test_dedd_step_runs(pi_mesh, pi_icepack):
    """Full icepack timestep with shortwave='dEdd' stays finite and grows
    ice in the cold regions like the ccsm3 run."""
    cfg, _, ipk, ice, f, ocean = pi_icepack
    ipc_d = IcepackConfig(shortwave="dEdd")
    step = jax.jit(lambda s, i: icepack_timestep(
        s, i, pi_mesh, f, ocean, cfg, ipc_d, use_virt_salt=False))
    ipk1, ice1 = step(ipk, ice)
    for k in ("aicen", "vicen", "vsnon", "Tsfcn", "qin", "qsn"):
        assert bool(jnp.isfinite(getattr(ipk1, k)).all()), k
    assert float(ice1.thdgr.max()) > 0.0
