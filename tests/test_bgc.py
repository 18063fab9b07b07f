"""Skeletal-layer sea-ice biogeochemistry tests.

Reference: the skl_bgc hooks of the reference icepack driver
(``src/icepack_drivers/icedrv_main.F90:61-62`` n_bgc, ``:557``
ocean_bio); physics after Arrigo et al. 1993 (see bgc.py).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fesom2_tpu.config import ModelConfig
from fesom2_tpu.ice.state import allocate_ice, zero_ice_forcing, OceanSurface
from fesom2_tpu.ice.icepack import (IcepackConfig, init_icepack_state,
                                    icepack_timestep)
from fesom2_tpu.ice.icepack import bgc
from fesom2_tpu.ice.icepack import constants as c


@pytest.fixture(scope="module")
def ipc_bgc():
    return IcepackConfig(tr_bgc=True)


def test_layout(ipc_bgc):
    assert tuple(ipc_bgc.area_tracers) == bgc.BGC_NAMES
    # BGC concentrations survive ridging
    assert all(ipc_bgc.ta_ridge_keep)


def _cols(ipc, N=4, algN=0.5, NO3=16.0, Sil=25.0, light=20.0, grow=0.0):
    ncat = 1
    shape = (ncat, N)
    return dict(
        algN=jnp.full(shape, algN), NO3=jnp.full(shape, NO3),
        Sil=jnp.full(shape, Sil),
        aicen=jnp.full(shape, 0.9), vicen=jnp.full(shape, 1.0),
        fswthru=jnp.full(shape, light), dhi_dt=jnp.full(shape, grow),
        T_bot=jnp.full((N,), -1.8), dt=3600.0)


def test_growth_consumes_nutrients(ipc_bgc):
    k = _cols(ipc_bgc)
    a1, n1, s1, *_ = bgc.skl_bgc_step(ipc_bgc, **k)
    # algae grow under light + nutrients, NO3 and Sil drawn down with the
    # Si:N stoichiometry
    dA = float((a1 - k["algN"])[0, 0])
    dN = float((k["NO3"] - n1)[0, 0])
    dS = float((k["Sil"] - s1)[0, 0])
    assert dA > 0.0
    assert dN > 0.0 and dS > 0.0
    # drawdown follows the Si:N uptake stoichiometry (exchange refills
    # both pools at the same molecular rate, so the ratio survives it)
    assert dS / dN == pytest.approx(ipc_bgc.bgc_R_Si2N, rel=0.3)


def test_no_light_no_growth(ipc_bgc):
    k = _cols(ipc_bgc, light=0.0)
    a1, *_ = bgc.skl_bgc_step(ipc_bgc, **k)
    assert float((a1 - k["algN"]).max()) <= 0.0     # only mortality


def test_nutrient_limitation_caps_uptake(ipc_bgc):
    k = _cols(ipc_bgc, NO3=1e-6, algN=5.0)
    a1, n1, *_ = bgc.skl_bgc_step(ipc_bgc, **k)
    assert float(n1.min()) >= 0.0
    assert float((a1 - k["algN"])[0, 0]) <= 1e-7    # starving


def test_growth_exchange_resupplies(ipc_bgc):
    """Congelation growth pumps mixed-layer nutrients into the layer."""
    k = _cols(ipc_bgc, NO3=2.0, light=0.0, grow=1e-6)
    _, n1, s1, *_ = bgc.skl_bgc_step(ipc_bgc, **k)
    assert float(n1[0, 0]) > 2.0
    assert float(n1[0, 0]) <= ipc_bgc.bgc_NO3_ocn + 1e-9


def test_melt_flushes_algae(ipc_bgc):
    k = _cols(ipc_bgc, light=0.0, grow=-5e-6)
    a1, *_ = bgc.skl_bgc_step(ipc_bgc, **k)
    k0 = _cols(ipc_bgc, light=0.0, grow=0.0)
    a0, *_ = bgc.skl_bgc_step(ipc_bgc, **k0)
    assert float(a1[0, 0]) < float(a0[0, 0])


def test_driver_step_with_bgc(pi_mesh):
    cfg = ModelConfig()
    cfg.timestep.step_per_day = 96
    cfg.ice.whichEVP = 1
    cfg.run.use_ice = True
    ipc = IcepackConfig(tr_bgc=True)
    N = pi_mesh.n_nodes
    glat = np.asarray(pi_mesh.geo_coords)[:, 1]
    cold = np.abs(glat) > np.deg2rad(60.0)
    m_ice = jnp.asarray(np.where(cold, 1.5, 0.0))
    m_snow = jnp.asarray(np.where(cold, 0.2, 0.0))
    a_ice = jnp.asarray(np.where(cold, 0.9, 0.0))
    ice = dataclasses.replace(allocate_ice(pi_mesh), m_ice=m_ice,
                              m_snow=m_snow, a_ice=a_ice)
    ipk = init_icepack_state(ipc, a_ice, m_ice, m_snow,
                             jnp.asarray(np.where(cold, -10.0, 0.0)))
    # initial concentrations at the prescribed mixed-layer values
    has = np.asarray(ipk.aicen) > c.puny
    NO3_0 = np.asarray(ipk.ta[:, 1])
    assert np.allclose(NO3_0[has], ipc.bgc_NO3_ocn)
    f = zero_ice_forcing(pi_mesh)
    f = dataclasses.replace(
        f, Tair=jnp.asarray(np.where(cold, -15.0, 10.0)),
        shortwave=jnp.full(N, 120.0), longwave=jnp.full(N, 200.0),
        shum=jnp.full(N, 1e-3), u_wind=jnp.full(N, 5.0),
        v_wind=jnp.full(N, 1.0), stress_atmice_x=jnp.full(N, 0.05),
        prec_rain=jnp.full(N, 1e-8))
    ocean = OceanSurface(T_oc=jnp.asarray(np.where(cold, -1.9, 15.0)),
                         S_oc=jnp.full(N, 34.0), u_w=jnp.zeros(N),
                         v_w=jnp.zeros(N), elevation=jnp.zeros(N))
    step = jax.jit(lambda s, i: icepack_timestep(
        s, i, pi_mesh, f, ocean, cfg, ipc, use_virt_salt=False))
    ipk1, ice1 = step(ipk, ice)
    ipk2, ice2 = step(ipk1, ice1)
    sb = ipc.bgc_slice
    conc = ipk2.ta[:, sb]
    assert bool(jnp.isfinite(conc).all())
    assert float(conc.min()) >= 0.0
    has2 = np.asarray(ipk2.aicen) > 0.1
    # nutrients stay within an order of the mixed-layer pool
    assert float(jnp.max(conc[:, 1][jnp.asarray(has2)])) \
        <= 2.0 * ipc.bgc_NO3_ocn
