"""Floe size distribution (FSD) tracer tests.

Reference: the FSD hooks of the reference icepack driver
(``src/icepack_drivers/icedrv_main.F90:49`` nfsd, ``:677-697``
floe_rad bounds / d_afsd history fields); physics after Roach et al. 2018
(JGR Oceans) and Roach et al. 2018b (GRL welding).
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
from fesom2_tpu.ice.icepack import fsd
from fesom2_tpu.ice.icepack import constants as c


@pytest.fixture(scope="module")
def ipc_fsd():
    return IcepackConfig(tr_fsd=True)


def test_bounds_and_layout(ipc_fsd):
    lims = fsd.fsd_bounds(12)
    assert lims.shape == (13,)
    assert (np.diff(lims) > 0).all()
    # icepack standard set spans ~7 cm to ~950 m radius
    assert abs(lims[0] - 0.0665) < 1e-4
    assert 900 < lims[-1] < 1000
    # tracer names registered in the area-weighted stack, ridge-conserved
    names = [n for n in ipc_fsd.area_tracers if n.startswith("fsd")]
    assert len(names) == 12
    keeps = [k for n, k in zip(ipc_fsd.area_tracers, ipc_fsd.ta_ridge_keep)
             if n.startswith("fsd")]
    assert all(keeps)


def _uniform_afsd(ncat, nfsd, N, dtype=jnp.float64):
    return jnp.full((ncat, nfsd, N), 1.0 / nfsd, dtype)


def test_normalize(ipc_fsd):
    lims = ipc_fsd.fsd_lims
    a = jnp.asarray([[0.5, 0.0, 0.3]])
    f = jnp.asarray(np.random.RandomState(1).rand(1, 12, 3))
    out = fsd.afsd_normalize(f, a)
    s = np.asarray(out.sum(1))[0]
    assert abs(s[0] - 1.0) < 1e-12 and abs(s[2] - 1.0) < 1e-12
    assert s[1] == 0.0
    # empty distribution under ice -> largest-bin fallback
    out2 = fsd.afsd_normalize(jnp.zeros_like(f), a)
    assert float(out2[0, -1, 0]) == 1.0


def test_radial_growth_shifts_up_and_conserves(ipc_fsd):
    lims = ipc_fsd.fsd_lims
    # delta distribution in bin 3: growth must leak area into bin 4 only
    f = jnp.zeros((1, 12, 4)).at[:, 3].set(1.0)
    a = jnp.full((1, 4), 0.8)
    dr = jnp.full((1, 4), 1.0)          # 1 m radial growth
    out = fsd.afsd_normalize(fsd.fsd_radial_evolve(f, dr, lims), a)
    r = fsd.fsd_centers(lims)
    mean0 = float((f[0, :, 0] * r).sum())
    mean1 = float((out[0, :, 0] * r).sum())
    assert mean1 > mean0                 # distribution moved to larger floes
    assert float(out[0, 4, 0]) > 0.0
    assert float(out[0, :3, 0].sum()) == 0.0
    assert np.allclose(np.asarray(out.sum(1)), 1.0, atol=1e-12)


def test_radial_melt_shifts_down(ipc_fsd):
    lims = ipc_fsd.fsd_lims
    f = jnp.zeros((1, 12, 4)).at[:, 3].set(1.0)
    a = jnp.full((1, 4), 0.8)
    dr = jnp.full((1, 4), -1.0)
    out = fsd.afsd_normalize(fsd.fsd_radial_evolve(f, dr, lims), a)
    r = fsd.fsd_centers(lims)
    assert float((out[0, :, 0] * r).sum()) < float((f[0, :, 0] * r).sum())
    assert float(out[0, 2, 0]) > 0.0
    assert float(out[0, 4:, 0].sum()) == 0.0


def test_welding_conserves_and_coarsens(ipc_fsd):
    lims = ipc_fsd.fsd_lims
    # everything in mid-size floes, full cover, freezing (bin 2 floes
    # weld pairwise into bin-3-sized floes: sqrt(2)*r_2 crosses lims[3])
    f = jnp.zeros((1, 12, 3)).at[:, 2].set(1.0)
    a = jnp.full((1, 3), 1.0)
    freezing = jnp.asarray([True, True, False])
    out = fsd.fsd_weld(f, a, freezing, dt=3600.0, kweld=1e-4, lims=lims)
    s = np.asarray(out.sum(1))
    assert np.allclose(s, 1.0, atol=1e-12)          # ordered-pair form conserves
    r = fsd.fsd_centers(lims)
    m0 = float((f[0, :, 0] * r).sum())
    m1 = float((out[0, :, 0] * r).sum())
    assert m1 > m0                                  # welding coarsens
    # no welding where not freezing
    assert np.allclose(np.asarray(out[0, :, 2]), np.asarray(f[0, :, 2]))


def test_lateral_melt_scale_feedback(ipc_fsd):
    lims = ipc_fsd.fsd_lims
    small = jnp.zeros((1, 12, 1)).at[:, 0].set(1.0)
    large = jnp.zeros((1, 12, 1)).at[:, -1].set(1.0)
    s_small = float(fsd.fsd_lateral_melt_scale(small, lims)[0, 0])
    s_large = float(fsd.fsd_lateral_melt_scale(large, lims)[0, 0])
    assert s_small > s_large            # small floes melt laterally faster
    # constant-floediam distribution reproduces scale ~1: floes of radius
    # floediam/2 give exactly 1
    r = fsd.fsd_centers(lims)
    k = int(np.argmin(np.abs(r - c.floediam / 2.0)))
    mid = jnp.zeros((1, 12, 1)).at[:, k].set(1.0)
    s_mid = float(fsd.fsd_lateral_melt_scale(mid, lims)[0, 0])
    assert 0.2 < s_mid < 5.0


def test_driver_step_with_fsd(pi_mesh):
    """Full icepack step with tr_fsd: finite, normalized, mean radius
    sane, and restart fields carry the bins (via the generic ta stack)."""
    cfg = ModelConfig()
    cfg.timestep.step_per_day = 96
    cfg.ice.whichEVP = 1
    cfg.run.use_ice = True
    ipc = IcepackConfig(tr_fsd=True)
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
    assert ipk.ta.shape[1] == ipc.nfsd
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
    step = jax.jit(lambda s, i: icepack_timestep(
        s, i, pi_mesh, f, ocean, cfg, ipc, use_virt_salt=False))
    ipk1, ice1 = step(ipk, ice)
    ipk2, ice2 = step(ipk1, ice1)
    afsd = ipk2.ta[:, ipc.fsd_slice]
    assert bool(jnp.isfinite(afsd).all())
    has = np.asarray(ipk2.aicen) > c.puny
    s = np.asarray(afsd.sum(1))
    assert np.allclose(s[has], 1.0, atol=1e-6)
    assert (np.abs(s[~has]) < 1e-6).all()
    rad = fsd.fsd_mean_radius(afsd, ipk2.aicen, ipc.fsd_lims)
    rad = np.asarray(rad)
    icy = np.asarray(ipk2.aicen.sum(0)) > 0.1
    assert (rad[icy] > 0.0).all()
    assert (rad[icy] <= ipc.fsd_lims[-1]).all()


def test_restart_roundtrip_with_fsd(pi_mesh, tmp_path):
    """The fsd bins ride the ipk_ta restart record."""
    from fesom2_tpu.io.restart import write_restart, read_restart
    from fesom2_tpu.core.state import allocate_state
    from fesom2_tpu.ice.state import allocate_ice

    ipc = IcepackConfig(tr_fsd=True)
    N = pi_mesh.n_nodes
    a = jnp.asarray(np.clip(np.random.RandomState(3).rand(N), 0, 0.9))
    ipk = init_icepack_state(ipc, a, a * 1.2, a * 0.1, jnp.full((N,), -5.0))
    st = allocate_state(pi_mesh)
    ice = allocate_ice(pi_mesh)
    p = str(tmp_path / "restart_fsd.nc")
    write_restart(p, st, ice=ice, ipk=ipk)
    _, _, ipk2 = read_restart(p, st, ice=ice, ipk=ipk)
    assert np.allclose(np.asarray(ipk2.ta), np.asarray(ipk.ta))
