"""Coupled-mode ice thermodynamics (Dorn 2009, ref ice_thermo_cpl.F90) and
the OASIS coupler interface (ref cpl_driver.F90, gen_forcing_couple.F90)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fesom2_tpu.config import ModelConfig
from fesom2_tpu.ice.state import allocate_ice, zero_ice_forcing, OceanSurface
from fesom2_tpu.ice.thermo_cpl import CoupledAtmFluxes, thermodynamics_cpl
from fesom2_tpu.ice.step import ice_timestep_cpl
from fesom2_tpu.coupler import (CplDriver, InMemoryTransport,
                                force_flux_consv, SEND_FIELDS_ECHAM,
                                RECV_FIELDS_ECHAM)


@pytest.fixture(scope="module")
def cfg():
    c = ModelConfig()
    c.timestep.step_per_day = 96
    c.run.use_ice = True
    return c


def _atm(N, heat_oce=0.0, heat_ice=0.0, snow=0.0, rain=0.0):
    z = jnp.zeros(N)
    return CoupledAtmFluxes(
        oce_heat_flux=jnp.full(N, heat_oce),
        ice_heat_flux=jnp.full(N, heat_ice),
        shortwave=z, evap_no_ifrac=z, sublimation=z,
        prec_rain=jnp.full(N, rain), prec_snow=jnp.full(N, snow), runoff=z)


def _surf(N, T=-1.0, S=34.0):
    z = jnp.zeros(N)
    return OceanSurface(T_oc=jnp.full(N, T), S_oc=jnp.full(N, S),
                        u_w=z, v_w=z, elevation=z)


def test_cpl_freezing_grows_ice(pi_mesh, cfg):
    N = pi_mesh.n_nodes
    ice = allocate_ice(pi_mesh)
    ice = dataclasses.replace(ice, a_ice=jnp.full(N, 0.5),
                              m_ice=jnp.full(N, 1.0))
    # strong atmospheric cooling over ice and open water, cold ocean
    atm = _atm(N, heat_oce=-300.0, heat_ice=-300.0)
    surf = _surf(N, T=-1.9)
    out = jax.jit(lambda i: thermodynamics_cpl(i, atm, surf, cfg, True))(ice)
    assert np.isfinite(np.asarray(out.m_ice)).all()
    assert float(out.m_ice.min()) >= 0.0
    assert float((out.m_ice - ice.m_ice).min()) > 0.0      # everywhere growth
    assert float(out.a_ice.max()) <= 1.0
    assert float(out.thdgr.mean()) > 0.0
    # freezing releases latent heat to the ocean budget: ehf balances
    assert np.isfinite(np.asarray(out.net_heat_flux)).all()


def test_cpl_warming_melts_ice_and_conserves_freshwater(pi_mesh, cfg):
    N = pi_mesh.n_nodes
    ice = allocate_ice(pi_mesh)
    ice = dataclasses.replace(ice, a_ice=jnp.full(N, 0.9),
                              m_ice=jnp.full(N, 0.5),
                              m_snow=jnp.full(N, 0.1))
    atm = _atm(N, heat_oce=300.0, heat_ice=300.0)
    surf = _surf(N, T=2.0)
    out = thermodynamics_cpl(ice, atm, surf, cfg, True)
    assert float((out.m_ice - ice.m_ice).max()) < 0.0      # melt everywhere
    assert float(out.m_ice.min()) >= 0.0
    assert float(out.a_ice.min()) >= 0.0
    # melting puts freshwater into the ocean (fw > 0 where ice melted)
    assert float(out.fresh_wa_flux.mean()) > 0.0


def test_cpl_snowfall_and_flooding(pi_mesh, cfg):
    N = pi_mesh.n_nodes
    ice = allocate_ice(pi_mesh)
    ice = dataclasses.replace(ice, a_ice=jnp.full(N, 1.0),
                              m_ice=jnp.full(N, 0.1),
                              m_snow=jnp.full(N, 0.5))
    atm = _atm(N)      # no heat fluxes: pure Archimedes flooding
    surf = _surf(N, T=-1.8)
    out = thermodynamics_cpl(ice, atm, surf, cfg, True)
    # heavy snow on thin ice floods: snow converts to ice
    assert float(out.flice.min()) > 0.0
    assert float(out.m_ice.mean()) > 0.1
    assert float(out.m_snow.mean()) < 0.5


def test_ice_timestep_cpl_runs(pi_mesh, cfg):
    N = pi_mesh.n_nodes
    ice = allocate_ice(pi_mesh)
    glat = np.asarray(pi_mesh.geo_coords)[:, 1]
    cold = np.abs(glat) > np.deg2rad(60.0)
    ice = dataclasses.replace(ice, a_ice=jnp.asarray(np.where(cold, 0.9, 0.0)),
                              m_ice=jnp.asarray(np.where(cold, 1.0, 0.0)))
    atm = _atm(N, heat_oce=-100.0, heat_ice=-100.0)
    forcing = zero_ice_forcing(pi_mesh)
    surf = _surf(N, T=-1.5)
    step = jax.jit(lambda i: ice_timestep_cpl(i, pi_mesh, forcing, atm, surf,
                                              cfg, True))
    out = step(ice)
    for f in ("m_ice", "a_ice", "m_snow", "net_heat_flux", "fresh_wa_flux"):
        assert np.isfinite(np.asarray(getattr(out, f))).all(), f


def test_cpl_driver_roundtrip(pi_mesh, cfg):
    from fesom2_tpu.core.state import allocate_state
    N = pi_mesh.n_nodes
    state = allocate_state(pi_mesh)
    state = dataclasses.replace(
        state, tr=state.tr.at[0, 0].set(jnp.full(N, 10.0)))
    ice = allocate_ice(pi_mesh)
    ice = dataclasses.replace(ice, a_ice=jnp.full(N, 0.25))
    tp = InMemoryTransport()
    drv = CplDriver(pi_mesh, tp)
    # accumulate two steps with different SST: transported field = mean
    drv.collect(state, ice)
    state2 = dataclasses.replace(
        state, tr=state.tr.at[0, 0].set(jnp.full(N, 20.0)))
    drv.collect(state2, ice)
    drv.send()
    assert np.allclose(tp.get("sst_feom"), 15.0)
    assert np.allclose(tp.get("sie_feom"), 0.25)
    # recv returns None until the atmosphere posted everything
    assert drv.recv() is None
    for n in RECV_FIELDS_ECHAM:
        tp.put(n, np.full(N, 2.0))
    atm, stresses = drv.recv()
    assert np.allclose(np.asarray(atm.oce_heat_flux), 2.0)
    assert set(stresses) == {"stress_atmoce_x", "stress_atmoce_y",
                             "stress_atmice_x", "stress_atmice_y"}


def test_force_flux_consv(pi_mesh):
    N = pi_mesh.n_nodes
    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.standard_normal(N) * 10.0)
    mask = jnp.ones(N)
    area = np.asarray(pi_mesh.area[0])
    atm_net = 1.23e12
    out = force_flux_consv(field, mask, atm_net, pi_mesh, hemisphere=0)
    new_int = float((np.asarray(out) * area).sum())
    assert abs(new_int - atm_net) / abs(atm_net) < 1e-10
    # hemispheric correction only touches that hemisphere
    lat = np.asarray(pi_mesh.geo_coords[:, 1])
    out_nh = np.asarray(force_flux_consv(field, mask, atm_net, pi_mesh,
                                         hemisphere=1))
    assert np.allclose(out_nh[lat < 0], np.asarray(field)[lat < 0])


def test_external_endpoint_with_atmosphere_process(pi_mesh, cfg, tmp_path):
    """OASIS external-model endpoint (cpl_driver.F90 role): the ocean hosts
    an OasisEndpoint; a SEPARATE atmosphere process connects over a unix
    socket, blocks on the ocean's averaged send fields, computes its
    response fluxes, and puts the full ECHAM recv set back.  The round
    trip must deliver physically-consistent fields (the atmosphere's
    fluxes are a function of the SST it received)."""
    import dataclasses
    import subprocess
    import sys
    import textwrap

    from fesom2_tpu.coupler.transport import OasisEndpoint
    from fesom2_tpu.coupler.oasis import RECV_FIELDS_ECHAM
    from fesom2_tpu.ice.state import allocate_ice

    sock = str(tmp_path / "oasis.sock")
    ep = OasisEndpoint(sock)

    atm_src = textwrap.dedent(f"""
        import numpy as np
        import sys
        sys.path.insert(0, {repr("/root/repo")})
        from fesom2_tpu.coupler.transport import SocketTransport
        from fesom2_tpu.coupler.oasis import RECV_FIELDS_ECHAM
        tp = SocketTransport({repr(sock)})
        sst = tp.get("sst_feom", timeout=30.0)
        assert sst is not None
        for name in RECV_FIELDS_ECHAM:
            if name == "heat_oce":
                tp.put(name, -10.0 * (sst - 10.0))   # relax toward 10 C
            elif name == "taux_oce":
                tp.put(name, np.full_like(sst, 0.05))
            else:
                tp.put(name, np.zeros_like(sst))
        tp.close()
    """)
    script = tmp_path / "dummy_atm.py"
    script.write_text(atm_src)
    proc = subprocess.Popen([sys.executable, str(script)],
                            env={"PYTHONPATH": "", "JAX_PLATFORMS": "cpu",
                                 "PATH": "/usr/bin:/bin:/opt/venv/bin"})
    try:
        drv = CplDriver(pi_mesh, ep)
        N = pi_mesh.n_nodes
        state = type("S", (), {})()
        state.tr = jnp.stack([jnp.full((47, N), 12.0),
                              jnp.full((47, N), 34.0)])[:, :, :]
        ice = allocate_ice(pi_mesh)
        drv.collect(state, ice)
        drv.send()
        # blocking receive (poll until the atmosphere answered)
        import time
        got = None
        for _ in range(300):
            got = drv.recv()
            if got is not None:
                break
            time.sleep(0.1)
        assert got is not None, "atmosphere process never answered"
        atm, stresses = got
        # the flux is the function of the SST we sent: -10*(12-10) = -20
        np.testing.assert_allclose(np.asarray(atm.oce_heat_flux), -20.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(stresses["stress_atmoce_x"]),
                                   0.05, rtol=1e-6)
        assert proc.wait(timeout=30) == 0
    finally:
        proc.kill()
        ep.close()
