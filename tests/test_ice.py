"""Sea-ice component tests on the pi mesh (global, with coastlines)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.config import ModelConfig
from fesom2_tpu.ice.state import allocate_ice, zero_ice_forcing, OceanSurface
from fesom2_tpu.ice.fct import _mass_matvec, ice_fct_advect
from fesom2_tpu.ice.step import ice_timestep


@pytest.fixture(scope="module")
def cfg():
    c = ModelConfig()
    c.timestep.step_per_day = 96          # pi CI config
    c.ice.whichEVP = 1
    c.run.use_ice = True
    return c


@pytest.fixture(scope="module")
def ice0(pi_mesh):
    ice = allocate_ice(pi_mesh)
    # ice_initial_state (ref ice_setup_step.F90:284-330): cold water -> ice
    glat = np.asarray(pi_mesh.geo_coords)[:, 1]
    cold = np.abs(glat) > np.deg2rad(60.0)   # synthetic cold mask
    north = glat > 0
    m_ice = np.where(cold, np.where(north, 1.0, 2.0), 0.0)
    m_snow = np.where(cold, np.where(north, 0.1, 0.5), 0.0)
    a_ice = np.where(cold, 0.9, 0.0)
    import dataclasses
    return dataclasses.replace(ice, m_ice=jnp.asarray(m_ice),
                               m_snow=jnp.asarray(m_snow),
                               a_ice=jnp.asarray(a_ice))


def test_mass_matrix_row_sums(pi_mesh):
    """Consistent mass matrix row sums must equal the scalar areas
    (the check in ice_mass_matrix_fill, ref ice_fct.F90:686-700)."""
    ones = jnp.ones(pi_mesh.n_nodes)
    rows = np.asarray(_mass_matvec(ones, pi_mesh))
    area = np.asarray(pi_mesh.area)[0]
    assert np.allclose(rows, area, rtol=1e-12)


def test_fct_advection_conserves_and_bounds(pi_mesh, cfg, ice0):
    """Zero velocity: total volume exactly conserved; pointwise changes only
    where the limiter clips the gamma-diffusion antidiffusion (ice edge)."""
    out = ice_fct_advect(ice0, pi_mesh, cfg, 900.0)
    area = np.asarray(pi_mesh.area)[0]
    for f in ("m_ice", "a_ice", "m_snow"):
        t0 = float((np.asarray(getattr(ice0, f)) * area).sum())
        t1 = float((np.asarray(getattr(out, f)) * area).sum())
        assert abs(t1 - t0) <= 1e-9 * max(abs(t0), 1.0), f
    # no new extrema beyond the initial range
    m = np.asarray(out.m_ice)
    assert m.min() >= -1e-12 and m.max() <= np.asarray(ice0.m_ice).max() + 1e-9
    # pointwise deviation stays bounded (diffusion-limited)
    dev = np.abs(m - np.asarray(ice0.m_ice))
    assert dev.max() < 0.5


def test_fct_advection_moving_conserves_mass(pi_mesh, cfg, ice0):
    """With a rigid velocity field, total ice volume must be conserved."""
    import dataclasses
    u = jnp.asarray(0.1 * np.asarray(pi_mesh.bc_index_node))
    ice = dataclasses.replace(ice0, u_ice=u, v_ice=u * 0.5)
    area = np.asarray(pi_mesh.area)[0]
    total0 = float((np.asarray(ice.m_ice) * area).sum())
    out = ice_fct_advect(ice, pi_mesh, cfg, 900.0)
    total1 = float((np.asarray(out.m_ice) * area).sum())
    assert np.isfinite(total1)
    # conservation up to the cut_off correction (the reference's cut_off
    # zeroes small negatives produced by the divergence split, ref
    # ice_thermo_oce.F90:29, so strict conservation is not expected)
    assert abs(total1 - total0) / abs(total0) < 1e-6
    # concentration stays in [0, 1]
    a = np.asarray(out.a_ice)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-12


@pytest.mark.parametrize("which", [0, 1, 2])
def test_evp_variants(pi_mesh, cfg, ice0, which):
    """All three EVP solvers (standard/mEVP/aEVP) produce finite, bounded
    drift from wind stress over ice, zero velocity on the coast, and zero
    where there is no ice (standard EVP) / unforced open water."""
    import dataclasses
    import jax
    from fesom2_tpu.ice.evp import ice_dynamics

    c = dataclasses.replace(cfg)
    c.ice = dataclasses.replace(cfg.ice, whichEVP=which)
    N = pi_mesh.n_nodes
    forcing = zero_ice_forcing(pi_mesh)
    forcing = dataclasses.replace(
        forcing,
        stress_atmice_x=jnp.full(N, 0.1),
        stress_atmice_y=jnp.full(N, 0.02))
    ocean = OceanSurface(T_oc=jnp.full(N, -1.8), S_oc=jnp.full(N, 34.0),
                         u_w=jnp.zeros(N), v_w=jnp.zeros(N),
                         elevation=jnp.zeros(N))
    run = jax.jit(lambda ice: ice_dynamics(ice, pi_mesh, forcing, ocean, c))
    ice = ice0
    for _ in range(2):
        ice = run(ice)
    u = np.asarray(ice.u_ice)
    v = np.asarray(ice.v_ice)
    assert np.isfinite(u).all() and np.isfinite(v).all(), which
    has_ice = np.asarray(ice0.a_ice) >= 0.01
    assert np.abs(u[has_ice]).max() > 1e-6, which  # wind actually moves ice
    assert np.abs(u).max() < 1.0 and np.abs(v).max() < 1.0, which
    bc = np.asarray(pi_mesh.bc_index_node) == 0.0
    assert np.abs(u[bc]).max() == 0.0, which
    if which == 2:
        assert np.asarray(ice.beta_aevp).min() >= 50.0


def test_ice_full_step(pi_mesh, cfg, ice0):
    """EVP + advection + thermodynamics stays finite and physical."""
    import jax
    forcing = zero_ice_forcing(pi_mesh)
    import dataclasses
    forcing = dataclasses.replace(
        forcing,
        Tair=jnp.asarray(np.where(np.asarray(ice0.a_ice) > 0, -25.0, 10.0)),
        shortwave=jnp.full(pi_mesh.n_nodes, 10.0),
        longwave=jnp.full(pi_mesh.n_nodes, 150.0),
        shum=jnp.full(pi_mesh.n_nodes, 1e-3),
        u_wind=jnp.full(pi_mesh.n_nodes, 5.0),
        stress_atmice_x=jnp.full(pi_mesh.n_nodes, 0.05),
    )
    N = pi_mesh.n_nodes
    # ocean at the freezing point under the ice -> no ocean-side melting
    ocean = OceanSurface(T_oc=jnp.where(ice0.a_ice > 0, -1.8710, 15.0),
                         S_oc=jnp.full(N, 34.0),
                         u_w=jnp.zeros(N), v_w=jnp.zeros(N),
                         elevation=jnp.zeros(N))
    step = jax.jit(lambda ice: ice_timestep(ice, pi_mesh, forcing, ocean,
                                            cfg, use_virt_salt=True))
    ice = ice0
    for _ in range(3):
        ice = step(ice)
    for f in ("u_ice", "v_ice", "m_ice", "a_ice", "m_snow", "net_heat_flux",
              "fresh_wa_flux"):
        arr = np.asarray(getattr(ice, f))
        assert np.isfinite(arr).all(), f
    assert np.asarray(ice.m_ice).min() >= 0.0
    assert np.asarray(ice.a_ice).max() <= 1.0 + 1e-9
    assert np.abs(np.asarray(ice.u_ice)).max() < 1.0   # sane drift speeds
    # cold air over ice -> some growth somewhere
    assert np.asarray(ice.thdgr).max() > 0.0
