"""Ice-shelf cavity support: ulevels derivation, masks, melt fluxes, and a
coupled run with a synthetic Antarctic shelf on the pi mesh
(ref fvom_init.F90:878-1075 find_levels_cavity, cavity_param.F90)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fesom2_tpu.mesh.io import read_raw_mesh


def _synthetic_draft(mesh_path="/root/reference/test/meshes/pi",
                     lat_cut=-72.0, draft=-250.0):
    raw = read_raw_mesh(mesh_path, force_rotation=True)
    lat = raw.coords_deg[:, 1]
    cd = np.where(lat < lat_cut, draft, 0.0)
    return cd


@pytest.fixture(scope="module")
def cav_model():
    from fesom2_tpu.model import setup_pi_model, pi_initial_state
    cd = _synthetic_draft()
    model, atm = setup_pi_model(cavity_depth=cd)
    state, ice = pi_initial_state(model)
    return model, state, ice, cd


def test_ulevels_derivation(cav_model):
    model, state, ice, cd = cav_model
    mesh = model.mesh
    uln = np.asarray(mesh.ulevels_node)
    ule = np.asarray(mesh.ulevels_elem)
    nle = np.asarray(mesh.nlevels_elem)
    assert (uln >= 1).all() and (ule >= 1).all()
    assert (ule > 1).any(), "synthetic shelf produced no cavity"
    # every element keeps at least 3 active layers
    assert (nle - ule >= 3).all()
    # where the bathymetry is deep enough, the cavity boundary sits at the
    # first mid-depth below the draft (most elements; the isolated-cell
    # elimination may raise some, ref :957-1040)
    Z = np.asarray(mesh.Z)
    cav = ule > 1
    en = np.asarray(mesh.elem_nodes)
    full_draft = (cd[en] < 0).all(axis=1)
    deep = full_draft & (nle - 1 - np.searchsorted(-Z, 250.0) >= 4)
    assert deep.any()
    frac_at_draft = (Z[ule[deep] - 1] < -250.0).mean()
    assert frac_at_draft > 0.6
    # no isolated cells remain among interior (2+ neighbor) elements: every
    # open (elem, layer) has >=2 open neighbors
    enb = np.asarray(mesh.elem_neighbors) if hasattr(mesh, "elem_neighbors") \
        else None
    if enb is not None:
        has2nb = (enb >= 0).sum(1) >= 2
        for nz in range(1, int(ule.max()) + 1):
            active = (ule <= nz) & (nz < nle)
            nb_open = (enb >= 0) & active[np.clip(enb, 0, None)]
            bad = active & has2nb & (nb_open.sum(1) < 2)
            assert bad.sum() == 0, f"isolated cells remain at nz={nz}"
    # masks closed above the cavity
    lm = np.asarray(mesh.node_layer_mask)
    for n in np.nonzero(uln > 1)[0][:10]:
        assert not lm[: uln[n] - 1, n].any()
        assert lm[uln[n] - 1: np.asarray(mesh.nlevels_node)[n] - 1, n].all()
    # surface scalar area vanishes at cavity nodes (no atmosphere contact)
    area0 = np.asarray(mesh.area[0])
    assert (area0[uln > 1] == 0.0).all()


def test_cavity_melt_fluxes(cav_model):
    from fesom2_tpu.core import cavity, eos, dynamics
    model, state, ice, cd = cav_model
    mesh = model.mesh
    state = dynamics.compute_vel_nodes(state, mesh)
    state = eos.pressure_bv(state, mesh, model.cfg, model.density_ref)
    hf, wf = jax.jit(lambda s: cavity.cavity_heat_water_fluxes_3eq(
        s, mesh, model.density_ref))(state)
    hf, wf = np.asarray(hf), np.asarray(wf)
    cav = np.asarray(mesh.ulevels_node) > 1
    assert np.isfinite(hf).all() and np.isfinite(wf).all()
    assert (hf[~cav] == 0.0).all() and (wf[~cav] == 0.0).all()
    assert (np.abs(hf[cav]) > 0.0).any()
    # melt rates within physical magnitude (<100 m/yr)
    assert np.abs(wf[cav]).max() < 100.0 / (365 * 86400) * 30
    # 2-eq variant agrees in sign pattern with freezing-point physics
    hf2, wf2 = cavity.cavity_heat_water_fluxes_2eq(state, mesh)
    assert np.isfinite(np.asarray(hf2)).all()
    assert (np.sign(np.asarray(wf2)[cav]) == -np.sign(hf2[cav])).all()


def test_cavity_coupled_steps(cav_model):
    from fesom2_tpu.model import pi_coupled_step_fn
    model, state, ice, cd = cav_model
    mesh = model.mesh
    from fesom2_tpu.model import setup_pi_model
    # fresh atm data (fixture scope keeps model immutable otherwise)
    _, atm = setup_pi_model()
    step = pi_coupled_step_fn(model, atm)
    for k in range(5):
        state, ice, ofo = step(state, ice, jnp.asarray(k))
    m = np.asarray(mesh.node_layer_mask)
    T = np.asarray(state.tr[0]); S = np.asarray(state.tr[1])
    assert np.isfinite(T).all() and np.isfinite(S).all()
    assert T[m].min() > -3.0 and T[m].max() < 35.0
    assert S[m].min() > 3.0 and S[m].max() < 45.0
    cav = np.asarray(mesh.ulevels_node) > 1
    # no sea ice under the shelf
    assert np.asarray(ice.m_ice)[cav].max() == 0.0
    assert np.asarray(ice.a_ice)[cav].max() == 0.0
    # melt fluxes active under the shelf in the assembled forcing
    assert np.abs(np.asarray(ofo.heat_flux)[cav]).max() > 0.0
    # masked rows above the cavity stay empty
    uln = np.asarray(mesh.ulevels_node)
    for n in np.nonzero(cav)[0][:5]:
        assert np.abs(T[: uln[n] - 1, n]).max() == 0.0
