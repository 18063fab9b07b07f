"""Post-processing tools (replaces view/ + fpost2): mesh loader, regrid,
MOC, climatology compare, end-to-end from a real run's outputs."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu import post


@pytest.fixture(scope="module")
def run_outputs(tmp_path_factory, pi_mesh):
    """A short real coupled run producing stream files + mesh diag
    (per-step stream frequency so 3 steps yield records)."""
    from fesom2_tpu.model import (setup_pi_model, pi_initial_state,
                                  pi_coupled_step_fn)
    from fesom2_tpu.io.streams import (OutputStreams, default_ocean_streams,
                                       default_ice_streams)
    from fesom2_tpu.io.mesh_info import write_mesh_info
    from fesom2_tpu.utils.clock import Clock
    out = str(tmp_path_factory.mktemp("result"))
    # linfs ('fast' parity): moc_z closure (psi -> 0 at the
    # last latitude) holds exactly only for fixed coordinates
    model, atm = setup_pi_model(parity="fast")
    state, ice = pi_initial_state(model)
    write_mesh_info(out, model.mesh)
    step = pi_coupled_step_fn(model, atm)
    defs = default_ocean_streams(model.mesh) + default_ice_streams()
    for d in defs:
        d.unit, d.freq = "s", 1          # flush every step
    streams = OutputStreams(defs, out)
    clock = Clock(0.0, 1, 1948)
    for k in range(3):
        state, ice, _ = step(state, ice, jnp.asarray(k))
        before = clock.copy()
        clock.advance(model.cfg.dt)
        streams.update_means(state, ice)
        streams.maybe_flush(before, clock, k)
    streams.finalize()
    return out, state, ice


def test_load_mesh_from_diag(run_outputs, pi_mesh):
    out, state, ice = run_outputs
    m = post.load_mesh(out)
    assert m.n2d == pi_mesh.n_nodes
    assert m.elem.shape == (pi_mesh.n_elems, 3)
    assert m.elem.min() == 0 and m.elem.max() == m.n2d - 1
    assert post.ind_for_depth(100.0, m) > 0
    els = post.cut_region(m, box=(-80, 0, 20, 60))   # N Atlantic
    assert 0 < els.size < m.e2d


def test_read_stream_and_regrid(run_outputs):
    out, state, ice = run_outputs
    m = post.load_mesh(out)
    sst = post.read_stream(out, "sst", 1948)
    assert sst.shape == (m.n2d,)
    glon, glat = post.regular_grid(nx=72, ny=36)
    gridded = post.fesom2regular(sst, m, glon, glat,
                                 radius_of_influence=1e6)
    assert gridded.shape == glon.shape
    ok = np.isfinite(gridded)
    assert ok.mean() > 0.8                      # coarse grid, global mesh
    # value range preserved by nearest-neighbour
    assert np.nanmin(gridded) >= sst.min() - 1e-12
    assert np.nanmax(gridded) <= sst.max() + 1e-12


def test_moc_z(run_outputs):
    out, state, ice = run_outputs
    m = post.load_mesh(out)
    lat, psi = post.moc_z(np.asarray(state.w), m.area, m.y2)
    assert psi.shape == (lat.size, m.zlev.size)
    assert np.isfinite(psi).all()
    # global integral of w over the whole ocean ~ 0 (volume conservation):
    # the last latitude row is the full-domain integral
    assert np.abs(psi[-1]).max() < 1.0          # Sv
    assert np.abs(psi).max() < 200.0


def test_moc_dens_from_diag(run_outputs, pi_mesh):
    out, state, ice = run_outputs
    from fesom2_tpu.core import diagnostics as dg
    from fesom2_tpu.model import setup_pi_model
    model, atm = setup_pi_model()
    res = dg.diag_dens_moc(state, model.mesh, model.cfg)
    m = post.load_mesh(out)
    # element latitudes = mean of vertex latitudes
    late = m.y2[m.elem].mean(-1)
    lat, dens, psi = post.moc_dens(res["std_dens_VDZ"], m.elem_area, late,
                                   res["std_dens"])
    assert psi.shape == (lat.size, dens.size)
    assert np.isfinite(psi).all()


def test_climatology_compare(run_outputs):
    out, state, ice = run_outputs
    m = post.load_mesh(out)
    clim = post.Climatology("/root/reference/test/input/global/woa18_netcdf_5deg.nc")
    assert clim.T is not None and clim.z.size > 10
    model_T, clim_T, bias = post.fesom2clim(np.asarray(state.tr[0]), m, clim,
                                            field="T")
    ok = np.isfinite(bias)
    assert ok.any()
    # after 3 steps from WOA ICs the surface bias vs WOA is small
    assert np.nanmean(np.abs(bias[0])) < 3.0


def test_plot_tools(run_outputs):
    """fesom_plot_tools equivalents render without error (Agg backend)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    out, state, ice = run_outputs
    m = post.load_mesh(out)
    sst = np.asarray(state.tr[0, 0]).astype(float)
    fig, ax, im = post.ftriplot(m, sst)
    assert len(ax.collections) > 0 or im is not None
    plt.close(fig)
    # polar view + element data
    ev = np.asarray(state.u[0]).astype(float)
    fig, ax, im = post.ftriplot(m, ev, oce="np", data_on_elem=True,
                                do_cbar=False)
    plt.close(fig)
    # regridded xy + section plots
    lons, lats = post.regular_grid(90, 45)
    gridded = post.fesom2regular(sst, m, lons, lats)
    fig, ax, im = post.wplot_xy(lons, lats, gridded)
    plt.close(fig)
    lat_axis = np.linspace(-80, 80, 17)
    sec = np.outer(m.zmid, np.ones(lat_axis.size))
    fig, ax, im = post.wplot_yz(lat_axis, m.zmid, sec)
    plt.close(fig)
    ma = post.moving_average(np.arange(10.0), 3)
    assert ma.shape == (10,)
    # edge padding: constant input stays constant at the ends (ADVICE r1)
    assert np.allclose(post.moving_average(np.ones(7), 3), 1.0)
    # degenerate data guards (ADVICE r1)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="NaN"):
        post.ftriplot(m, np.full_like(sst, np.nan))
    with _pytest.raises(ValueError, match="masked"):
        post.wplot_xy(lons, lats, np.full_like(np.asarray(gridded), np.nan))
