"""Per-phase step profiling: the reference's per-step ALE breakdown table
(``oce_ale.F90:2779-2797``, ``ice_setup_step.F90:263-277``,
"BENCHMARK RUNTIME" ``fvom_main.F90:299-327``) for the jitted TPU step.

The coupled step is ONE fused XLA program, so phases cannot be timed in
place; instead each phase is compiled and timed as its own jitted function
on the same state — the same isolation the reference gets from its
MPI_Wtime spans.  Cross-phase fusion savings make the sum of phases an
upper bound on the fused step (both numbers are reported).

Usage (one JAX process, real chip):
    from fesom2_tpu.utils.profiling import profile_pi_phases
    table = profile_pi_phases(n_refine=2, dtype=jnp.float32)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _barrier(out):
    """Hard completion barrier: a host transfer of a reduction of one
    output leaf.  On the remote (axon) TPU backend block_until_ready can
    return before execution finishes (see bench.py); device execution is
    in-order, so draining one post-queued scalar read drains everything."""
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
            float(jnp.asarray(leaf).astype(jnp.float32).sum())
            return


def _time_fn(fn, args, n=5):
    out = fn(*args)
    _barrier(out)
    out = fn(*args)                    # second call: caches warm
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / n


def profile_pi_phases(n_refine: int = 0, dtype=jnp.float64, n: int = 5,
                      parity: str = "ci", verbose: bool = True):
    """Build the pi coupled model and time each step phase in isolation.

    Returns {phase: sec/step} including 'coupled_total' (the fused step)
    and 'sum_of_phases'."""
    from ..model import (setup_pi_model, pi_initial_state,
                         pi_coupled_step_fn)
    from ..core import eos, dynamics, ssh, ale
    from ..core.state import zero_forcing
    from ..ice import step as ice_step_mod
    from ..ice import coupling as ice_cpl
    from ..ice.state import zero_ice_forcing
    from .. import model as model_mod

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from ..forcing.atmos import atm_window
        model, atm = setup_pi_model(dtype=dtype, n_refine=n_refine,
                                    parity=parity)
        state, ice = pi_initial_state(model, dtype=dtype)
        # window the preloaded forcing like bench.py: the full-year series
        # is multi-GB of HBM at CORE2+ sizes (rematerialization pressure)
        atm = atm_window(atm, 0.0, 25 * model.cfg.dt)
        forcing = zero_forcing(model.mesh, dtype)
        ice_forcing = zero_ice_forcing(model.mesh, dtype)
    cfg = model.cfg
    S = model.statics()
    step = pi_coupled_step_fn(model, atm)

    # advance a few steps so the state is dynamically active
    for k in range(2):
        state, ice, forcing = step(state, ice, jnp.asarray(k))
    jax.block_until_ready(state.eta)

    bind = model_mod._statics_binder(S)
    Sb = bind(state.eta)

    def jphase(f):
        jf = jax.jit(f)
        return lambda *a: jf(*a)

    results = {}

    # --- full coupled step -------------------------------------------------
    t0 = _time_fn(lambda k: step(state, ice, k), (jnp.asarray(5),), n)
    results["coupled_total"] = t0

    # --- ocean-only step ----------------------------------------------------
    ocean_impl = model.step_impl()
    oc = jphase(lambda st, fo, SS: ocean_impl(st, fo, None, SS))
    results["ocean_total"] = _time_fn(oc, (state, forcing, Sb), n)
    results["ice_plus_forcing"] = max(results["coupled_total"]
                                      - results["ocean_total"], 0.0)

    # --- ocean phases (ref rtime table: press/mix, dyn, ssh, tracer) -------
    dref = S["density_ref"]

    def ph_pressure(st, SS):
        st = eos.pressure_bv(st, SS["mesh"], cfg, SS["density_ref"])
        return dynamics.pressure_force(st, SS["mesh"], cfg)
    results["eos_pressure"] = _time_fn(jphase(ph_pressure), (state, Sb), n)

    if cfg.dyn.mix_scheme.upper() == "KPP":
        from ..core.mixing import kpp as kpp_mixing

        def ph_mix(st, fo, SS):
            return kpp_mixing.oce_mixing_kpp(st, SS["mesh"], cfg, fo)
    else:
        from ..core.mixing import pp as pp_mixing

        def ph_mix(st, fo, SS):
            return pp_mixing.oce_mixing_pp(st, SS["mesh"], cfg)
    results["mixing"] = _time_fn(jphase(ph_mix), (state, forcing, Sb), n)

    def ph_momentum(st, fo, SS):
        mesh = SS["mesh"]
        st, u_rhs, v_rhs = dynamics.compute_vel_rhs(st, mesh, fo, cfg)
        st, u_rhs, v_rhs = dynamics.viscosity_filter(st, mesh, cfg,
                                                     u_rhs, v_rhs)
        u_rhs, v_rhs = dynamics.impl_vert_visc(st, mesh, cfg, fo,
                                               u_rhs, v_rhs)
        return u_rhs, v_rhs
    results["momentum"] = _time_fn(jphase(ph_momentum),
                                   (state, forcing, Sb), n)

    def ph_ssh(st, fo, SS):
        mesh = SS["mesh"]
        _, u_rhs, v_rhs = dynamics.compute_vel_rhs(st, mesh, fo, cfg)
        rhs = ssh.compute_ssh_rhs(st, mesh, cfg, fo, u_rhs, v_rhs)
        if SS["dense_inv"] is not None:
            d_eta, it, res = ssh.solve_ssh_dense(st, mesh, cfg,
                                                 SS["dense_inv"], rhs)
        else:
            pc = SS["block_pc"] if SS["block_pc"] is not None \
                else SS["diag_inv"]
            d_eta, it, res = ssh.solve_ssh(st, mesh, cfg, pc, rhs,
                                           ring=SS["ssh_ring"],
                                           x0=st.d_eta)
        return d_eta, it
    # warm-start the profiled solve like real stepping does: one priming
    # solve feeds its d_eta back as x0 (state.d_eta is zeros here, and a
    # cold-start solve runs more CG iterations than steady stepping)
    import dataclasses as _dc
    d0, _ = jphase(ph_ssh)(state, forcing, Sb)
    state_warm = _dc.replace(state, d_eta=d0)
    ssh_with_mom = _time_fn(jphase(ph_ssh), (state_warm, forcing, Sb), n)

    # subtract the momentum-rhs prelude cost
    def ph_velrhs(st, fo, SS):
        _, u_rhs, v_rhs = dynamics.compute_vel_rhs(st, SS["mesh"], fo, cfg)
        return u_rhs, v_rhs
    velrhs = _time_fn(jphase(ph_velrhs), (state, forcing, Sb), n)
    results["ssh_solve"] = max(ssh_with_mom - velrhs, 0.0)

    def ph_wvel(st, fo, SS):
        return ale.vert_vel_ale(st, SS["mesh"], cfg, fo).w
    results["vert_vel"] = _time_fn(jphase(ph_wvel), (state, forcing, Sb), n)

    def ph_tracer(st, fo, SS):
        return model_mod.solve_tracers(st, SS["mesh"], cfg, SS["st"], fo,
                                       0.0 if cfg.ale.which_ALE == "linfs"
                                       else 1.0).tr
    results["tracers"] = _time_fn(jphase(ph_tracer), (state, forcing, Sb), n)

    # --- ice phases ----------------------------------------------------------
    if cfg.run.use_ice:
        surf = ice_cpl.ocean2ice(state, model.mesh)
        use_virt_salt = cfg.ale.which_ALE == "linfs"

        def ph_ice(st_ice, SS):
            return ice_step_mod.ice_timestep(
                st_ice, SS["mesh"], ice_forcing, surf, cfg, use_virt_salt,
                sub=SS["ice_sub"])
        results["ice_total"] = _time_fn(jphase(ph_ice), (ice, Sb), n)

        from ..ice.evp import ice_dynamics

        def ph_evp(st_ice, SS):
            return ice_dynamics(st_ice, SS["mesh"], ice_forcing, surf, cfg,
                                sub=SS["ice_sub"]).u_ice
        results["ice_evp"] = _time_fn(jphase(ph_evp), (ice, Sb), n)

    results["sum_of_phases"] = sum(
        v for k, v in results.items()
        if k in ("eos_pressure", "mixing", "momentum", "ssh_solve",
                 "vert_vel", "tracers", "ice_total"))
    if verbose:
        for k, v in results.items():
            print(f"  {k:18s}: {v * 1e3:9.2f} ms")
    return results
