"""Run driver: setup -> time loop -> output/restart/diagnostics.

Reference: ``src/fvom_main.F90`` — staged setup :60-197, hot loop :199-268,
runtime accounting + "BENCHMARK RUNTIME" report :281-327.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .model import (Model, setup_soufflet_model, setup_pi_model,
                    pi_initial_state, pi_coupled_step_fn)
from .core.state import zero_forcing
from .core.diag import step_info, check_blowup, format_step_info
from .io.streams import OutputStreams, default_ocean_streams, default_ice_streams
from .io.restart import write_restart
from .utils.clock import Clock, write_clock_file


@dataclass
class RunTimers:
    """Per-phase wall-clock accounting (ref rtime_* + BENCHMARK RUNTIME)."""
    step: float = 0.0
    output: float = 0.0
    restart: float = 0.0
    total: float = 0.0
    n_steps: int = 0

    def report(self) -> str:
        lines = ["=== BENCHMARK RUNTIME ===",
                 f" steps               : {self.n_steps}",
                 f" runtime total [s]   : {self.total:.3f}",
                 f" runtime step  [s]   : {self.step:.3f}",
                 f" runtime output [s]  : {self.output:.3f}",
                 f" runtime restart [s] : {self.restart:.3f}"]
        if self.n_steps:
            lines.append(f" sec/step            : {self.step / self.n_steps:.4f}")
        return "\n".join(lines)


def run_pi(n_steps: int = 96, result_path: str = "./result_pi",
           dtype=jnp.float64, logfile_outfreq: int = 10,
           restart_every: Optional[int] = None, verbose: bool = True,
           use_icepack: bool = False, model_atm=None,
           icepack_opts: Optional[dict] = None, resume: bool = False,
           stream_defs=None):
    """Run the coupled global pi configuration for n_steps (CI analog).

    use_icepack: multi-category column physics (the test_pi_icepack CI
    setup analog).  icepack_opts: IcepackConfig overrides, e.g.
    {'tr_pond_cesm': True} for the namelist.icepack.cesm.ponds variant.
    model_atm: optional prebuilt (Model, AtmData) — the mkrun path builds
    these from a reference setup.yml.
    resume: continue from result_path/restart.nc + fesom.clock (the
    io_restart.F90:200-293 read path + runid.clock contract); n_steps is
    the TOTAL step count of the run, so the loop covers the remainder."""
    model, atm = model_atm if model_atm is not None \
        else setup_pi_model(dtype=dtype)
    state, ice = pi_initial_state(model, dtype=dtype)
    ipk = None
    if stream_defs is None:
        stream_defs = default_ocean_streams(model.mesh) \
            + default_ice_streams()
    if use_icepack:
        from .ice.icepack import IcepackConfig, init_icepack_state
        from .io.streams import default_icepack_streams
        model.cfg.run.use_icepack = True
        model.cfg.icepack = IcepackConfig(**(icepack_opts or {}))
        ipk = init_icepack_state(model.cfg.icepack, ice.a_ice, ice.m_ice,
                                 ice.m_snow, ice.t_skin, dtype=dtype)
        stream_defs += default_icepack_streams(model.cfg.icepack)
    os.makedirs(result_path, exist_ok=True)
    from .io.mesh_info import write_mesh_info
    write_mesh_info(result_path, model.mesh)   # ref fvom_main.F90 fresh runs
    # the loop never reuses a pre-step state -> donate buffers (halves
    # state HBM, skips output copies)
    step = pi_coupled_step_fn(model, atm, donate=True)
    clock = Clock(0.0, 1, 1948)
    k_start = 0
    if resume:
        from .io.restart import read_restart
        from .utils.clock import read_clock_file
        rpath = os.path.join(result_path, "restart.nc")
        cpath = os.path.join(result_path, "fesom.clock")
        loaded = read_restart(rpath, state, ice, dtype=dtype, ipk=ipk,
                              mesh=model.mesh, cfg=model.cfg)
        if ipk is not None:
            state, ice, ipk = loaded
        else:
            state, ice = loaded
        clock = read_clock_file(cpath)
        k_start = int(state.step)
        if verbose:
            print(f" --> resumed from {rpath} at step {k_start} "
                  f"(clock {clock.yearnew}-{clock.daynew})", flush=True)
    streams = OutputStreams(stream_defs, result_path)
    timers = RunTimers()
    t_all = time.perf_counter()
    dt = model.cfg.dt

    # multi-year runs: year-switching provider with background prefetch
    # (the forcing_provider_async_module analog at the year granularity)
    provider = None
    steps_per_year = None
    sbc = getattr(model, "sbc", None)
    if sbc is not None and n_steps - k_start > 0:
        from .forcing.atmos import SbcProvider
        steps_per_year = int(round(365 * 86400.0 / dt))
        # y_perpetual (&nam_sbc): one forcing year repeats forever — the
        # loaded series is reused, no provider needed (the k_off reset at
        # rollover re-aligns the year-relative time base)
        if (k_start + n_steps > steps_per_year
                and not getattr(sbc, "y_perpetual", False)):
            provider = SbcProvider(model.mesh, sbc, dtype)
            provider._cache[clock.yearnew] = atm
            provider.prefetch(clock.yearnew + 1)

    # the step closure's time base is seconds-since-year-start, so the
    # index passed to it is year-relative
    k_off = 0
    if steps_per_year is not None:
        k_off = (k_start // steps_per_year) * steps_per_year

    for k in range(k_start, n_steps):
        t0 = time.perf_counter()
        kk = jnp.asarray(k - k_off)
        if use_icepack:
            state, ice, ipk, oforc = step(state, ice, kk, ipk)
        else:
            state, ice, oforc = step(state, ice, kk)
        jax.block_until_ready(state.eta)
        timers.step += time.perf_counter() - t0
        timers.n_steps += 1
        clock_before = clock.copy()
        clock.advance(dt)
        if steps_per_year is not None \
                and clock.yearnew != clock_before.yearnew:
            # year rollover: re-align the year-relative step index; with a
            # provider, also swap in the prefetched year and rebuild the
            # step closure (same shapes -> warm XLA cache)
            k_off = k + 1
            if provider is not None:
                provider.evict(clock_before.yearnew)
                atm = provider.get(clock.yearnew)
                provider.prefetch(clock.yearnew + 1)
                step = pi_coupled_step_fn(model, atm, donate=True)
                streams.set_atm(atm)   # atm-backed streams follow the year
            if verbose:
                print(f" --> forcing year switched to {clock.yearnew}"
                      f"{' (perpetual)' if provider is None else ''}",
                      flush=True)

        t0 = time.perf_counter()
        streams.update_means(state, ice, ipk, oforc)
        streams.maybe_flush(clock_before, clock, k)
        timers.output += time.perf_counter() - t0

        # blowup scan EVERY step, independent of verbosity (the reference
        # scans per step: fvom_main.F90 loop -> write_step_info.F90:220);
        # the int() fetch doubles as the host sync already paid above
        if int(check_blowup(state, model.mesh, ice,
                            ice_sub=getattr(model, "ice_submesh",
                                            None))) != 0:
            blow_path = os.path.join(result_path, "blowup.nc")
            write_restart(blow_path, state, ice, step=k)
            raise RuntimeError(f"blowup detected at step {k + 1}; "
                               f"state dumped to {blow_path}")

        if verbose and (k + 1) % logfile_outfreq == 0:
            info = step_info(state, model.mesh, ice)
            print(format_step_info(info, k + 1), flush=True)
            if model.cfg.diag.ldiag_salt3D:
                from .core.diagnostics import salt3d_integral
                print(" total integral of salinity at timestep : %d %.10e"
                      % (k + 1, float(salt3d_integral(state, model.mesh))),
                      flush=True)

        if restart_every and (k + 1) % restart_every == 0:
            t0 = time.perf_counter()
            write_restart(os.path.join(result_path, "restart.nc"), state,
                          ice, k, ipk=ipk)
            write_clock_file(os.path.join(result_path, "fesom.clock"), clock)
            timers.restart += time.perf_counter() - t0

    streams.finalize()
    timers.total = time.perf_counter() - t_all
    if verbose:
        print(timers.report(), flush=True)
    return state, ice, timers


def run_soufflet(n_steps: int = 72, result_path: str = "./result_souf",
                 dtype=jnp.float64, logfile_outfreq: int = 10,
                 verbose: bool = True, model=None):
    """Run the soufflet channel (toy ocean, no ice, no external forcing)."""
    model = model if model is not None else setup_soufflet_model(dtype=dtype)
    state = model.initial_state(dtype=dtype)
    forcing = zero_forcing(model.mesh, dtype)
    step = model.step_fn()
    clock = Clock(0.0, 1, 1948)
    streams = OutputStreams(default_ocean_streams(model.mesh), result_path)
    timers = RunTimers()
    t_all = time.perf_counter()

    for k in range(n_steps):
        t0 = time.perf_counter()
        state = step(state, forcing)
        jax.block_until_ready(state.eta)
        timers.step += time.perf_counter() - t0
        timers.n_steps += 1
        clock_before = clock.copy()
        clock.advance(model.cfg.dt)
        streams.update_means(state, None)
        streams.maybe_flush(clock_before, clock, k)
        if verbose and (k + 1) % logfile_outfreq == 0:
            info = step_info(state, model.mesh)
            print(format_step_info(info, k + 1), flush=True)
    streams.finalize()
    timers.total = time.perf_counter() - t_all
    if verbose:
        print(timers.report(), flush=True)
    return state, timers


def _version_string() -> str:
    """Git SHA + dirty flag (ref fesom_version_info.F90 + CMake generation
    src/CMakeLists.txt:18-26)."""
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=here, capture_output=True, text=True,
                             timeout=5).stdout.strip()
        dirty = subprocess.run(["git", "status", "--porcelain"],
                               cwd=here, capture_output=True, text=True,
                               timeout=5).stdout.strip()
        return sha + ("-dirty" if dirty else "")
    except Exception:
        return "unknown"


def print_info():
    """--info output (ref info_module.F90:19, command_line_options.F90:16)."""
    import jax
    print(f"fesom2_tpu version: {_version_string()}")
    print(f"jax: {jax.__version__}")
    print(f"devices: {jax.devices()}")
    print("configs: pi (global ocean+ice, NCEP-1948 forcing), "
          "soufflet (baroclinic channel); pi options: --icepack")


def main():
    import argparse
    p = argparse.ArgumentParser(description="fesom2_tpu run driver")
    p.add_argument("--version", action="store_true")
    p.add_argument("--info", action="store_true")
    import sys
    if "--version" in sys.argv[1:]:
        print(_version_string())
        return
    if "--info" in sys.argv[1:]:
        print_info()
        return
    p.add_argument("config", choices=["pi", "soufflet"])
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--result", default="./result")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--icepack", action="store_true",
                   help="multi-category ice column physics (test_pi_icepack)")
    p.add_argument("--resume", action="store_true",
                   help="continue from <result>/restart.nc + fesom.clock")
    p.add_argument("--restart-every", type=int, default=None,
                   help="write restart.nc every N steps")
    args = p.parse_args()
    dtype = jnp.float32 if args.f32 else jnp.float64
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    if args.config == "pi":
        run_pi(args.steps, args.result, dtype, use_icepack=args.icepack,
               resume=args.resume, restart_every=args.restart_every)
    else:
        run_soufflet(args.steps, args.result, dtype)


if __name__ == "__main__":
    main()
