"""Declarative mean-output streams (def_stream registry).

Reference: ``src/io_meandata.F90`` — stream registry def_stream{2D,3D}
(:938-1003), per-step accumulation update_means (:768), event-driven flush
with background-thread netCDF writes (output :798-922).

TPU-native design: accumulation is a jitted pytree update on device; the
flush pulls the accumulated means to host and appends a record to a per-
stream netCDF file on a background Python thread (the async_threads_cpp
equivalent — the writer never blocks the step loop).
"""
from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from .netcdf import write_dataset, read_vars
from ..utils.clock import Clock, event_triggered


@dataclass
class StreamDef:
    name: str
    extract: Callable            # (state, ice[, extra]) -> jnp array
    freq: int = 1
    unit: str = "d"              # y/m/d/h/s
    precision: str = "f8"        # f4 or f8
    comment: str = ""
    wants_extra: bool = False    # extract takes a third arg (e.g. icepack)


@dataclass
class _StreamBuf:
    sum: Optional[np.ndarray] = None
    count: int = 0
    records: List[np.ndarray] = field(default_factory=list)
    times: List[float] = field(default_factory=list)


class OutputStreams:
    """Accumulates per-stream means on device; flushes asynchronously."""

    def __init__(self, defs: List[StreamDef], result_path: str,
                 runid: str = "fesom", async_write: bool = True):
        self.defs = defs
        self.result_path = result_path
        self.runid = runid
        self.bufs: Dict[str, _StreamBuf] = {d.name: _StreamBuf() for d in defs}
        self._acc = None             # device pytree of sums
        self._counts = [0] * len(defs)
        self._init_fn = None         # jitted extract+copy / extract+add
        self._add_fn = None
        self.async_write = async_write
        self._threads: List[threading.Thread] = []
        os.makedirs(result_path, exist_ok=True)

    # -- accumulate (device side) -----------------------------------------
    def _extract_all(self, state, ice, extra):
        return [d.extract(state, ice, extra) if d.wants_extra
                else d.extract(state, ice) for d in self.defs]

    def update_means(self, state, ice=None, extra=None):
        # ONE jitted dispatch per step: extraction (slices/wheres) and the
        # running sums fuse into a single device program.  The jit outputs
        # are fresh buffers, so the accumulator never aliases state arrays
        # (required: the run loop donates state buffers into the next step).
        import jax
        if self._init_fn is None:
            self._init_fn = jax.jit(
                lambda st, ic, ex: [jnp.asarray(v) for v in
                                    self._extract_all(st, ic, ex)])
            self._add_fn = jax.jit(
                lambda acc, st, ic, ex: [a + v for a, v in
                                         zip(acc, self._extract_all(st, ic, ex))])
        if self._acc is None:
            self._acc = self._init_fn(state, ice, extra)
        else:
            self._acc = self._add_fn(self._acc, state, ice, extra)
        self._counts = [c + 1 for c in self._counts]

    # -- event-driven flush ------------------------------------------------
    def maybe_flush(self, clock_before: Clock, clock_after: Clock, step: int):
        for i, d in enumerate(self.defs):
            if event_triggered(d.unit, d.freq, clock_before, clock_after, step):
                self._flush_stream(i, clock_after)

    def _flush_stream(self, i: int, clock: Clock):
        d = self.defs[i]
        if self._acc is None or self._counts[i] == 0:
            return
        mean = np.asarray(self._acc[i]) / self._counts[i]
        if d.precision == "f4":
            mean = mean.astype(np.float32)
        buf = self.bufs[d.name]
        buf.records.append(mean)
        buf.times.append(clock.seconds_in_year)
        self._acc[i] = jnp.zeros_like(self._acc[i])
        self._counts[i] = 0
        path = os.path.join(self.result_path,
                            f"{d.name.strip()}.{self.runid}.{clock.yearnew}.nc")
        records = list(buf.records)
        times = list(buf.times)

        def write():
            arr = np.stack(records)
            dims = {"time": arr.shape[0]}
            dnames = ["time"]
            for k, s in enumerate(arr.shape[1:]):
                dims[f"d{k}"] = s
                dnames.append(f"d{k}")
            write_dataset(path, dims, {
                d.name.strip(): (tuple(dnames), arr),
                "time": (("time",), np.asarray(times)),
            }, attrs={"comment": d.comment})

        if self.async_write:
            t = threading.Thread(target=write, daemon=True)
            t.start()
            self._threads.append(t)
        else:
            write()

    def finalize(self):
        for t in self._threads:
            t.join()


def default_ocean_streams(mesh, fill_T=None, fill_S=None) -> List[StreamDef]:
    """The core subset of the reference's ~100 registered fields
    (``io_meandata.F90:94-537``); extended per-need.

    fill_T/fill_S [nl-1, N]: values written at below-bottom (dry) cells.
    The reference never touches dry tracer entries, so its output carries
    the initial climatology there (gen_ic3d fills full columns); our state
    keeps dry cells at 0 (masked-dense convention), so the tracer streams
    re-fill them for output parity — fcheck means are over ALL values."""
    import jax.numpy as jnp

    def tr_out(k, fill):
        if fill is None:
            return lambda s, i: s.tr[k]
        mask = mesh.node_layer_mask

        def f(s, i, _fill=fill, _k=k):
            return jnp.where(mask, s.tr[_k], _fill)
        return f

    return [
        StreamDef("sst", lambda s, i: s.tr[0, 0], comment="sea surface temperature"),
        StreamDef("sss", lambda s, i: s.tr[1, 0], comment="sea surface salinity"),
        StreamDef("ssh", lambda s, i: s.eta, comment="sea surface height"),
        StreamDef("temp", tr_out(0, fill_T), comment="potential temperature"),
        StreamDef("salt", tr_out(1, fill_S), comment="salinity"),
        StreamDef("u", lambda s, i: s.u, comment="zonal velocity (elements)"),
        StreamDef("v", lambda s, i: s.v, comment="meridional velocity (elements)"),
        StreamDef("w", lambda s, i: s.w, comment="vertical velocity"),
        StreamDef("MLD2", lambda s, i: s.mld2, comment="mixed layer depth (Levitus)"),
    ]


def default_ice_streams() -> List[StreamDef]:
    return [
        StreamDef("a_ice", lambda s, i: i.a_ice, comment="ice concentration"),
        StreamDef("m_ice", lambda s, i: i.m_ice, comment="ice thickness"),
        StreamDef("m_snow", lambda s, i: i.m_snow, comment="snow thickness"),
        StreamDef("uice", lambda s, i: i.u_ice, comment="ice velocity x"),
        StreamDef("vice", lambda s, i: i.v_ice, comment="ice velocity y"),
    ]


def default_icepack_streams(ipc=None) -> List[StreamDef]:
    """Category fields of the icepack path (the enabled entries of
    &nml_list_icepack, config/namelist.icepack:110-113); with an
    IcepackConfig whose aux tracers are on, the pond/age/FY/level fields
    (the commented 'pond_cesmn'/'iagen'/'FYn'... entries :121-136)."""
    import jax.numpy as jnp

    defs = [
        StreamDef("aicen", lambda s, i, p: p.aicen, wants_extra=True,
                  comment="category ice concentration"),
        StreamDef("vicen", lambda s, i, p: p.vicen, wants_extra=True,
                  comment="category ice volume per area"),
        StreamDef("vsnon", lambda s, i, p: p.vsnon, wants_extra=True,
                  comment="category snow volume per area"),
        StreamDef("Tsfcn", lambda s, i, p: p.Tsfcn, wants_extra=True,
                  comment="category surface temperature"),
    ]
    if ipc is None or not getattr(ipc, "has_aux", False):
        return defs

    def area_mean(idx):
        def f(s, i, p, _k=idx):
            a = p.aicen.sum(0)
            return jnp.where(a > 1e-11,
                             (p.aicen * p.ta[:, _k]).sum(0)
                             / jnp.maximum(a, 1e-11), 0.0)
        return f

    def vol_mean(idx):
        def f(s, i, p, _k=idx):
            v = p.vicen.sum(0)
            return jnp.where(v > 1e-11,
                             (p.vicen * p.tv[:, _k]).sum(0)
                             / jnp.maximum(v, 1e-11), 0.0)
        return f

    comments = {"apnd": "melt pond area fraction (of ice)",
                "hpnd": "melt pond depth",
                "FY": "first-year ice area fraction",
                "alvl": "level ice area fraction",
                "vlvl": "level ice volume fraction",
                "iage": "ice age [s]",
                "bgc_N": "skeletal-layer ice algae [mmol N/m^3]",
                "bgc_NO3": "skeletal-layer nitrate [mmol/m^3]",
                "bgc_Sil": "skeletal-layer silicate [mmol/m^3]"}
    for k, name in enumerate(ipc.area_tracers):
        if name.startswith("fsd"):
            continue          # per-bin fractions: summarized by fsdrad
        defs.append(StreamDef(name, area_mean(k), wants_extra=True,
                              comment=comments[name]))
    for k, name in enumerate(ipc.vol_tracers):
        defs.append(StreamDef(name, vol_mean(k), wants_extra=True,
                              comment=comments[name]))
    if getattr(ipc, "tr_fsd", False):
        from ..ice.icepack import fsd as fsd_mod

        def fsdrad(s, i, p):
            return fsd_mod.fsd_mean_radius(p.ta[:, ipc.fsd_slice],
                                           p.aicen, ipc.fsd_lims)

        defs.append(StreamDef("fsdrad", fsdrad, wants_extra=True,
                              comment="area-weighted mean floe radius [m]"))
    return defs
