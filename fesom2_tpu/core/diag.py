"""Per-step diagnostics: global norms table + blowup detection.

Reference: ``src/write_step_info.F90`` — write_step_info :14-219 (global
min/max/volume-int of all prognostic fields every logfile_outfreq steps),
check_blowup :220-504 (NaN / out-of-range scan of eta, velocities, T/S, ice
with post-mortem dump + abort).  On TPU these are cheap jitted reductions.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..mesh import MeshTables
from .state import OceanState


def step_info(state: OceanState, mesh: MeshTables, ice=None) -> Dict[str, jnp.ndarray]:
    """Global min/max/mean table (jit-compatible; returns device scalars)."""
    nmask = mesh.node_layer_mask
    area = mesh.area[0]
    asum = jnp.sum(area)

    def nstat(x, mask=None):
        if mask is None:
            return (x.min(), x.max())
        big = jnp.asarray(1e30, x.dtype)
        return (jnp.where(mask, x, big).min(), jnp.where(mask, x, -big).max())

    out = {}
    out["eta_min"], out["eta_max"] = nstat(state.eta)
    out["eta_int"] = jnp.sum(state.eta * area) / asum
    out["T_min"], out["T_max"] = nstat(state.tr[0], nmask)
    out["S_min"], out["S_max"] = nstat(state.tr[1], nmask)
    out["u_max"] = jnp.abs(state.u).max()
    out["v_max"] = jnp.abs(state.v).max()
    out["w_max"] = jnp.abs(state.w).max()
    out["cfl_z_max"] = state.cfl_z.max()
    if ice is not None:
        out["aice_max"] = ice.a_ice.max()
        out["hice_max"] = ice.m_ice.max()
        out["uice_max"] = jnp.abs(ice.u_ice).max()
    return out


def check_blowup(state: OceanState, mesh: MeshTables, ice=None,
                 ice_sub=None):
    """Return a scalar flag (0 ok / 1 blowup) following the reference ranges
    (check_blowup :220-504): |eta|<10, |u|,|v|<5(+finite), T in [-5,60],
    S in [0,60], finite W; ice fields finite.

    ice_sub: the EVP polar-cap subdomain (ice/subdomain.py) when the run
    restricts the EVP subcycling — ice advected outside the cap would
    silently stop moving, so a_ice > 0.01 at any node outside
    ``ice_sub.node_mask`` is flagged as a blowup-grade configuration
    error (the cap must be rebuilt with more margin)."""
    nmask = mesh.node_layer_mask
    bad = jnp.zeros((), jnp.int32)

    def flag(cond):
        return jnp.any(cond).astype(jnp.int32)

    bad = bad | flag(~jnp.isfinite(state.eta)) | flag(jnp.abs(state.eta) > 10.0)
    bad = bad | flag(~jnp.isfinite(state.u)) | flag(jnp.abs(state.u) > 5.0)
    bad = bad | flag(~jnp.isfinite(state.v)) | flag(jnp.abs(state.v) > 5.0)
    bad = bad | flag(~jnp.isfinite(state.w))
    T = jnp.where(nmask, state.tr[0], 0.0)
    S = jnp.where(nmask, state.tr[1], 35.0)
    bad = bad | flag(~jnp.isfinite(T)) | flag(T < -5.0) | flag(T > 60.0)
    bad = bad | flag(~jnp.isfinite(S)) | flag(S < 0.0) | flag(S > 60.0)
    if ice is not None:
        bad = bad | flag(~jnp.isfinite(ice.m_ice)) | flag(~jnp.isfinite(ice.u_ice))
        if ice_sub is not None:
            # EVP-subdomain escape guard (ice/subdomain.py docstring
            # contract): dynamics are frozen outside the cap, so ice there
            # means the cap was chosen too tight
            bad = bad | flag((ice.a_ice > 0.01) & ~ice_sub.node_mask)
    return bad


def format_step_info(info: Dict, step: int) -> str:
    parts = [f"step {step:7d}"]
    for k, v in info.items():
        parts.append(f"{k}={float(v):+.6e}")
    return " | ".join(parts)
