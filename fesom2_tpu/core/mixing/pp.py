"""Pacanowski & Philander (1981) Richardson-number mixing + convection hooks.

Reference: ``src/oce_ale_mixing_pp.F90:2-88`` (oce_mixing_pp) and
``src/oce_mo_conv.F90:4-104`` (mo_convect; Monin-Obukhov part optional).
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ...mesh import MeshTables
from ..state import OceanState


def oce_mixing_pp(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """Av = mix_coeff_PP*<f^2>/3 + A_ver;  Kv = mix_coeff_PP*f^3 + K_ver,
    f = shear/(shear + 5 max(N^2,0) + 1e-14)."""
    mix_coeff_PP = 0.01  # o_PARAM default (oce_modules.F90:24)
    nl = mesh.nl
    Z3 = state.Z_3d
    dz = Z3[:-1] - Z3[1:]
    dz_inv = 1.0 / jnp.where(dz == 0, 1.0, dz)          # [nl-2, N]
    du = (state.unode[:-1] - state.unode[1:]) * dz_inv
    dv = (state.vnode[:-1] - state.vnode[1:]) * dz_inv
    shear = du * du + dv * dv                            # interfaces 1..nl-2
    f = shear / (shear + 5.0 * jnp.maximum(state.bvfreq[1:-1], 0.0) + 1.0e-14)
    fK = jnp.zeros_like(state.Kv).at[1:-1].set(f)
    # interface active: 1..nln-2 (ref loops nz=2..nzmax-1, 1-based)
    lev = jnp.arange(nl)[:, None]
    imask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
    fK = jnp.where(imask, fK, 0.0)

    # Av on elements from nodal f^2 (ref :48-57)
    fe = jnp.take(fK, mesh.elem_nodes, axis=-1)          # [nl, E, 3]
    emask = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
    Av = jnp.where(emask, mix_coeff_PP * (fe ** 2).mean(-1) + cfg.dyn.A_ver, 0.0)
    Kv = jnp.where(imask, mix_coeff_PP * fK ** 3 + cfg.tra.K_ver, 0.0)
    return replace(state, Av=Av, Kv=Kv)


def mo_convect(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """Instability/wind mixing enhancements (ref oce_mo_conv.F90:60-104).

    Monin-Obukhov part (use_momix) not yet implemented (needs ice fields).
    """
    t = cfg.tra
    nl = mesh.nl
    lev = jnp.arange(nl)[:, None]
    Kv = state.Kv
    Av = state.Av
    if t.use_instabmix:
        imask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
        unstable = state.bvfreq < 0.0
        Kv = jnp.where(imask & unstable, jnp.maximum(Kv, t.instabmix_kv), Kv)
        une = jnp.take(unstable, mesh.elem_nodes, axis=-1).any(-1)
        emask = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
        Av = jnp.where(emask & une, jnp.maximum(Av, t.instabmix_kv), Av)
    if t.use_windmix:
        wmask = (lev >= 1) & (lev <= t.windmix_nl)
        nmask = (lev >= 1) & (lev <= (mesh.nlevels_node - 2)[None, :])
        emask2 = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
        Kv = jnp.where(wmask & nmask, jnp.maximum(Kv, t.windmix_kv), Kv)
        Av = jnp.where(wmask & emask2, jnp.maximum(Av, t.windmix_kv), Av)
    return replace(state, Kv=Kv, Av=Av)
