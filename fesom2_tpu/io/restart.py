"""Checkpoint/restart: raw netCDF of all prognostic state.

Reference: ``src/io_restart.F90`` — variable set :80-160 (oce: eta_n, hbar,
ssh_rhs_old, UV, w/w_expl/w_impl, T/S by tracer id, hnode; ice: area, hice,
hsnow, uice, vice), write/read drivers :200-772.  Restarts are
bit-continuable: raw fields, no averaging; the ALE layer geometry is
recomputed on read (restart_thickness_ale, ``oce_ale.F90:998``).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

from .netcdf import write_dataset, read_vars
from ..core.state import OceanState


OCE_FIELDS = ["eta", "hbar", "hbar_old", "ssh_rhs_old", "d_eta",
              "d_eta_prev", "u", "v",
              "u_rhsAB", "v_rhsAB", "w", "w_e", "w_i", "tr", "tr_old",
              "hnode", "hnode_new", "uke", "uke_rhs",
              # persistent mixing memory: Monin-Obukhov mixing length is
              # relaxed in time (oce_mo_conv.F90), TKE/IDEMIX energies are
              # prognostic interface fields (gen_modules_cvmix_{tke,idemix})
              "mixlength", "tke", "iwe"]
ICE_FIELDS = ["u_ice", "v_ice", "m_ice", "a_ice", "m_snow",
              "sigma11", "sigma12", "sigma22", "t_skin",
              # aEVP persistent stability arrays (ice_maEVP.F90:611-660)
              "alpha_aevp", "beta_aevp"]
IPK_FIELDS = ["aicen", "vicen", "vsnon", "Tsfcn", "qin", "qsn"]


def write_restart(path: str, state: OceanState, ice=None, step: int = 0,
                  ipk=None):
    """Write a raw full-precision restart file (netCDF3)."""
    variables = {}
    dims = {}

    def add(name, arr):
        arr = np.asarray(arr)
        dnames = []
        for k, s in enumerate(arr.shape):
            dn = f"{name}_d{k}"
            dims[dn] = s
            dnames.append(dn)
        variables[name] = (tuple(dnames), arr)

    for f in OCE_FIELDS:
        add(f, getattr(state, f))
    add("step", np.asarray([int(state.step)]))
    if ice is not None:
        for f in ICE_FIELDS:
            add("ice_" + f, getattr(ice, f))
    if ipk is not None:
        for f in IPK_FIELDS:
            add("ipk_" + f, getattr(ipk, f))
        for f in ("ta", "tv"):        # optional aux-tracer stacks
            v = getattr(ipk, f, None)
            if v is not None and v.shape[1] > 0:
                add("ipk_" + f, v)
    write_dataset(path, dims, variables)


def read_restart(path: str, state: OceanState, ice=None, dtype=jnp.float64,
                 ipk=None, mesh=None, cfg=None):
    """Read a restart file into (state, ice[, ipk]) pytrees.

    With (mesh, cfg) given, the ALE layer geometry (helem, zbar_3d, Z_3d)
    is recomputed from the restored hnode — the restart_thickness_ale
    analog (``oce_ale.F90:998``), required for bit-continuation under
    zlevel/zstar."""
    names = OCE_FIELDS + ["step"]
    if ice is not None:
        names += ["ice_" + f for f in ICE_FIELDS]
    if ipk is not None:
        names += ["ipk_" + f for f in IPK_FIELDS]
        names += ["ipk_" + f for f in ("ta", "tv")
                  if getattr(ipk, f, None) is not None
                  and getattr(ipk, f).shape[1] > 0]
    data = read_vars(path, names, missing_ok=True)
    # tolerate fields absent from older restart files (e.g. d_eta, added for
    # the SSH warm start): they keep their allocated value (zeros), which
    # degrades the warm start to a cold start but stays resumable
    up = {f: jnp.asarray(data[f], dtype) for f in OCE_FIELDS if f in data}
    up["step"] = jnp.asarray(int(data["step"][0]), jnp.int32)
    state = dataclasses.replace(state, **up)
    if mesh is not None and cfg is not None \
            and cfg.ale.which_ALE != "linfs":
        from ..core.ale import update_thickness
        # update_thickness moves hnode_new -> hnode and rebuilds
        # helem/zbar_3d/Z_3d; feed it the restored hnode, then restore the
        # file's hnode_new (the two coincide at a step boundary anyway)
        geo = update_thickness(
            dataclasses.replace(state, hnode_new=state.hnode), mesh, cfg)
        state = dataclasses.replace(
            state, helem=geo.helem, zbar_3d=geo.zbar_3d, Z_3d=geo.Z_3d)
    if ice is not None:
        ice = dataclasses.replace(
            ice, **{f: jnp.asarray(data["ice_" + f], dtype)
                    for f in ICE_FIELDS if "ice_" + f in data})
    if ipk is not None:
        up = {f: jnp.asarray(data["ipk_" + f], dtype) for f in IPK_FIELDS}
        for f in ("ta", "tv"):
            if "ipk_" + f in data:
                up[f] = jnp.asarray(data["ipk_" + f], dtype)
        ipk = dataclasses.replace(ipk, **up)
        return state, ice, ipk
    return state, ice
