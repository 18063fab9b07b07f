"""Equation of state, hydrostatic pressure, Brunt-Vaisala frequency, MLD.

Reference: ``src/oce_ale_pressure_bv.F90`` — densityJM_components (:2589-2654),
density_linear (:2989-3019), init_ref_density (:3024-3069), pressure_bv
(:106-370), sw_alpha_beta (:2736-2821).
"""
from __future__ import annotations

from dataclasses import replace
from typing import Tuple

import jax.numpy as jnp

from ..constants import g, density_0
from ..mesh import MeshTables
from .state import OceanState

# Jackett & McDougall (1992) coefficients (ref :2605-2636)
_JM = dict(
    a0=19092.56, at=209.8925, at2=-3.041638, at3=-1.852732e-3, at4=-1.361629e-5,
    as_=104.4077, ast=-6.500517, ast2=0.1553190, ast3=2.326469e-4,
    ass=-5.587545, asst=0.7390729, asst2=-1.909078e-2,
    ap=-4.721788e-1, apt=-1.028859e-2, apt2=2.512549e-4, apt3=5.939910e-7,
    aps=1.571896e-2, apst=2.598241e-4, apst2=-7.267926e-6, apss=-2.042967e-3,
    ap2=1.045941e-5, ap2t=-5.782165e-10, ap2t2=1.296821e-7,
    ap2s=-2.595994e-7, ap2st=-1.248266e-9, ap2st2=-3.508914e-9,
    b0=999.842594, bt=6.793952e-2, bt2=-9.095290e-3, bt3=1.001685e-4,
    bt4=-1.120083e-6, bt5=6.536332e-9,
    bs=0.824493, bst=-4.08990e-3, bst2=7.64380e-5, bst3=-8.24670e-7,
    bst4=5.38750e-9, bss=-5.72466e-3, bsst=1.02270e-4, bsst2=-1.65460e-6,
    bss2=4.8314e-4,
)


def density_jm_components(t, s):
    """Split-form JM EoS: returns (bulk_0, bulk_pz, bulk_pz2, rhopot)."""
    J = _JM
    s_sqrt = jnp.sqrt(jnp.maximum(s, 0.0))
    bulk_0 = (J["a0"] + t * (J["at"] + t * (J["at2"] + t * (J["at3"] + t * J["at4"])))
              + s * (J["as_"] + t * (J["ast"] + t * (J["ast2"] + t * J["ast3"]))
                     + s_sqrt * (J["ass"] + t * (J["asst"] + t * J["asst2"]))))
    bulk_pz = (J["ap"] + t * (J["apt"] + t * (J["apt2"] + t * J["apt3"]))
               + s * (J["aps"] + t * (J["apst"] + t * J["apst2"]) + s_sqrt * J["apss"]))
    bulk_pz2 = (J["ap2"] + t * (J["ap2t"] + t * J["ap2t2"])
                + s * (J["ap2s"] + t * (J["ap2st"] + t * J["ap2st2"])))
    rhopot = (J["b0"] + t * (J["bt"] + t * (J["bt2"] + t * (J["bt3"] + t * (J["bt4"] + t * J["bt5"]))))
              + s * (J["bs"] + t * (J["bst"] + t * (J["bst2"] + t * (J["bst3"] + t * J["bst4"])))
                     + s_sqrt * (J["bss"] + t * (J["bsst"] + t * J["bsst2"]))
                     + s * J["bss2"]))
    return bulk_0, bulk_pz, bulk_pz2, rhopot


def density_linear_components(t, s, toy_soufflet: bool):
    """Linear EoS split form (ref density_linear :2989-3019): bulk=1, p-terms 0."""
    one = jnp.ones_like(t)
    if toy_soufflet:
        rho = density_0 - 0.00025 * (t - 10.0) * density_0
    else:
        rho = density_0 + 0.8 * (s - 34.0) - 0.2 * (t - 20.0)
    return one, jnp.zeros_like(t), jnp.zeros_like(t), rho


def eos_components(t, s, state_equation: int, toy_soufflet: bool = False):
    if state_equation == 0:
        return density_linear_components(t, s, toy_soufflet)
    return density_jm_components(t, s)


def reference_density(mesh: MeshTables, Z_3d, state_equation: int,
                      ref_T: float = 2.0, ref_S: float = 34.0,
                      toy_soufflet: bool = False):
    """density_ref(nz, node) (ref init_ref_density :3024-3069).

    The reference ALWAYS evaluates the Jackett-McDougall profile at
    (density_ref_T, density_ref_S) regardless of state_equation — the profile
    is horizontally uniform per level so it cancels in the PGF.
    """
    t = jnp.full_like(Z_3d, ref_T)
    s = jnp.full_like(Z_3d, ref_S)
    b0, bpz, bpz2, rhopot = density_jm_components(t, s)
    z = jnp.minimum(Z_3d, 0.0)
    # NOTE (ref :3050): init_ref_density uses rho = b0 + z*bpz + z*bpz2 (not
    # the usual b0 + z*(bpz + z*bpz2)); we reproduce it for parity.
    rho = b0 + z * bpz + z * bpz2
    return rho * rhopot / (rho + 0.1 * z)


def pressure_bv(state: OceanState, mesh: MeshTables, cfg, density_ref) -> OceanState:
    """EoS + hydrostatic pressure + N^2 + MLD (ref pressure_bv :106-370).

    Column-local; fully vectorised over nodes.  `density_ref` is [nl-1, N].
    """
    t = state.tr[0]
    s = state.tr[1]
    Z3 = state.Z_3d                   # [nl-1, N]
    zb3 = state.zbar_3d               # [nl, N]
    se = cfg.dyn.state_equation
    toy = cfg.run.toy_ocean and cfg.run.which_toy == "soufflet"
    sef = 1.0 if se == 1 else 0.0

    b0, bpz, bpz2, rhopot = eos_components(t, s, se, toy)
    rho = b0 + Z3 * (bpz + Z3 * bpz2)
    rho = rho * rhopot / (rho + 0.1 * Z3 * sef) - density_ref   # [nl-1, N]
    rho = jnp.where(mesh.node_layer_mask, rho, 0.0)

    # surface row per column: 0 in open ocean, ulevels-1 under a cavity;
    # without cavities ulevels==1 everywhere, so the dynamic row gather
    # reduces to a static slice (cfg.run.use_cavity is a compile-time flag)
    uln0 = (mesh.ulevels_node - 1).astype(jnp.int32)
    lay3 = jnp.arange(mesh.nl - 1)[:, None]
    if cfg.run.use_cavity:
        top = lambda a: jnp.take_along_axis(a, uln0[None, :], 0)[0]
    else:
        top = lambda a: a[0]

    # buoyancy difference vs surface (for KPP bldepth, ref :222-231):
    # surface water brought adiabatically to the local depth
    rho_srf = top(b0)[None, :] + Z3 * (top(bpz)[None, :]
                                       + Z3 * top(bpz2)[None, :])
    rho_srf = rho_srf * top(rhopot)[None, :] / (rho_srf + 0.1 * Z3 * sef)
    rho_full = rho + density_ref
    dbsfc_lay = -g * (rho_srf - rho_full) / jnp.where(rho_full == 0, 1.0, rho_full)
    dbsfc_lay = jnp.where(mesh.node_layer_mask, dbsfc_lay, 0.0)
    nln_ = mesh.nlevels_node
    lev_ = jnp.arange(mesh.nl)[:, None]
    dbsfc = jnp.concatenate([dbsfc_lay, dbsfc_lay[-1:]], 0)[:mesh.nl]
    bot_db = jnp.take_along_axis(dbsfc, (nln_ - 2)[None, :].astype(jnp.int32), 0)
    dbsfc = jnp.where(lev_ == (nln_ - 1)[None, :], bot_db, dbsfc)
    dbsfc = jnp.where(lev_ <= (nln_ - 1)[None, :], dbsfc, 0.0)

    # hydrostatic pressure at mid-levels (linfs / cavity path, ref :269-293)
    # hpressure(nzmin) = -Z(nzmin)*rho(nzmin)*g ;
    # hpressure(k) = hp(k-1) + g/2*(rho(k-1)*h(k-1)+rho(k)*h(k))
    h = state.hnode
    incr = 0.5 * g * (jnp.roll(rho * h, 1, axis=0) + rho * h)
    incr = jnp.where(lay3 <= uln0[None, :], 0.0, incr)
    hp = (-top(Z3) * top(rho) * g)[None, :] + jnp.cumsum(incr, axis=0)
    hp = jnp.where(mesh.node_layer_mask, hp, 0.0)

    # Brunt-Vaisala frequency on interfaces (ref :321-333)
    # bulk at interface depth zbar(nz) with coefficients from layers nz-1, nz
    # interfaces 2..nl-1 (1-based) = index 1..nl-2 of the [nl] axis
    zbi = zb3[1:-1]                                 # [nl-2, N]
    bu = b0[:-1] + zbi * (bpz[:-1] + zbi * bpz2[:-1])
    bd = b0[1:] + zbi * (bpz[1:] + zbi * bpz2[1:])
    rho_up = bu * rhopot[:-1] / (bu + 0.1 * zbi * sef)
    rho_dn = bd * rhopot[1:] / (bd + 0.1 * zbi * sef)
    dz_inv = 1.0 / (Z3[:-1] - Z3[1:])               # [nl-2, N]
    bv_int = -g * dz_inv * (rho_up - rho_dn) / density_0
    bvfreq = jnp.zeros_like(state.bvfreq)
    bvfreq = bvfreq.at[1:-1].set(bv_int)
    # copy boundary values (ref :364-365): surface interface (uln-1) <-
    # first interior, bottom interface nzmax <- nzmax-1 (per column)
    nln = mesh.nlevels_node
    lev = jnp.arange(mesh.nl)[:, None]
    srf_val = bvfreq[1:2] if not cfg.run.use_cavity else \
        jnp.take_along_axis(bvfreq, (uln0 + 1)[None, :], axis=0)
    bvfreq = jnp.where(lev == uln0[None, :], srf_val, bvfreq)
    bot_val = jnp.take_along_axis(bvfreq, (nln - 2)[None, :].astype(jnp.int32), axis=0)
    bvfreq = jnp.where(lev == (nln - 1)[None, :], bot_val, bvfreq)
    bvfreq = jnp.where((lev <= (nln - 1)[None, :]) & (lev >= uln0[None, :]),
                       bvfreq, 0.0)

    # MLD2 (Levitus sigma criterion) — simplified: shallowest level where
    # rhopot(nz)-rhopot(surface) > 0.125 (ref :340-358)
    sig_crit = 0.125
    exceed = (rhopot - top(rhopot)[None, :]) > sig_crit
    exceed = jnp.where(mesh.node_layer_mask, exceed, True)
    exceed = jnp.where(lay3 <= uln0[None, :], False, exceed)
    idx = jnp.argmax(exceed, axis=0)                 # first True
    idx = jnp.maximum(idx, uln0 + 1)
    mld2 = jnp.take_along_axis(Z3, idx[None, :], axis=0)[0]

    return replace(state, density_m_rho0=rho, hpressure=hp, bvfreq=bvfreq,
                   dbsfc=dbsfc, mld2=mld2)


def sw_alpha_beta(t, s, Z_3d):
    """Thermal expansion / haline contraction coefficients (ref :2736-2821).

    Computes alpha = -1/rho drho/dT and beta = 1/rho drho/dS (per layer, node)
    following the McDougall (1987) polynomial used by the reference.
    """
    t1 = t * 1.00024
    s1 = s
    p1 = jnp.abs(Z_3d)
    t1_2, p1_2 = t1 * t1, p1 * p1
    t1_3, p1_3 = t1_2 * t1, p1_2 * p1
    t1_4 = t1_3 * t1
    s35 = s1 - 35.0
    s35_2 = s35 * s35
    beta = (0.785567e-3 - 0.301985e-5 * t1 + 0.555579e-7 * t1_2
            - 0.415613e-9 * t1_3
            + s35 * (-0.356603e-6 + 0.788212e-8 * t1
                     + 0.408195e-10 * p1 - 0.602281e-15 * p1_2)
            + s35_2 * 0.515032e-8
            + p1 * (-0.121555e-7 + 0.192867e-9 * t1 - 0.213127e-11 * t1_2)
            + p1_2 * (0.176621e-12 - 0.175379e-14 * t1)
            + p1_3 * 0.121551e-17)
    a_over_b = (0.665157e-1 + 0.170907e-1 * t1 - 0.203814e-3 * t1_2
                + 0.298357e-5 * t1_3 - 0.255019e-7 * t1_4
                + s35 * (0.378110e-2 - 0.846960e-4 * t1
                         - 0.164759e-6 * p1 - 0.251520e-11 * p1_2)
                + s35_2 * (-0.678662e-5)
                + p1 * (0.380374e-4 - 0.933746e-6 * t1 + 0.791325e-8 * t1_2)
                + p1_2 * t1_2 * 0.512857e-12
                - p1_3 * 0.302285e-13)
    alpha = a_over_b * beta
    return alpha, beta
