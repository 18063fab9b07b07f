"""Model state pytrees (replaces o_ARRAYS of ``src/oce_modules.F90:221-353``).

All arrays are dense ``[levels, entities]`` with inactive (below-bottom)
entries zero; the step function is a pure transition on this pytree.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import jax
import jax.numpy as jnp

from ..mesh import MeshTables


@jax.tree_util.register_dataclass
@dataclass
class OceanState:
    """Prognostic + persistent-diagnostic ocean state."""
    # velocities on elements [nl-1, E]
    u: jnp.ndarray
    v: jnp.ndarray
    # Adams-Bashforth memory of momentum rhs [nl-1, E] (UV_rhsAB)
    u_rhsAB: jnp.ndarray
    v_rhsAB: jnp.ndarray
    # elevation family [N]
    eta: jnp.ndarray          # eta_n
    hbar: jnp.ndarray
    hbar_old: jnp.ndarray
    ssh_rhs_old: jnp.ndarray
    # previous SSH increments [N]: CG warm start (the solution is smooth in
    # time; x0 = 2*d_eta(n-1) - d_eta(n-2), linear extrapolation, cuts the
    # Krylov iteration count further than the plain x0=d_eta(n-1) restart
    # at unchanged tolerance; the reference's pARMS solve always starts
    # from zero, psolve.c:152-221)
    d_eta: jnp.ndarray
    d_eta_prev: jnp.ndarray
    # tracers [ntr, nl-1, N]; AB memory
    tr: jnp.ndarray
    tr_old: jnp.ndarray
    # vertical velocity [nl, N]
    w: jnp.ndarray
    w_e: jnp.ndarray          # explicit split
    w_i: jnp.ndarray          # implicit split
    cfl_z: jnp.ndarray        # [nl, N]
    # ALE thicknesses
    hnode: jnp.ndarray        # [nl-1, N]
    hnode_new: jnp.ndarray    # [nl-1, N]
    helem: jnp.ndarray        # [nl-1, E]
    zbar_3d: jnp.ndarray      # [nl, N] actual interface depths
    Z_3d: jnp.ndarray         # [nl-1, N] actual mid depths
    # mixing coefficients
    Av: jnp.ndarray           # [nl, E]
    Kv: jnp.ndarray           # [nl, N]
    # salinity diffusivity when KPP double diffusion splits T/S
    # (oce_ale_mixing_kpp.F90 ddmix); mirrors Kv otherwise
    Kv_s: jnp.ndarray         # [nl, N]
    # Monin-Obukhov mixed-layer length (TB04), relaxed in time [N]
    mixlength: jnp.ndarray
    # turbulent kinetic energy at interfaces (cvmix_TKE closure) [nl, N]
    tke: jnp.ndarray
    # internal wave energy at interfaces (cvmix_IDEMIX) [nl, N], its
    # dissipation (positive TKE source) and alpha_c coefficient
    iwe: jnp.ndarray
    iwe_diss: jnp.ndarray
    iwe_alpha_c: jnp.ndarray
    # KPP nonlocal transport coefficient min(ghats*blmc,1) at interfaces
    kpp_nonloc: jnp.ndarray   # [nl, N]
    # diagnostics updated in pressure_bv
    density_m_rho0: jnp.ndarray   # [nl-1, N] in-situ density - reference
    hpressure: jnp.ndarray        # [nl-1, N]
    bvfreq: jnp.ndarray           # [nl, N]
    dbsfc: jnp.ndarray            # [nl, N] buoyancy difference vs surface (KPP)
    mld1: jnp.ndarray             # [N]
    mld2: jnp.ndarray             # [N]
    # PGF on elements [nl-1, E]
    pgf_x: jnp.ndarray
    pgf_y: jnp.ndarray
    # node velocities (diagnostic, used by PP mixing / ice coupling)
    unode: jnp.ndarray        # [nl-1, N]
    vnode: jnp.ndarray        # [nl-1, N]
    # unresolved kinetic energy for dynamic backscatter, visc_option=8
    # (uke/uke_rhs of oce_modules.F90:228-229); zeros unless option 8 runs
    uke: jnp.ndarray          # [nl-1, E]
    uke_rhs: jnp.ndarray      # [nl-1, E]
    # GM (Ferrari 2010) bolus velocities + diffusivity diagnostics for the
    # fer_UV/fer_Wvel/fer_K/fer_C output streams (io_meandata.F90 'bolus_u'
    # etc.); size-0 along the entity axis unless allocated with with_gm
    fer_u: jnp.ndarray        # [nl-1, E] or [nl-1, 0]
    fer_v: jnp.ndarray        # [nl-1, E] or [nl-1, 0]
    fer_w: jnp.ndarray        # [nl, N] or [nl, 0]
    fer_K3: jnp.ndarray       # [nl, N] or [nl, 0]
    fer_c: jnp.ndarray        # [N] or [0]
    # discrete variance decay (Klingbeil et al. 2014) per tracer, split
    # into horizontal/vertical advection parts (ref tr_dvd_horiz/_vert,
    # gen_modules_diag.F90:744-838); [n_dvd, nl-1, N], n_dvd=0 unless
    # ldiag_DVD
    dvd_h: jnp.ndarray
    dvd_v: jnp.ndarray
    # step counter (device scalar; drives first-step AB switch)
    step: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass
class Forcing:
    """Surface forcing fields (subset of g_forcing_arrays / stress_surf etc.)."""
    stress_x: jnp.ndarray     # [E] surface wind stress on elements
    stress_y: jnp.ndarray     # [E]
    heat_flux: jnp.ndarray    # [N] positive up (out of ocean)
    water_flux: jnp.ndarray   # [N] positive up
    virtual_salt: jnp.ndarray # [N]
    relax_salt: jnp.ndarray   # [N]
    real_salt_flux: jnp.ndarray  # [N]
    # atm->ocean stress at nodes + ice fields, for Monin-Obukhov (TB04)
    # mixing (ref oce_mo_conv.F90:36-38); zeros when uncoupled
    stress_atm_x: jnp.ndarray # [N]
    stress_atm_y: jnp.ndarray # [N]
    u_ice: jnp.ndarray        # [N]
    v_ice: jnp.ndarray        # [N]
    a_ice: jnp.ndarray        # [N]
    thdgr: jnp.ndarray        # [N] thermodynamic ice growth rate (for SPP)
    # extra surface pressure terms (ref oce_ale_vel_rhs.F90:60-90)
    ssh_gp: jnp.ndarray       # [N] tidal potential [m^2/s^2]
    m_ice: jnp.ndarray        # [N] ice mass (floating-ice loading)
    m_snow: jnp.ndarray       # [N]
    press_air: jnp.ndarray    # [N] sea-level pressure [Pa]
    prec_rain: jnp.ndarray    # [N] liquid precipitation [m/s] (tracer 101 BC)


def allocate_state(mesh: MeshTables, n_tracers: int = 2,
                   dtype=jnp.float64, n_dvd: int = 0,
                   with_gm: bool = False) -> OceanState:
    nl, N, E = mesh.nl, mesh.n_nodes, mesh.n_elems
    zE = lambda *s: jnp.zeros(s, dtype)
    Eg, Ng = (E, N) if with_gm else (0, 0)
    return OceanState(
        u=zE(nl - 1, E), v=zE(nl - 1, E),
        u_rhsAB=zE(nl - 1, E), v_rhsAB=zE(nl - 1, E),
        eta=zE(N), hbar=zE(N), hbar_old=zE(N), ssh_rhs_old=zE(N),
        d_eta=zE(N), d_eta_prev=zE(N),
        tr=zE(n_tracers, nl - 1, N), tr_old=zE(n_tracers, nl - 1, N),
        w=zE(nl, N), w_e=zE(nl, N), w_i=zE(nl, N), cfl_z=zE(nl, N),
        hnode=zE(nl - 1, N), hnode_new=zE(nl - 1, N), helem=zE(nl - 1, E),
        zbar_3d=zE(nl, N), Z_3d=zE(nl - 1, N),
        Av=zE(nl, E), Kv=zE(nl, N), Kv_s=zE(nl, N), mixlength=zE(N),
        tke=zE(nl, N),
        iwe=zE(nl, N), iwe_diss=zE(nl, N), iwe_alpha_c=zE(nl, N),
        kpp_nonloc=zE(nl, N),
        density_m_rho0=zE(nl - 1, N), hpressure=zE(nl - 1, N),
        bvfreq=zE(nl, N), dbsfc=zE(nl, N), mld1=zE(N), mld2=zE(N),
        pgf_x=zE(nl - 1, E), pgf_y=zE(nl - 1, E),
        unode=zE(nl - 1, N), vnode=zE(nl - 1, N),
        uke=zE(nl - 1, E), uke_rhs=zE(nl - 1, E),
        fer_u=zE(nl - 1, Eg), fer_v=zE(nl - 1, Eg), fer_w=zE(nl, Ng),
        fer_K3=zE(nl, Ng), fer_c=zE(Ng),
        dvd_h=zE(n_dvd, nl - 1, N), dvd_v=zE(n_dvd, nl - 1, N),
        step=jnp.zeros((), jnp.int32),
    )


def zero_forcing(mesh: MeshTables, dtype=jnp.float64) -> Forcing:
    N, E = mesh.n_nodes, mesh.n_elems
    z = lambda *s: jnp.zeros(s, dtype)
    return Forcing(stress_x=z(E), stress_y=z(E), heat_flux=z(N),
                   water_flux=z(N), virtual_salt=z(N), relax_salt=z(N),
                   real_salt_flux=z(N), stress_atm_x=z(N), stress_atm_y=z(N),
                   u_ice=z(N), v_ice=z(N), a_ice=z(N), thdgr=z(N),
                   ssh_gp=z(N), m_ice=z(N), m_snow=z(N), press_air=z(N),
                   prec_rain=z(N))


def initial_z3d(mesh: MeshTables, dtype):
    """Unperturbed interface/mid depths per node (zbar_3d, Z_3d).

    ref init_ale (oce_ale.F90:160-194): standard levels above the bottom,
    ``zbar_n_bot`` at the bottom interface (partial cells), bottom-layer mid
    depth halfway between the last full interface and the partial bottom;
    below-bottom entries pinned to the bottom values.
    """
    nl = mesh.nl
    zbar = mesh.zbar.astype(dtype)
    Z = mesh.Z.astype(dtype)
    nln = mesh.nlevels_node          # [N] 1-based level counts
    znb = mesh.zbar_n_bot.astype(dtype)                        # [N]
    lay = jnp.arange(nl - 1)
    lev = jnp.arange(nl)
    # interfaces: standard above the bottom, partial depth at/below it
    zbar_3d = jnp.where(lev[:, None] < nln[None, :] - 1, zbar[:, None],
                        znb[None, :])
    # mids: standard above the bottom layer; bottom layer = midpoint of
    # (last full interface, partial bottom) (ref :192)
    zmid_bot = 0.5 * (jnp.take(zbar, jnp.maximum(nln - 2, 0)) + znb)  # [N]
    Z_3d = jnp.where(lay[:, None] < nln[None, :] - 2, Z[:, None],
                     zmid_bot[None, :])
    return zbar_3d, Z_3d


def init_thickness_linfs(state: OceanState, mesh: MeshTables) -> OceanState:
    """Initialise hnode/helem/zbar_3d/Z_3d (unperturbed column, eta=0).

    ref: init_ale + init_thickness_ale (oce_ale.F90:82-194, :583-628);
    bottom-layer thickness comes from mesh.bottom_{node,elem}_thickness,
    which equals the full-cell value when use_partial_cell is off.
    """
    nl = mesh.nl
    dtype = state.eta.dtype
    zbar = mesh.zbar.astype(dtype)
    nln = mesh.nlevels_node          # [N] 1-based level counts
    nle = mesh.nlevels_elem
    lay = jnp.arange(nl - 1)

    dz = (zbar[:-1] - zbar[1:])[:, None]                      # [nl-1, 1]
    is_bot_n = lay[:, None] == (nln - 2)[None, :]
    is_bot_e = lay[:, None] == (nle - 2)[None, :]
    hnode = jnp.where(is_bot_n,
                      mesh.bottom_node_thickness.astype(dtype)[None, :], dz)
    hnode = jnp.where(mesh.node_layer_mask, hnode, 0.0)
    helem = jnp.where(is_bot_e,
                      mesh.bottom_elem_thickness.astype(dtype)[None, :], dz)
    helem = jnp.where(mesh.elem_layer_mask, helem, 0.0)

    zbar_3d, Z_3d = initial_z3d(mesh, dtype)
    return replace(state, hnode=hnode, hnode_new=hnode, helem=helem,
                   zbar_3d=zbar_3d.astype(dtype), Z_3d=Z_3d.astype(dtype))
