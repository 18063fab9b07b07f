"""CVMix-style vertical mixing schemes: PP shear (cvmix_PP) and the
prognostic TKE closure (cvmix_TKE).

TPU design: the reference's per-column Fortran loops
(``gen_modules_cvmix_pp.F90:164-265``, ``gen_modules_cvmix_tke.F90:245-391``
calling ``cvmix_shear.F90:339-432`` / ``cvmix_tke.F90:387-918``) become
dense masked ``[nl, N]`` array ops; the TKE tridiagonal is the shared
batched Thomas solver (two ``lax.scan`` sweeps), and the mixing-length
min-chains are two masked scans over the level axis.
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ...mesh import MeshTables
from ...constants import g, density_0
from ..state import OceanState
from ..ops import tridiag_solve, elem_to_node_mean, elem_to_node_mean_flat


# --------------------------------------------------------------------------
# latitude/depth dependent background diffusivity (Q. Wang, FESOM1.4)
# --------------------------------------------------------------------------
def kv0_background_qiang(lat_deg, dep):
    """ref Kv0_background_qiang oce_ale_mixing_pp.F90:91-125; lat in degrees,
    dep positive metres. Broadcasts [nl, N] x [N]."""
    aux = (0.6 + 1.0598 / 3.1415926
           * jnp.arctan(4.5e-3 * (dep - 2500.0))) * 1.0e-5
    alat = jnp.abs(lat_deg)
    ratio = jnp.where(alat < 5.0, 1.0,
                      jnp.minimum(1.0 + 9.0 * (alat - 5.0) / 10.0, 10.0))
    arctic = jnp.where(dep <= 50.0, 4.0 + 6.0 * (50.0 - dep) / 50.0, 4.0)
    ratio = jnp.where(lat_deg > 70.0, arctic, ratio)
    return aux * ratio


def _shear2(state: OceanState):
    """Squared vertical shear of the node velocity at interior interfaces,
    zero at surface/bottom rows. [nl, N]."""
    Z3 = state.Z_3d
    dz = Z3[:-1] - Z3[1:]
    dz_inv = 1.0 / jnp.where(dz == 0, 1.0, dz)
    du = (state.unode[:-1] - state.unode[1:]) * dz_inv
    dv = (state.vnode[:-1] - state.vnode[1:]) * dz_inv
    s2 = du * du + dv * dv
    out = jnp.zeros_like(state.Kv)
    return out.at[1:-1].set(s2)


def _interface_masks(mesh: MeshTables):
    nl = mesh.nl
    lev = jnp.arange(nl)[:, None]
    nb = (mesh.nlevels_node - 1)[None, :]       # bottom interface index [1,N]
    interior = (lev >= 1) & (lev <= nb - 1)     # interfaces 1..nb-1
    active = lev <= nb
    return lev, nb, interior, active


def _av_to_elems(Av_node, mesh: MeshTables):
    """Node interface viscosity -> element interior interfaces (plain 3-node
    mean, ref gen_modules_cvmix_pp.F90:258-264)."""
    ae = jnp.take(Av_node, mesh.elem_nodes, axis=-1).mean(-1)  # [nl, E]
    lev = jnp.arange(mesh.nl)[:, None]
    emask = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
    return jnp.where(emask, ae, 0.0)


# --------------------------------------------------------------------------
# cvmix_PP  (Pacanowski & Philander 1981 via CVMix shear, FESOM flavour)
# --------------------------------------------------------------------------
def calc_cvmix_pp(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """ref calc_cvmix_pp gen_modules_cvmix_pp.F90:164-265 +
    cvmix_coeffs_shear (PP branch) cvmix_shear.F90:381-403."""
    cv = cfg.cvmix
    lev, nb, interior, _ = _interface_masks(mesh)

    Ri = jnp.where(interior,
                   jnp.maximum(state.bvfreq, 0.0)
                   / jnp.maximum(_shear2(state), 1e-30), 0.0)
    denom = jnp.where(Ri > 0.0, 1.0 + cv.pp_alpha * Ri, 1.0)

    nu_b = cv.pp_Avbckg if (not cv.pp_use_fesompp or cv.pp_use_AvbinKv) else 0.0
    kap_b = 0.0 if (cv.pp_use_fesompp and cv.pp_use_nonconstKvb) else cv.pp_Kvbckg
    Av = cv.pp_Av0 / denom ** cv.pp_exp + nu_b
    Kv = Av / denom + kap_b
    if cv.pp_use_fesompp and not cv.pp_use_AvbinKv:
        Av = Av + cv.pp_Avbckg          # added by hand, omitted from Kv
    if cv.pp_use_fesompp and cv.pp_use_nonconstKvb:
        from ...constants import rad
        lat_deg = mesh.geo_coords[:, 1] / rad
        Kv = Kv + kv0_background_qiang(lat_deg[None, :],
                                       jnp.abs(state.zbar_3d))
    Av = jnp.where(interior, Av, 0.0)
    Kv = jnp.where(interior, Kv, 0.0)
    return replace(state, Kv=Kv, Av=_av_to_elems(Av, mesh))


# --------------------------------------------------------------------------
# cvmix_TKE (prognostic turbulent kinetic energy closure)
# --------------------------------------------------------------------------
def calc_cvmix_tke(state: OceanState, mesh: MeshTables, cfg, forcing,
                   iw_diss=None, iwe=None, iwe_alpha_c=None) -> OceanState:
    """One implicit TKE step per node column (ref integrate_tke
    cvmix_tke.F90:387-918 driven by gen_modules_cvmix_tke.F90:245-391).

    With `iw_diss`/`iwe`/`iwe_alpha_c` supplied (IDEMIX coupling,
    mix_scheme_nmb=56) the internal-wave dissipation feeds TKE and the
    Richardson number is capped by the wave-energy criterion.
    """
    cv = cfg.cvmix
    dt = cfg.dt
    nl, N = mesh.nl, mesh.n_nodes
    lev, nb, interior, active = _interface_masks(mesh)
    lmask = mesh.node_layer_mask                 # [nl-1, N] active layers

    dzw = jnp.where(lmask, state.hnode, 1.0)     # layer thickness, safe
    # dzt: distance between tracer points, halved cells at the boundaries
    Z3 = state.Z_3d
    dzt_int = Z3[:-1] - Z3[1:]                   # [nl-2,N] interfaces 1..nl-2
    h_bot = jnp.take_along_axis(
        jnp.where(lmask, state.hnode, 0.0),
        jnp.maximum(nb - 1, 0), axis=0)[0]       # bottom layer thickness [N]
    dzt = jnp.ones((nl, N), state.Kv.dtype)
    dzt = dzt.at[1:-1].set(jnp.abs(dzt_int))
    dzt = dzt.at[0].set(state.hnode[0] / 2.0)
    dzt = jnp.where(lev == nb, h_bot[None, :] / 2.0, dzt)
    dzt = jnp.where(active & (dzt > 0), dzt, 1.0)

    # the wrapper builds vshear2 only on interior interfaces nun+1..nln
    # (gen_modules_cvmix_tke.F90:288-293) — below-bottom rows of the dense
    # shear array hold garbage differences and must be masked
    Ssqr = jnp.where(interior, _shear2(state), 0.0)
    Nsqr = jnp.where(interior, state.bvfreq, 0.0)

    # ---- mixing length (tke_mxl_choice=2): two min-chain scans ----------
    sqrttke = jnp.sqrt(jnp.maximum(0.0, state.tke))
    mxl = jnp.sqrt(2.0) * sqrttke / jnp.sqrt(jnp.maximum(1e-12, Nsqr))
    mxl = jnp.where((lev == 0) | (lev >= nb), 0.0, mxl)

    dzw0 = jnp.where(lmask, state.hnode, 0.0)

    def fwd(carry, md):
        m, dz_above = md
        m = jnp.minimum(m, carry + dz_above)
        return m, m
    _, mxl_f = jax.lax.scan(fwd, mxl[0], (mxl[1:], dzw0))
    mxl = jnp.concatenate([mxl[:1], mxl_f], 0)
    # clamp at interface nb-1 with mxl_min + bottom layer thickness
    mxl = jnp.where(lev == nb - 1,
                    jnp.minimum(mxl, cv.tke_mxl_min + h_bot[None, :]), mxl)

    def bwd(carry, mdm):
        m, dz_here, apply = mdm
        m = jnp.where(apply, jnp.minimum(m, carry + dz_here), m)
        return m, m
    apply_bwd = (lev[:-1] >= 1) & (lev[:-1] <= nb - 2)
    _, mxl_b = jax.lax.scan(bwd, mxl[-1], (mxl[:-1], dzw0, apply_bwd),
                            reverse=True)
    mxl = jnp.concatenate([mxl_b, mxl[-1:]], 0)
    mxl = jnp.maximum(mxl, cv.tke_mxl_min)

    # ---- diffusivities ---------------------------------------------------
    KappaM = jnp.minimum(cv.tke_kappaM_max, cv.tke_c_k * mxl * sqrttke)
    Rinum = Nsqr / jnp.maximum(Ssqr, 1e-12)
    if iwe is not None:
        Rinum = jnp.minimum(Rinum, KappaM * Nsqr
                            / jnp.maximum(1e-12, iwe_alpha_c * iwe ** 2))
    prandtl = jnp.clip(6.6 * Rinum, 1.0, 10.0)
    KappaH = KappaM / prandtl

    # ---- forcing ---------------------------------------------------------
    forc = Ssqr * KappaM - Nsqr * KappaH
    if iw_diss is not None:
        forc = forc + iw_diss
    sxy = elem_to_node_mean_flat(jnp.stack([forcing.stress_x,
                                            forcing.stress_y]), mesh)
    forc_surf = jnp.sqrt(sxy[0] ** 2 + sxy[1] ** 2) / density_0
    forc = forc.at[0].add(cv.tke_cd * forc_surf ** 1.5 / dzt[0])

    # ---- ke on layers: alpha*0.5*(K[min(k+1,nb-1)] + K[max(k,1)]) --------
    llev = jnp.arange(nl - 1)[:, None]
    # K[min(k+1, nb-1)]: k+1 normally; at bottom layer (k=nb-1) use K[nb-1]
    Kp1 = jnp.where(llev == nb - 1,
                    jnp.take_along_axis(KappaM, nb - 1, axis=0),
                    KappaM[1:])
    Kk = jnp.where(llev == 0, KappaM[1:2], KappaM[:-1])
    ke = cv.tke_alpha * 0.5 * (Kp1 + Kk)
    ke = jnp.where(lmask, ke, 0.0)

    # ---- tridiagonal assembly (Neumann at both boundaries) ---------------
    inv_tw = 1.0 / (dzt[:-1] * dzw)              # [nl-1,N]  at interface k
    inv_aw = 1.0 / (dzt[1:] * dzw)               # at interface k+1, layer k
    c_dif = jnp.zeros((nl, N), KappaM.dtype).at[:-1].set(ke * inv_tw)
    c_dif = jnp.where(lev >= nb, 0.0, c_dif)
    a_dif = jnp.zeros((nl, N), KappaM.dtype).at[1:].set(ke * inv_aw)
    a_dif = jnp.where((lev >= 1) & (lev <= nb), a_dif, 0.0)
    b_dif = jnp.where(interior, a_dif + c_dif, 0.0)
    b_dif = jnp.where(lev == 0, c_dif, b_dif)
    b_dif = jnp.where(lev == nb, a_dif, b_dif)

    diss = jnp.where(interior, cv.tke_c_eps * sqrttke / mxl, 0.0)
    a_tri = jnp.where(active, -dt * a_dif, 0.0)
    b_tri = jnp.where(active, 1.0 + dt * (b_dif + diss), 1.0)
    c_tri = jnp.where(active, -dt * c_dif, 0.0)
    d_tri = jnp.where(active, state.tke + dt * forc, 0.0)
    tke_new = tridiag_solve(a_tri, b_tri, c_tri, d_tri)
    if iw_diss is None:
        # bounding to tke_min only applies when IDEMIX is off (ref
        # integrate_tke Part 5, `if (only_tke)` cvmix_tke.F90:762-765)
        tke_new = jnp.maximum(tke_new, cv.tke_min)
    tke_new = jnp.where(active, tke_new, 0.0)

    Kv = jnp.where(interior, KappaH, 0.0)
    Av_n = jnp.where(interior, KappaM, 0.0)
    return replace(state, tke=tke_new, Kv=Kv, Av=_av_to_elems(Av_n, mesh))


# --------------------------------------------------------------------------
# cvmix_IDEMIX (Olbers & Eden 2013 internal-wave energy)
# --------------------------------------------------------------------------
def _gofx2(x):
    """ref gofx2 cvmix_idemix.F90:672-682."""
    x2 = jnp.maximum(3.0, x)
    c = 1.0 - (2.0 / jnp.pi) * jnp.arcsin(1.0 / x2)
    return 2.0 / jnp.pi / c * 0.9 * x2 ** (-2.0 / 3.0) * (1.0 - jnp.exp(-x2 / 4.3))


def _hofx2(x):
    """ref hofx2 cvmix_idemix.F90:684-693."""
    x2 = jnp.maximum(10.0, x)
    return (2.0 / jnp.pi) / (1.0 - (2.0 / jnp.pi) * jnp.arcsin(1.0 / x2)) \
        * (x2 - 1.0) / (x2 + 1.0)


def _dzt_interfaces(state, mesh, nb, active):
    """Tracer-point spacing at interfaces, halved cells at boundaries."""
    nl, N = mesh.nl, mesh.n_nodes
    lmask = mesh.node_layer_mask
    Z3 = state.Z_3d
    h_bot = jnp.take_along_axis(jnp.where(lmask, state.hnode, 0.0),
                                jnp.maximum(nb - 1, 0), axis=0)[0]
    dzt = jnp.ones((nl, N), state.Kv.dtype)
    dzt = dzt.at[1:-1].set(jnp.abs(Z3[:-1] - Z3[1:]))
    dzt = dzt.at[0].set(state.hnode[0] / 2.0)
    dzt = jnp.where(jnp.arange(nl)[:, None] == nb, h_bot[None, :] / 2.0, dzt)
    return jnp.where(active & (dzt > 0), dzt, 1.0), h_bot


def calc_cvmix_idemix(state: OceanState, mesh: MeshTables, cfg, forcing,
                      iw_surf=None, iw_bot=None,
                      standalone: bool = False) -> OceanState:
    """Internal-wave energy step (ref integrate_idemix cvmix_idemix.F90 +
    wrapper gen_modules_cvmix_idemix.F90:168-336).

    `iw_surf`/`iw_bot` [N] are the near-inertial surface and tidal bottom
    energy fluxes already divided by density_0 (the wrapper reads them from
    netCDF at init, :253-276); zeros when not supplied. The horizontal
    wave-energy propagation (:363-662) is one vectorized edge pass using the
    pre-pass iwe for all fluxes (the reference's in-place scatter order is
    partition-dependent and not reproduced).
    """
    from ..ops import scalar_gradient, edge_divergence
    cv = cfg.cvmix
    dt = cfg.dt
    nl, N = mesh.nl, mesh.n_nodes
    lev, nb, interior, active = _interface_masks(mesh)
    lmask = mesh.node_layer_mask
    dtype = state.Kv.dtype
    if iw_surf is None:
        iw_surf = jnp.zeros(N, dtype)
    if iw_bot is None:
        iw_bot = jnp.zeros(N, dtype)

    dzw = jnp.where(lmask, state.hnode, 0.0)
    dzt, h_bot = _dzt_interfaces(state, mesh, nb, active)
    Nsqr = jnp.where(interior, state.bvfreq, 0.0)
    sqrtN = jnp.sqrt(jnp.maximum(0.0, Nsqr))

    # column-integrated buoyancy frequency -> cstar (ref :105-110)
    bN0 = (sqrtN[1:] * dzw).sum(0)               # interfaces 1..nb-1
    cstar = jnp.maximum(1e-2, bN0 / (jnp.pi * cv.idemix_jstar))[None, :]

    f = jnp.abs(mesh.coriolis_node)[None, :]
    fxa = sqrtN / (1e-22 + f)
    c0 = jnp.maximum(0.0, cv.idemix_gamma * cstar * _gofx2(fxa))
    v0 = jnp.maximum(0.0, cv.idemix_gamma * cstar * _hofx2(fxa))
    v0 = jnp.where(fxa < 1.0, 0.0, v0)
    alpha_c = jnp.maximum(1e-4, cv.idemix_mu0
                          * jnp.arccosh(jnp.maximum(1.0, fxa)) * f / cstar ** 2)

    iwe_max = jnp.maximum(0.0, state.iwe)
    # vertical diffusion of E with coefficient tau_v*c0^2 (ref :121-141)
    safe_dzw = jnp.where(lmask, state.hnode, 1.0)
    delta = cv.idemix_tau_v / safe_dzw * 0.5 * (c0[:-1] + c0[1:])  # [nl-1,N]
    delta = jnp.where(lmask, delta, 0.0)
    inv_dzt = 1.0 / dzt
    a_dif = jnp.zeros((nl, N), dtype).at[1:].set(delta * c0[:-1] * inv_dzt[1:])
    a_dif = jnp.where((lev >= 1) & (lev <= nb), a_dif, 0.0)
    c_dif = jnp.zeros((nl, N), dtype).at[:-1].set(delta * c0[1:] * inv_dzt[:-1])
    c_dif = jnp.where(lev >= nb, 0.0, c_dif)
    dsum = jnp.zeros((nl, N), dtype)
    dsum = dsum.at[1:].add(jnp.where(lmask, delta, 0.0))
    dsum = dsum.at[:-1].add(jnp.where(lmask, delta, 0.0))
    b_dif = jnp.where(interior, dsum * c0 * inv_dzt, 0.0)
    # boundary rows: b(0)=delta(0)*c0(0)/dzt(0); b(nb)=delta(nb-1)*c0(nb)/dzt(nb)
    b_dif = jnp.where(lev == 0, delta[0] * c0[0] * inv_dzt[0], b_dif)
    bot_delta = jnp.take_along_axis(delta, jnp.maximum(nb - 1, 0), axis=0)[0]
    b_dif = jnp.where(lev == nb, bot_delta[None, :] * c0 * inv_dzt, b_dif)

    a_tri = jnp.where(active, -dt * a_dif, 0.0)
    b_tri = jnp.where(active,
                      1.0 + dt * b_dif
                      + jnp.where(interior, dt * alpha_c * iwe_max, 0.0), 1.0)
    c_tri = jnp.where(active, -dt * c_dif, 0.0)
    d_tri = jnp.where(active, state.iwe, 0.0)
    d_tri = d_tri.at[0].add(dt * iw_surf / dzt[0])
    d_tri = d_tri + jnp.where(lev == nb, (dt * iw_bot)[None, :] / dzt, 0.0)
    iwe_new = tridiag_solve(a_tri, b_tri, c_tri, d_tri)
    iwe_new = jnp.where(active, iwe_new, 0.0)

    # dissipation -> TKE source (ref :158-161; sign flipped to a source)
    iwe_diss = jnp.where(interior, alpha_c * iwe_max * iwe_new, 0.0)

    # ---- horizontal wave-energy propagation (one vectorized edge pass) ---
    if cv.idemix_n_hor_iwe_prop_iter > 0:
        n_it = cv.idemix_n_hor_iwe_prop_iter
        cflfac = 0.2
        fac = cv.idemix_tau_h * dt / n_it
        # interface k budgets with the area of the layer above (surface: own)
        area_up = jnp.concatenate([mesh.area[:1], mesh.area[:-1]], 0)
        asv_up = jnp.concatenate([mesh.areasvol[:1], mesh.areasvol[:-1]], 0)
        vol_i = 1.0 / jnp.where(active, asv_up * dzt, 1.0)
        v0c = jnp.minimum(v0, jnp.sqrt(cflfac * (area_up / jnp.pi * 4.0) / fac))

        gx, gy = scalar_gradient(v0c * iwe_new, mesh)        # [nl, E]
        # element interface-centred thickness from helem
        he = jnp.where(mesh.elem_layer_mask, state.helem, 0.0)
        dzel = jnp.zeros((nl, mesh.n_elems), dtype)
        dzel = dzel.at[:-1].add(0.5 * he)
        dzel = dzel.at[1:].add(0.5 * he)
        et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
        has2 = et2 >= 0
        et2s = jnp.where(has2, et2, 0)
        dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
        dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
        em = (lev <= (mesh.nlevels_elem - 1)[None, :])       # elem interfaces
        m1 = em[:, et1]
        m2 = em[:, et2s] & has2[None, :]
        t1 = (gx[:, et1] * dY1[None] - gy[:, et1] * dX1[None]) * dzel[:, et1]
        t2 = -(gx[:, et2s] * dY2[None] - gy[:, et2s] * dX2[None]) * dzel[:, et2s]
        gxm = 0.5 * (gx[:, et1] + gx[:, et2s])
        gym = 0.5 * (gy[:, et1] + gy[:, et2s])
        dzm = 0.5 * (dzel[:, et1] + dzel[:, et2s])
        tb = ((dX2 - dX1)[None] * gym - (dY2 - dY1)[None] * gxm) * dzm
        vflux = jnp.where(m1 & m2, tb,
                          jnp.where(m1, t1, jnp.where(m2, t2, 0.0)))
        n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]
        vflux = vflux * 0.5 * (v0c[:, n0] + v0c[:, n1])
        iwe_new = iwe_new + fac * vol_i * edge_divergence(vflux, mesh)
        iwe_new = jnp.where(active, iwe_new, 0.0)

    state = replace(state, iwe=iwe_new, iwe_diss=iwe_diss,
                    iwe_alpha_c=alpha_c)
    if standalone:
        # ref :324-338 (mix_scheme_nmb==6 debugging mode)
        diss_neg = -iwe_diss
        Kv = jnp.clip(0.2 / 1.2 * (-diss_neg) / jnp.maximum(1e-12, Nsqr),
                      1e-9, 1.0)
        Kv = jnp.where(interior, Kv, 0.0)
        Av_n = 10.0 * Kv
        ae = jnp.take(Av_n, mesh.elem_nodes, axis=-1).mean(-1)
        emask = lev <= (mesh.nlevels_elem - 2)[None, :]
        state = replace(state, Kv=Kv, Av=jnp.where(emask, ae, 0.0))
    return state


# --------------------------------------------------------------------------
# cvmix_TIDAL (Simmons et al. 2004)
# --------------------------------------------------------------------------
def calc_cvmix_tidal(state: OceanState, mesh: MeshTables, cfg,
                     tidal_forc=None) -> OceanState:
    """Adds Simmons tidal mixing to Kv/Av (ref calc_cvmix_tidal
    gen_modules_cvmix_tidal.F90:88-130 + cvmix_tidal.F90 Simmons
    invariant/coeffs/vert_dep).

    `tidal_forc` [N] is the bottom wave-dissipation energy flux [W/m^2]
    (read from netCDF at init in the reference); zeros when not supplied.
    """
    cv = cfg.cvmix
    nl, N = mesh.nl, mesh.n_nodes
    lev, nb, interior, active = _interface_masks(mesh)
    dtype = state.Kv.dtype
    if tidal_forc is None:
        tidal_forc = jnp.zeros(N, dtype)

    simmons = (cv.tidal_local_mixfrac * cv.tidal_efficiency
               * tidal_forc / density_0)                     # [N]

    # vertical deposition: exp(-zw/zeta) at interior interfaces, normalized
    # by sum(vert_dep * (zt(k-1)-zt(k))) (ref cvmix_compute_vert_dep)
    vd = jnp.where(interior, jnp.exp(-state.zbar_3d
                                     / cv.tidal_vert_decayscale), 0.0)
    thick = jnp.zeros((nl, N), dtype).at[1:-1].set(state.Z_3d[:-1]
                                                   - state.Z_3d[1:])
    tot = (vd * jnp.where(interior, thick, 0.0)).sum(0)
    vd = vd / jnp.where(tot > 0, tot, 1.0)[None, :]

    depth = -jnp.take_along_axis(state.zbar_3d, nb, axis=0)[0]
    Nsqr = state.bvfreq
    Kv_t = jnp.where(Nsqr > 0.0, simmons[None, :] * vd / Nsqr, 0.0)
    Kv_t = jnp.minimum(Kv_t, cv.tidal_max_coefficient)
    Kv_t = jnp.where((depth >= cv.tidal_depth_cutoff)[None, :], Kv_t, 0.0)
    Kv_t = jnp.where(active, Kv_t, 0.0)
    Av_t = 1.0 * Kv_t                    # CVMix global Prandtl default 1.0

    ae = jnp.take(Av_t, mesh.elem_nodes, axis=-1).mean(-1)
    emask = lev <= (mesh.nlevels_elem - 2)[None, :]
    return replace(state, Kv=state.Kv + Kv_t,
                   Av=state.Av + jnp.where(emask, ae, 0.0))


# --------------------------------------------------------------------------
# cvmix_DDIFF (double diffusion: salt fingering + diffusive convection)
# --------------------------------------------------------------------------
def calc_cvmix_ddiff(state: OceanState, mesh: MeshTables, cfg) -> OceanState:
    """Standalone double-diffusive mixing (ref cvmix_ddiff.F90
    cvmix_coeffs_ddiff_low :355-445): at each interior interface the
    density ratio Rrho = (alpha dT/dz)/(beta dS/dz) selects

    - SALT FINGERING (Rrho in [1, strat_param_max), dS/dz destabilizing):
      Sdiff = kappa_ddiff_s * (1 - ((Rrho-1)/(max-1))^p1)^p2,
      Tdiff = 0.7 Sdiff  (St. Laurent & Schmitt 1999);
    - DIFFUSIVE CONVECTION (Rrho < 1, dT/dz destabilizing), MC76 form:
      Tdiff = mol_diff * 0.909 * exp(4.6 exp(-0.54 (1/Rrho - 1))),
      Sdiff = (0.15 Rrho | 1.85 Rrho - 0.85) Tdiff.

    The Rrho numerator/denominator follow the CVMix driver convention
    (strat_param_num = alpha dT/dz, denom = beta dS/dz at interfaces,
    cvmix_ddiff.F90:330-345); the reference FESOM build reaches ddiff
    only inside native KPP (ddmix, oce_ale_mixing_kpp.F90) — this
    standalone form closes that menu gap.  Adds to Kv and (salinity
    channel) Kv_s."""
    from .. import eos
    cv = cfg.cvmix
    nl, N = mesh.nl, mesh.n_nodes
    lev, nb, interior, active = _interface_masks(mesh)
    T, S = state.tr[0], state.tr[1]
    alpha, beta = eos.sw_alpha_beta(T, S, state.Z_3d)       # [nl-1, N]
    dz = state.Z_3d[:-1] - state.Z_3d[1:]                   # [nl-2, N] > 0
    dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)
    aT = 0.5 * (alpha[:-1] + alpha[1:])
    bS = 0.5 * (beta[:-1] + beta[1:])
    num = jnp.zeros((nl, N), T.dtype).at[1:-1].set(
        aT * (T[:-1] - T[1:]) / dz)
    den = jnp.zeros((nl, N), T.dtype).at[1:-1].set(
        bS * (S[:-1] - S[1:]) / dz)

    # sign-preserving guard: a +1e-30 replacement for tiny-NEGATIVE den
    # flipped Rrho's sign in the dconv branch (num,den<0 => Rrho>0), and
    # the MC76 double exponential then overflowed to inf
    safe_den = jnp.where(jnp.abs(den) > 1e-30, den,
                         jnp.where(den < 0.0, -1e-30, 1e-30))
    Rrho = num / safe_den
    # salt fingering
    finger = (num >= den) & (den > 0.0) & (Rrho < cv.ddiff_strat_param_max)
    dd = (1.0 - ((Rrho - 1.0) / (cv.ddiff_strat_param_max - 1.0))
          ** cv.ddiff_exp1) ** cv.ddiff_exp2
    Sd_f = jnp.where(finger, cv.ddiff_kappa_s * dd, 0.0)
    Td_f = 0.7 * Sd_f
    # diffusive convection (MC76)
    dconv = (num >= den) & (num < 0.0)
    # dconv implies den <= num < 0, so Rrho in (0, 1]; clamp to that range
    # anyway (the reference only evaluates MC76 for 0 < Rrho < 1)
    Rs = jnp.where(dconv, jnp.clip(Rrho, 1e-10, 1.0), 0.5)
    Td_c = cv.ddiff_mol_diff * cv.ddiff_param1 \
        * jnp.exp(cv.ddiff_param2
                  * jnp.exp(cv.ddiff_param3 * (1.0 / jnp.where(
                      jnp.abs(Rs) > 1e-30, Rs, 1e-30) - 1.0)))
    Sd_c = jnp.where(Rs < 0.5, 0.15 * Rs, 1.85 * Rs - 0.85) * Td_c
    Td = jnp.where(interior, Td_f + jnp.where(dconv, Td_c, 0.0), 0.0)
    Sd = jnp.where(interior, Sd_f + jnp.where(dconv, Sd_c, 0.0), 0.0)
    # split channels: temperature rides Kv (+Td), salinity rides Kv_s =
    # main-scheme Kv + Sd (the tracer solve selects Kv_s for tracer id 1
    # whenever a ddiff scheme is active)
    return replace(state, Kv=state.Kv + Td, Kv_s=state.Kv + Sd)


# --------------------------------------------------------------------------
# cvmix_CONVECTION (gravitational-instability enhanced mixing)
# --------------------------------------------------------------------------
def calc_cvmix_convection(state: OceanState, mesh: MeshTables,
                          cfg) -> OceanState:
    """Standalone convective mixing (ref cvmix_convection.F90
    cvmix_coeffs_conv_low, lBruntVaisala=.true. branch): where N^2 <= 0,

    - BVsqr_convect < 0: smooth ramp wgt = (1 - (1 - N^2/BVsqr)^2)^3
      between N^2 = 0 and N^2 = BVsqr_convect (full convection);
    - BVsqr_convect >= 0: step function (wgt = 1 whenever N^2 <= 0).

    Kv += wgt * convect_diff; Av += wgt * convect_visc."""
    cv = cfg.cvmix
    nl, N = mesh.nl, mesh.n_nodes
    lev, nb, interior, active = _interface_masks(mesh)
    Nsqr = state.bvfreq
    unstable = Nsqr <= 0.0
    if cv.conv_bvsqr < 0.0:
        w = 1.0 - Nsqr / cv.conv_bvsqr
        wgt = jnp.where(Nsqr > cv.conv_bvsqr,
                        (1.0 - w ** 2) ** 3, 1.0)
    else:
        wgt = jnp.ones_like(Nsqr)
    wgt = jnp.where(unstable & interior, wgt, 0.0)
    Kv_c = wgt * cv.conv_diff
    Av_c = wgt * cv.conv_visc
    return replace(state, Kv=state.Kv + Kv_c,
                   Av=state.Av + _av_to_elems(Av_c, mesh))


# --------------------------------------------------------------------------
# cvmix_KPP (CVMix-flavour KPP boundary layer, mix_scheme nmb 3)
# --------------------------------------------------------------------------
def calc_cvmix_kpp(state: OceanState, mesh: MeshTables, cfg, forcing,
                   sw_3d=None) -> OceanState:
    """CVMix KPP with the FESOM default options (ref calc_cvmix_kpp
    gen_modules_cvmix_kpp.F90:171-456 + cvmix_kpp.F90: compute_bulk_Richardson,
    compute_unresolved_shear, compute_OBL_depth_low (linear interp, Ekman +
    Monin-Obukhov limits), coeffs_kpp_low (ParabolicNonLocal shapes) and
    compute_enhanced_diff): surface-layer-averaged bulk Richardson number,
    linearly interpolated OBL depth, sigma(1-sigma)^2 boundary-layer
    profile, enhanced diffusion at the OBL base, KPP-shear interior mixing
    with the Qiang background.

    Non-default options not implemented: kpp_use_fesomkpp=.true. branch,
    quadratic/cubic Ri interpolation, matchtechc other than
    ParabolicNonLocal, kpp_internalmix='PP'.
    """
    from ..eos import eos_components
    from ...constants import rad, vcpw, g as g_
    cv = cfg.cvmix
    nl, N = mesh.nl, mesh.n_nodes
    lev, nb, interior, active = _interface_masks(mesh)
    lmask = mesh.node_layer_mask
    llev = jnp.arange(nl - 1)[:, None]
    dtype = state.Kv.dtype

    Zt = jnp.where(lmask, state.Z_3d, -1e6)       # centers (negative down)
    zb = state.zbar_3d                            # interfaces
    h = jnp.where(lmask, state.hnode, 0.0)

    # ---- surface-layer averaged properties per layer (ref :214-247) ------
    sle = cv.kpp_surf_layer_ext
    sld = sle * jnp.maximum(jnp.maximum(-Zt, (-zb[1])[None, :]),
                            cv.kpp_minOBLdepth)   # [nl-1, N]
    cumh = jnp.cumsum(h, 0)
    cumh_prev = jnp.concatenate([jnp.zeros((1, N), dtype), cumh[:-1]], 0)
    # delh[j, nz, n]: thickness of layer j inside the surface layer of nz
    delh = jnp.clip(sld[None, :, :] - cumh_prev[:, None, :], 0.0,
                    h[:, None, :])
    htot = jnp.maximum(delh.sum(0), 1e-12)
    def slavg(f):
        return jnp.einsum("jln,jn->ln", delh, f) / htot
    sfc_t = slavg(state.tr[0])
    sfc_s = slavg(state.tr[1])
    sfc_u = slavg(state.unode)
    sfc_v = slavg(state.vnode)
    dvsurf2 = (state.unode - sfc_u) ** 2 + (state.vnode - sfc_v) ** 2

    # buoyancy difference vs surface-layer water displaced to Z_nz
    def rho_at(t, s, z):
        b0, bpz, bpz2, rpot = eos_components(t, s, cfg.dyn.state_equation,
                                             cfg.run.toy_ocean)
        r = b0 + z * (bpz + z * bpz2)
        seq = float(cfg.dyn.state_equation)
        return r * rpot / (r + 0.1 * z * seq) - density_0
    dbsurf = -g_ / density_0 * (rho_at(sfc_t, sfc_s, Zt)
                                - rho_at(state.tr[0], state.tr[1], Zt))

    # ---- interior shear mixing + background (ref :262-296) ---------------
    s2 = _shear2(state)
    from .kpp import guard_eps
    shearRi = jnp.where(interior, jnp.maximum(state.bvfreq, 0.0)
                        / (s2 + guard_eps(dtype)), 0.0)
    aux = (1.0 - jnp.minimum(shearRi / cv.kpp_Ri0, 1.0) ** 2) ** cv.kpp_loc_exp
    Av_i = jnp.where(interior, cv.kpp_Av0 * aux + cv.kpp_Avbckg, 0.0)
    Kv_i = jnp.where(interior, cv.kpp_Kv0 * aux, 0.0)
    if cv.kpp_use_nonconstKvb:
        Kv_i = Kv_i + jnp.where(
            interior, kv0_background_qiang(
                (mesh.geo_coords[:, 1] / rad)[None, :],
                jnp.abs(zb)), 0.0)
    else:
        Kv_i = Kv_i + jnp.where(interior, cv.kpp_Kvbckg, 0.0)

    # ---- surface forcing (ref :298-310) -----------------------------------
    from ..eos import sw_alpha_beta
    alpha, beta = sw_alpha_beta(state.tr[0], state.tr[1], state.Z_3d)
    sbuoy = -g_ * (alpha[0] * forcing.heat_flux / vcpw
                   + beta[0] * forcing.water_flux * state.tr[1, 0])
    ustar = jnp.sqrt(jnp.sqrt(forcing.stress_atm_x ** 2
                              + forcing.stress_atm_y ** 2) / density_0)
    if cv.kpp_reduce_tauuice:
        ustar = ustar * (1.0 - forcing.a_ice) ** 2
    sbuoy_obl = sbuoy
    if sw_3d is not None:
        # 'mxl' method applied after OBL known; use lvl1 correction level
        sbuoy_obl = sbuoy + g_ * alpha[0] * (sw_3d[0] - sw_3d[1])

    # ---- turbulent scale ws at centers, sigma = surf_layer_ext -----------
    from .kpp import _wscale
    sbuoy_c = sbuoy[None, :]
    if sw_3d is not None:
        # per-level shortwave correction (ref :311-316)
        sbuoy_c = sbuoy_c + g_ * alpha[0][None, :] * (sw_3d[0][None, :]
                                                      - sw_3d[1:])
    zehat_c = cv.kpp_vonKarman * sle * (-Zt) * sbuoy_c
    _, ws_c = _wscale(zehat_c, ustar[None, :])

    # ---- bulk Richardson at centers (ref compute_bulk_Richardson) --------
    Ncntr = jnp.sqrt(jnp.maximum(state.bvfreq[1:], 0.0))     # N at iface nz+1
    Vtc = jnp.sqrt(0.2 / (cv.kpp_cs * sle)) / cv.kpp_vonKarman ** 2
    Cv = jnp.where(Ncntr < 0.002, 2.1 - 200.0 * Ncntr, 1.7)
    Vt2 = jnp.maximum(-Cv * Vtc * Zt * Ncntr * ws_c / cv.kpp_Rib_crit,
                      cv.kpp_minVtsqr)
    scaling = 1.0 - 0.5 * sle
    Rib = jnp.where(lmask,
                    -scaling * Zt * dbsurf
                    / jnp.maximum(dvsurf2 + Vt2, guard_eps(dtype)), 0.0)

    # ---- OBL depth: linear interpolation of Rib across Ri_crit -----------
    exceed = (Rib > cv.kpp_Rib_crit) & lmask
    has = exceed.any(0)
    kfirst = jnp.argmax(exceed, 0)                            # first center
    kprev = jnp.maximum(kfirst - 1, 0)
    take = lambda A, K: jnp.take_along_axis(A, K[None, :], 0)[0]
    r1, r0 = take(Rib, kfirst), take(Rib, kprev)
    z1, z0 = take(Zt, kfirst), take(Zt, kprev)
    frac = (cv.kpp_Rib_crit - r0) / jnp.where(r1 != r0, r1 - r0, 1.0)
    obl_x = -(z0 + frac * (z1 - z0))
    obl_x = jnp.where(kfirst == 0, -z1, obl_x)
    zt_bot = -take(Zt, jnp.maximum(nb[0] - 2, 0))             # deepest center
    obl_lim = zt_bot
    if cv.kpp_use_compEkman:
        f = jnp.abs(mesh.coriolis_node)
        ek = jnp.where((f == 0.0) | (sbuoy_obl <= 0.0), zt_bot,
                       0.7 * ustar / jnp.maximum(f, 1e-20))
        obl_lim = jnp.minimum(obl_lim, ek)
    if cv.kpp_use_monob:
        mo = jnp.where(sbuoy_obl > 0.0,
                       ustar ** 3 / jnp.maximum(sbuoy_obl
                                                * cv.kpp_vonKarman, 1e-30),
                       zt_bot)
        obl_lim = jnp.minimum(obl_lim, mo)
    obl = jnp.where(has, jnp.minimum(obl_x, obl_lim), obl_lim)
    # wrapper clamps (ref :336-340)
    obl = jnp.maximum(obl, jnp.abs(zb[1]))
    zb_bot = jnp.abs(take(zb, nb[0]))
    obl = jnp.minimum(obl, zb_bot)

    # ---- boundary-layer profile (ParabolicNonLocal shapes) ---------------
    # centers above OBL: ktup0 = count(-Zt < obl) - 1
    above_c = jnp.where(lmask, (-Zt < obl[None, :]), False)
    ktup = jnp.maximum(above_c.sum(0) - 1, 0)                 # [N]
    sigma_i = jnp.minimum(-zb / obl[None, :], 1.0)            # interfaces
    # LMD94 convention: scales frozen at sigma=surf_layer_ext when unstable
    stable = sbuoy_obl > 0.0
    sig_eff = jnp.where(stable[None, :], sigma_i,
                        jnp.minimum(sigma_i, sle))
    wm_i, ws_i = _wscale(cv.kpp_vonKarman * sig_eff * obl[None, :]
                         * sbuoy_obl[None, :], ustar[None, :])
    Gs = sigma_i * (1.0 - sigma_i) ** 2
    blm = obl[None, :] * wm_i * Gs
    blt = obl[None, :] * ws_i * Gs
    inside_i = (lev >= 1) & (-zb < obl[None, :]) & (lev <= nb - 1)
    nonloc = jnp.where(inside_i & (~stable)[None, :],
                       cv.kpp_cs2 * (1.0 - sigma_i) ** 2, 0.0)

    # enhanced diffusion at the transition interface ktup+1 (ref
    # compute_enhanced_diff, lkteqkw branch; delta from center spacing)
    zt_k = take(Zt, ktup)
    zt_k1 = take(Zt, jnp.minimum(ktup + 1, nl - 2))
    delta = jnp.clip((obl + zt_k) / jnp.where(zt_k != zt_k1,
                                              zt_k - zt_k1, 1.0), 0.0, 1.0)
    sig_k = jnp.minimum(-zt_k / obl, 1.0)
    wm_k, ws_k = _wscale(cv.kpp_vonKarman
                         * jnp.where(stable, sig_k, jnp.minimum(sig_k, sle))
                         * obl * sbuoy_obl, ustar)
    Gk = sig_k * (1.0 - sig_k) ** 2
    Mk, Tk = obl * wm_k * Gk, obl * ws_k * Gk
    itrans = (ktup + 1)[None, :]
    at_trans = lev == itrans
    Av_tr = take(Av_i, ktup + 1)
    Kv_tr = take(Kv_i, ktup + 1)
    omd = 1.0 - delta
    enhM = omd ** 2 * Mk + delta ** 2 * Av_tr
    enhT = omd ** 2 * Tk + delta ** 2 * Kv_tr
    Av_enh = omd * Av_tr + delta * enhM
    Kv_enh = omd * Kv_tr + delta * enhT
    if cv.kpp_use_enhanceKv:
        blm = jnp.where(at_trans, Av_enh[None, :], blm)
        blt = jnp.where(at_trans, Kv_enh[None, :], blt)
        inside_i = inside_i | (at_trans & (lev <= nb - 1))

    Av_n = jnp.where(inside_i, blm, Av_i)
    Kv_n = jnp.where(inside_i, blt, Kv_i)
    Av_n = jnp.where(interior | (inside_i & active), Av_n, 0.0)
    Kv_n = jnp.where(interior | (inside_i & active), Kv_n, 0.0)
    nonloc = jnp.where(active, nonloc, 0.0)

    # elementwise Av including the surface interface (ref :448-453)
    ae = jnp.take(Av_n, mesh.elem_nodes, axis=-1).mean(-1)
    emask = lev <= (mesh.nlevels_elem - 2)[None, :]
    return replace(state, Kv=Kv_n, Av=jnp.where(emask, ae, 0.0),
                   kpp_nonloc=nonloc, mld1=obl)
