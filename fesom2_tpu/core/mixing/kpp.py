"""FESOM-tuned K-Profile Parameterization (Large et al. 1994) vertical mixing.

Reference: ``src/oce_ale_mixing_kpp.F90`` — oce_mixing_KPP :240-436, bldepth
:479-661, wscale :664-729 (we evaluate the LMD94 eq. B1 velocity-scale
functions analytically instead of through the reference's 2-D lookup table —
the table is built from exactly these formulas, :170-200), ri_iwmix :732-844,
blmix_kpp :936-1122, enhance :1129-1190; constants :48-74 and kpp_init
:97-169.  dbsfc comes from pressure_bv (``oce_ale_pressure_bv.F90:222-231``).

Everything is vectorised over nodes; the level-search loops become masked
argmax reductions.
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ...constants import g, density_0, vcpw
from ...mesh import MeshTables
from ..state import OceanState, Forcing
from .. import eos

# constants (ref :48-74, :97-169)
epsilon_kpp = 0.1
vonk = 0.4
conc1 = 5.0
cstar = 10.0
conam, concm, conc2, zetam = 1.257, 8.380, 16.0, -0.2
conas, concs, conc3, zetas = -28.86, 98.96, 16.0, -1.0
cekman, cmonob = 0.7, 1.0
Riinfty = 0.8
minmix = 3.0e-3


def guard_eps(dtype):
    """Division-guard epsilon for the KPP formulas.

    The reference uses ``epsln = 1.0e-40`` (``oce_ale_mixing_kpp.F90:48``),
    valid for its REAL*8.  In f32 that constant is SUBNORMAL — flushed to
    zero on TPU — so every ``x/(y+epsln)`` guard becomes a divide-by-zero
    (this NaN'd the round-2 benchmark in one step).  Keep the reference
    value in f64 for numerical parity; use 1e-30 (comfortably normal, and
    small enough that guarded quotients stay finite in f32) otherwise.
    """
    return 1.0e-40 if jnp.finfo(dtype).bits >= 64 else 1.0e-30


def _wscale(zehat, us):
    """Turbulent velocity scales (wm, ws) — LMD94 eq. B1, analytic."""
    epsln = guard_eps(jnp.result_type(zehat, us))
    u3 = us ** 3
    zeta = zehat / (u3 + epsln)
    stable_wm = vonk * us / (1.0 + conc1 * zeta)
    wm_uns = jnp.where(zeta > zetam,
                       vonk * us * jnp.abs(1.0 - conc2 * zeta) ** 0.25,
                       vonk * jnp.abs(conam * u3 - concm * zehat) ** (1.0 / 3.0))
    ws_uns = jnp.where(zeta > zetas,
                       vonk * us * jnp.sqrt(jnp.abs(1.0 - conc3 * zeta)),
                       vonk * jnp.abs(conas * u3 - concs * zehat) ** (1.0 / 3.0))
    wm = jnp.where(zehat >= 0.0, stable_wm, wm_uns)
    ws = jnp.where(zehat >= 0.0, stable_wm, ws_uns)
    return wm, ws


def _ri_iwmix(state: OceanState, mesh: MeshTables, cfg):
    """Interior mixing from local shear instability (ref :732-844)."""
    epsln = guard_eps(state.unode.dtype)
    Z3 = state.Z_3d
    dz = Z3[:-1] - Z3[1:]
    dz_inv = 1.0 / jnp.where(dz == 0, 1.0, dz)
    du = (state.unode[:-1] - state.unode[1:]) * dz_inv
    dv = (state.vnode[:-1] - state.vnode[1:]) * dz_inv
    shear = du * du + dv * dv
    Ri = jnp.maximum(state.bvfreq[1:-1], 0.0) / (shear + epsln)
    ratio = jnp.minimum(jnp.maximum(Ri, 0.0) / Riinfty, 1.0)
    frit = (1.0 - ratio * ratio) ** 3
    viscA_i = cfg.dyn.visc_sh_limit * frit + cfg.dyn.A_ver
    diffK_i = cfg.tra.diff_sh_limit * frit + cfg.tra.K_ver
    nl, N = mesh.nl, mesh.n_nodes
    lev = jnp.arange(nl)[:, None]
    nln = mesh.nlevels_node
    viscA = jnp.zeros((nl, N), Ri.dtype).at[1:-1].set(viscA_i)
    diffK = jnp.zeros((nl, N), Ri.dtype).at[1:-1].set(diffK_i)
    # copy edge levels (ref :829-843)
    viscA = viscA.at[0].set(viscA[1])
    diffK = diffK.at[0].set(diffK[1])
    bot = jnp.take_along_axis(viscA, (nln - 2)[None, :].astype(jnp.int32), 0)
    viscA = jnp.where(lev == (nln - 1)[None, :], bot, viscA)
    botd = jnp.take_along_axis(diffK, (nln - 2)[None, :].astype(jnp.int32), 0)
    diffK = jnp.where(lev == (nln - 1)[None, :], botd, diffK)
    imask = lev <= (nln - 1)[None, :]
    return jnp.where(imask, viscA, 0.0), jnp.where(imask, diffK, 0.0)


def _ddmix(diffK, alpha, beta, state: OceanState, mesh: MeshTables):
    """Double-diffusive interior mixing (ref ddmix :857-934): salt
    fingering + diffusive convection, Rrho-dependent (LMD94 eqns. 31-34).
    Takes the shared interior diffusivity and returns (diffK_T, diffK_S).

    Deliberate deviation from the reference (documented): ddmix at
    ``oce_ale_mixing_kpp.F90:880-881`` forms alphaDT = sw_alpha * T with
    the ABSOLUTE tracer values, under which the salt-fingering condition
    alpha*T > beta*S > 0 can essentially never hold (alpha*T ~ 3e-3 vs
    beta*S ~ 2.7e-2 for ocean T/S) — the option is a physical no-op.
    LMD94 and every other implementation (MOM, CVMix cvmix_ddiff) use the
    VERTICAL DIFFERENCES across the interface; we implement that."""
    Rrho0 = 1.9
    dsfmax = 1.0e-4
    visc_mol = 1.5e-6
    nl, N = mesh.nl, mesh.n_nodes
    nln = mesh.nlevels_node
    lev = jnp.arange(nl)[:, None]

    # alphaDT/betaDS at interface k from the layer pair (k-1, k), with the
    # expansion coefficients of layer k-1 (the reference's level choice)
    T, S = state.tr[0], state.tr[1]
    aDT_i = alpha[:-1] * (T[:-1] - T[1:])             # [nl-2, N]: ifaces 1..
    bDS_i = beta[:-1] * (S[:-1] - S[1:])
    zero = jnp.zeros((1, N), aDT_i.dtype)
    aDT = jnp.concatenate([zero, aDT_i, zero], 0)[:nl]
    bDS = jnp.concatenate([zero, bDS_i, zero], 0)[:nl]

    # salt fingering (eqn. 31)
    finger = (aDT > bDS) & (bDS > 0.0)
    Rrho_f = jnp.minimum(aDT / jnp.where(bDS == 0, 1.0, bDS), Rrho0)
    dd = 1.0 - (Rrho_f - 1.0) / (Rrho0 - 1.0)
    dd = dsfmax * dd * dd * dd
    addT = jnp.where(finger, 0.7 * dd, 0.0)
    addS = jnp.where(finger, dd, 0.0)

    # diffusive convection (eqns. 32 + 34)
    dconv = (aDT < 0.0) & (aDT > bDS)
    Rrho_d = aDT / jnp.where(bDS == 0, 1.0, bDS)
    Rsafe = jnp.where(dconv, Rrho_d, 1.0)
    ddc = visc_mol * 0.909 * jnp.exp(
        4.6 * jnp.exp(-0.54 * (1.0 / Rsafe - 1.0)))
    prandtl = jnp.where(Rsafe > 0.5, (1.85 - 0.85 / Rsafe) * Rsafe,
                        0.15 * Rsafe)
    addT = addT + jnp.where(dconv, ddc, 0.0)
    addS = addS + jnp.where(dconv, prandtl * ddc, 0.0)

    # interior interfaces only (nzmin+1 .. nzmax-1), then edge copies
    # (ref :905-930; ulevels == 1 without cavity)
    interior = (lev >= 1) & (lev <= (nln - 2)[None, :])
    diffT = diffK + jnp.where(interior, addT, 0.0)
    diffS = diffK + jnp.where(interior, addS, 0.0)

    def edge_copy(dk):
        dk = dk.at[0].set(dk[1])
        bot = jnp.take_along_axis(dk, (nln - 2)[None, :].astype(jnp.int32), 0)
        return jnp.where(lev == (nln - 1)[None, :], bot, dk)

    return edge_copy(diffT), edge_copy(diffS)


def oce_mixing_kpp(state: OceanState, mesh: MeshTables, cfg,
                   forcing: Forcing) -> OceanState:
    """Full KPP: interior Ri mixing + boundary-layer profile + enhancement."""
    epsln = guard_eps(state.unode.dtype)
    nl, N = mesh.nl, mesh.n_nodes
    nln = mesh.nlevels_node
    lev = jnp.arange(nl)[:, None]
    lmask_lvl = lev <= (nln - 1)[None, :]
    Ricr = cfg.dyn.Ricr
    concv = cfg.dyn.concv
    Vtc = concv * jnp.sqrt(0.2 / concs / epsilon_kpp) / vonk ** 2 / Ricr
    cg = cstar * vonk * (concs * vonk * epsilon_kpp) ** (1.0 / 3.0)

    # ---- surface-referenced shear dVsq [nl, N] (ref :267-315) -----------
    # interface nz uses mean of layers nz-1 and nz (0-based interface k>=1)
    u_i = jnp.concatenate([state.unode[:1],
                           0.5 * (state.unode[:-1] + state.unode[1:]),
                           state.unode[-1:]], 0)[:nl]
    v_i = jnp.concatenate([state.vnode[:1],
                           0.5 * (state.vnode[:-1] + state.vnode[1:]),
                           state.vnode[-1:]], 0)[:nl]
    dVsq = (state.unode[0][None, :] - u_i) ** 2 \
        + (state.vnode[0][None, :] - v_i) ** 2
    dVsq = dVsq.at[0].set(0.0)
    # bottom interface copies the one above (ref :314)
    botv = jnp.take_along_axis(dVsq, (nln - 2)[None, :].astype(jnp.int32), 0)
    dVsq = jnp.where(lev == (nln - 1)[None, :], botv, dVsq)

    # ---- surface buoyancy forcing (ref :341-351) -------------------------
    alpha, beta = eos.sw_alpha_beta(state.tr[0], state.tr[1], state.Z_3d)
    ustar = jnp.sqrt(jnp.sqrt(_node_stress(forcing, mesh)) / density_0)
    Bo = -g * (alpha[0] * forcing.heat_flux / vcpw
               + beta[0] * forcing.water_flux * state.tr[1, 0])

    # ---- interior mixing -------------------------------------------------
    viscA, diffK = _ri_iwmix(state, mesh, cfg)
    use_dd = bool(getattr(cfg.tra, "double_diffusion", False))
    if use_dd:
        # T and S interior diffusivities split (ref :355-358 + ddmix)
        diffK, diffS = _ddmix(diffK, alpha, beta, state, mesh)
    else:
        diffS = diffK

    # ---- bldepth (ref :479-661; use_sw_pene off) ------------------------
    zb = jnp.abs(state.zbar_3d)                 # [nl, N]
    bfsfc = Bo
    stable = 0.5 + 0.5 * jnp.sign(bfsfc)
    sigma0 = stable + (1.0 - stable) * epsilon_kpp
    zehat = vonk * sigma0[None, :] * zb * bfsfc[None, :]
    wm_all, ws_all = _wscale(zehat, ustar[None, :])
    bvsq = state.bvfreq
    Vtsq = zb * ws_all * jnp.sqrt(jnp.abs(bvsq)) * Vtc
    Ritop = zb * state.dbsfc
    Rib = Ritop / (dVsq + Vtsq + epsln)          # [nl, N]
    valid = (lev >= 1) & lmask_lvl
    exceed = (Rib > Ricr) & valid
    has = exceed.any(0)
    first = jnp.argmax(exceed, 0)                # first interface with Rib>Ricr
    kbl = jnp.where(has, first, nln - 1).astype(jnp.int32)
    take = lambda a, idx: jnp.take_along_axis(a, idx[None, :].astype(jnp.int32), 0)[0]
    Rib_k = take(Rib, kbl)
    Rib_km1 = take(jnp.concatenate([jnp.zeros_like(Rib[:1]), Rib[:-1]], 0), kbl)
    Rib_km1 = jnp.where(kbl == 1, 0.0, Rib_km1)
    zk = take(zb, kbl)
    zkm1 = take(zb, jnp.maximum(kbl - 1, 0))
    hbl_interp = zkm1 + (zk - zkm1) * (Ricr - Rib_km1) / (Rib_k - Rib_km1 + epsln)
    hbl_bot = take(zb, (nln - 1).astype(jnp.int32))
    hbl = jnp.where(has, hbl_interp, hbl_bot)

    # Ekman / Monin-Obukhov limits (ref :594-604)
    hekman = cekman * ustar / jnp.maximum(jnp.abs(mesh.coriolis_node), epsln)
    hmonob = cmonob * ustar ** 3 / vonk / (bfsfc + epsln)
    hlimit = stable * jnp.minimum(hekman, hmonob)
    lim = bfsfc > 0.0
    hbl = jnp.where(lim, jnp.minimum(hbl, hlimit), hbl)
    hbl = jnp.where(lim, jnp.maximum(hbl, zb[1]), hbl)

    # new kbl: first level with |zbar| > hbl (ref :615-625)
    deeper = (zb > hbl[None, :]) & valid
    hasd = deeper.any(0)
    kbl = jnp.where(hasd, jnp.argmax(deeper, 0), nln - 1).astype(jnp.int32)
    dzup_k = take(zb, kbl) - take(zb, jnp.maximum(kbl - 1, 0))
    caseA = 0.5 + 0.5 * jnp.sign(take(zb, kbl) - 0.5 * dzup_k - hbl)

    # ---- blmix (ref :936-1122) -------------------------------------------
    h = jnp.where(mesh.node_layer_mask, state.hnode, 0.0)
    dthick = jnp.zeros((nl, N), h.dtype)
    dthick = dthick.at[1:-1].set(0.5 * (h[:-1] + h[1:]))
    dthick = dthick.at[0].set(0.5 * h[0])
    botth = 0.5 * take(h, jnp.maximum(nln - 2, 0).astype(jnp.int32))
    dthick = jnp.where(lev == (nln - 1)[None, :], botth[None, :], dthick)
    dthick = jnp.maximum(dthick, 1e-12)

    # diff_col with bottom copy already handled in _ri_iwmix
    sigma_h = stable + (1.0 - stable) * epsilon_kpp
    zehat_h = vonk * sigma_h * hbl * bfsfc
    wm_h, ws_h = _wscale(zehat_h, ustar)

    kn = jnp.where(caseA > 0.5, kbl - 1, kbl)
    kn = jnp.minimum(kn, nln - 2).astype(jnp.int32)
    knm1 = jnp.maximum(kn - 1, 0).astype(jnp.int32)
    knp1 = jnp.minimum(kn + 1, nln - 1).astype(jnp.int32)

    Z3abs = jnp.abs(state.Z_3d)
    delhat = take(jnp.concatenate([Z3abs, Z3abs[-1:]], 0)[:nl], kn) - hbl
    R = 1.0 - delhat / take(dthick, kn)

    def interp_interior(col):
        dvdzup = (take(col, knm1) - take(col, kn)) / take(dthick, kn)
        dvdzdn = (take(col, kn) - take(col, knp1)) / take(dthick, knp1)
        p = 0.5 * ((1.0 - R) * (dvdzup + jnp.abs(dvdzup))
                   + R * (dvdzdn + jnp.abs(dvdzdn)))
        hcoef = take(col, kn) + p * delhat
        return p, hcoef

    viscp, visch = interp_interior(viscA)
    diftp, difth = interp_interior(diffK)
    if use_dd:
        difsp, difsh = interp_interior(diffS)
    else:
        difsp, difsh = diftp, difth

    f1 = stable * conc1 * bfsfc / (ustar ** 4 + epsln)
    gat1m = visch / (hbl + epsln) / (wm_h + epsln)
    dat1m = jnp.minimum(-viscp / (wm_h + epsln) + f1 * visch, 0.0)
    gat1t = difth / (hbl + epsln) / (ws_h + epsln)
    dat1t = jnp.minimum(-diftp / (ws_h + epsln) + f1 * difth, 0.0)
    gat1s = difsh / (hbl + epsln) / (ws_h + epsln)
    dat1s = jnp.minimum(-difsp / (ws_h + epsln) + f1 * difsh, 0.0)

    # shape functions on all interfaces, masked to nz < kbl
    sig = Z3abs / (hbl[None, :] + epsln)
    sig_full = jnp.concatenate([sig, sig[-1:]], 0)[:nl]
    sigma_i = stable[None, :] * sig_full \
        + (1.0 - stable[None, :]) * jnp.minimum(sig_full, epsilon_kpp)
    zehat_i = vonk * sigma_i * hbl[None, :] * bfsfc[None, :]
    wm_i, ws_i = _wscale(zehat_i, ustar[None, :])
    a1 = sig_full - 2.0
    a2 = 3.0 - 2.0 * sig_full
    a3 = sig_full - 1.0
    Gm = a1 + a2 * gat1m[None, :] + a3 * dat1m[None, :]
    Gt = a1 + a2 * gat1t[None, :] + a3 * dat1t[None, :]
    in_bl = (lev >= 1) & (lev < kbl[None, :]) & lmask_lvl
    blmc_m = jnp.where(in_bl, hbl * wm_i * sig_full * (1.0 + sig_full * Gm), 0.0)
    blmc_t = jnp.where(in_bl, hbl * ws_i * sig_full * (1.0 + sig_full * Gt), 0.0)
    if use_dd:
        Gs = a1 + a2 * gat1s[None, :] + a3 * dat1s[None, :]
        blmc_s = jnp.where(in_bl,
                           hbl * ws_i * sig_full * (1.0 + sig_full * Gs), 0.0)
    ghats = jnp.where(in_bl, (1.0 - stable[None, :]) * cg
                      / (ws_i * hbl[None, :] + epsln), 0.0)

    # dkm1: diffusivities at level kbl-1 (ref :1087-1110)
    sig_k = take(zb, jnp.maximum(kbl - 1, 0)) / (hbl + epsln)
    sigma_k = stable * sig_k + (1.0 - stable) * jnp.minimum(sig_k, epsilon_kpp)
    zehat_k = vonk * sigma_k * hbl * bfsfc
    wm_k, ws_k = _wscale(zehat_k, ustar)
    a1k, a2k, a3k = sig_k - 2.0, 3.0 - 2.0 * sig_k, sig_k - 1.0
    Gm_k = a1k + a2k * gat1m + a3k * dat1m
    Gt_k = a1k + a2k * gat1t + a3k * dat1t
    dkm1_m = hbl * wm_k * sig_k * (1.0 + sig_k * Gm_k)
    dkm1_t = hbl * ws_k * sig_k * (1.0 + sig_k * Gt_k)
    if use_dd:
        Gs_k = a1k + a2k * gat1s + a3k * dat1s
        dkm1_s = hbl * ws_k * sig_k * (1.0 + sig_k * Gs_k)

    # ---- enhance at k = kbl-1 (ref :1129-1190) ---------------------------
    k_enh = jnp.maximum(kbl - 1, 0).astype(jnp.int32)
    zk0 = jnp.take_along_axis(state.zbar_3d, k_enh[None, :], 0)[0]
    zk1 = jnp.take_along_axis(state.zbar_3d,
                              jnp.minimum(k_enh + 1, nl - 1)[None, :], 0)[0]
    delta = (hbl + zk0) / jnp.where(zk0 - zk1 == 0, 1.0, zk0 - zk1)

    def enhanced(interior, blmc, dkm1v):
        at_k = take(interior, k_enh)
        bl_k = take(blmc, k_enh)
        dkmp5 = caseA * at_k + (1.0 - caseA) * bl_k
        dstar = (1.0 - delta) ** 2 * dkm1v + delta ** 2 * dkmp5
        newv = (1.0 - delta) * at_k + delta * dstar
        one_hot = lev == k_enh[None, :]
        return jnp.where(one_hot, newv[None, :], blmc)

    blmc_m = enhanced(viscA, blmc_m, dkm1_m)
    blmc_t = enhanced(diffK, blmc_t, dkm1_t)
    ghats = jnp.where(lev == k_enh[None, :],
                      (1.0 - caseA)[None, :] * ghats, ghats)

    # ---- combine (ref :393-414) ------------------------------------------
    within = (lev >= 1) & (lev < kbl[None, :]) & lmask_lvl
    Kv = jnp.where(within, jnp.maximum(diffK, blmc_t), diffK)
    if use_dd:
        blmc_s = enhanced(diffS, blmc_s, dkm1_s)
        Kv_s = jnp.where(within, jnp.maximum(diffS, blmc_s), diffS)
        Kv_s = jnp.where(lmask_lvl, Kv_s, 0.0)
    viscA = jnp.where(within, jnp.maximum(viscA, blmc_m), viscA)
    Kv = jnp.where(lmask_lvl, Kv, 0.0)

    # element viscosity with surface floor (ref :418-424)
    Av_e = jnp.take(viscA, mesh.elem_nodes, axis=-1).mean(-1)
    emask = lev <= (mesh.nlevels_elem - 1)[None, :]
    Av_e = jnp.where(emask, Av_e, 0.0)
    Av_e = Av_e.at[0].set(jnp.maximum(Av_e[0], minmix))

    # nonlocal transport coefficient min(ghats*blmc, 1) at interfaces, used
    # by the tracer solver when use_kpp_nonlclflx (ref oce_ale_tracer.F90:
    # 688-781); zero at the surface and bottom interfaces by construction
    nln = mesh.nlevels_node
    nonloc = jnp.minimum(ghats * blmc_t, 1.0)
    nonloc = jnp.where((lev >= 1) & (lev < (nln - 1)[None, :]), nonloc, 0.0)
    out = replace(state, Av=Av_e, Kv=Kv, kpp_nonloc=nonloc)
    if use_dd:
        out = replace(out, Kv_s=Kv_s)
    return out


def _node_stress(forcing: Forcing, mesh: MeshTables):
    """stress^2 magnitude averaged from elements to nodes."""
    import jax.numpy as _jnp
    from ..ops import elem_to_node_mean_flat
    sxy = elem_to_node_mean_flat(
        _jnp.stack([forcing.stress_x, forcing.stress_y]), mesh)
    return sxy[0] ** 2 + sxy[1] ** 2
