"""Optional diagnostics (ref ``src/gen_modules_diag.F90``, namelist
&diag_list): surface-stress curl, 3D velocity curl, energy-budget fields,
density-space MOC binning, global salt integral.

TPU design: the reference's per-edge/per-element loops become the shared
gather-based assembly ops; the density-binning scatter of diag_densMOC
becomes an exact-overlap weight tensor contracted on the MXU
(``einsum('lse,le->se')``) instead of the Fortran's sequential
per-bin-edge bookkeeping (:487-545) — same semantics, vectorized.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..mesh import MeshTables
from ..constants import g, density_0, vcpw
from .state import OceanState, Forcing
from .ops import edge_divergence, elem_to_node_mean, scalar_gradient
from .dynamics import relative_vorticity
from . import eos

# standard density classes (sigma_2) for the density-space MOC
# (ref gen_modules_diag.F90:38-49)
STD_DENS = np.array([
    0.0000, 30.00000, 30.55556, 31.11111, 31.36000, 31.66667, 31.91000,
    32.22222, 32.46000, 32.77778, 33.01000, 33.33333, 33.56000, 33.88889,
    34.11000, 34.44444, 34.62000, 35.00000, 35.05000, 35.10622, 35.20319,
    35.29239, 35.37498, 35.41300, 35.45187, 35.52380, 35.59136, 35.65506,
    35.71531, 35.77247, 35.82685, 35.87869, 35.92823, 35.97566, 35.98000,
    36.02115, 36.06487, 36.10692, 36.14746, 36.18656, 36.22434, 36.26089,
    36.29626, 36.33056, 36.36383, 36.39613, 36.42753, 36.45806, 36.48778,
    36.51674, 36.54495, 36.57246, 36.59500, 36.59932, 36.62555, 36.65117,
    36.67621, 36.68000, 36.70071, 36.72467, 36.74813, 36.75200, 36.77111,
    36.79363, 36.81570, 36.83733, 36.85857, 36.87500, 36.87940, 36.89985,
    36.91993, 36.93965, 36.95904, 36.97808, 36.99682, 37.01524, 37.03336,
    37.05119, 37.06874, 37.08602, 37.10303, 37.11979, 37.13630, 37.15257,
    37.16861, 37.18441, 37.50000, 37.75000, 40.00000])


def curl_stress_surf(forcing: Forcing, mesh: MeshTables):
    """Curl of the surface stress at nodes [N]
    (ref diag_curl_stress_surf :100-140)."""
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
    sx, sy = forcing.stress_x, forcing.stress_y
    c = dX1 * sx[et1] + dY1 * sy[et1] \
        + jnp.where(has2, -dX2 * sx[et2s] - dY2 * sy[et2s], 0.0)
    return edge_divergence(c, mesh) / jnp.where(mesh.areasvol[0] > 0,
                                                mesh.areasvol[0], 1.0)


def curl_vel3(state: OceanState, mesh: MeshTables):
    """3D relative vorticity at nodes [nl-1, N] (ref diag_curl_vel3
    :143-216; identical assembly to relative_vorticity)."""
    return relative_vorticity(state, mesh)


def diag_energy(state: OceanState, mesh: MeshTables, forcing: Forcing,
                cfg) -> Dict[str, jnp.ndarray]:
    """Energy-budget diagnostic fields (ref diag_energy :219-385):
    Reynolds products, vertical shear and its Av-weighted products, surface/
    bottom stress work, the horizontal velocity-gradient tensor, rho and
    w*rho at interfaces."""
    lmask = mesh.elem_layer_mask
    nmask = mesh.node_layer_mask
    out: Dict[str, jnp.ndarray] = {}

    un, vn = state.unode, state.vnode
    out["u_x_u"] = jnp.where(nmask, un * un, 0.0)
    out["u_x_v"] = jnp.where(nmask, un * vn, 0.0)
    out["v_x_v"] = jnp.where(nmask, vn * vn, 0.0)

    # element vertical shear (central differences at interior interfaces)
    hsafe = jnp.where(lmask, state.helem, 1.0)
    Ze = -jnp.cumsum(jnp.where(lmask, state.helem, 0.0), 0) \
        + jnp.where(lmask, state.helem, 0.0) / 2.0       # elem mid depths
    dZ = Ze[:-1] - Ze[1:]
    dZi = 1.0 / jnp.where(dZ == 0, 1.0, dZ)
    nl = mesh.nl
    lev = jnp.arange(nl)[:, None]
    imask_e = (lev >= 1) & (lev <= (mesh.nlevels_elem - 2)[None, :])
    dudz = jnp.zeros((nl, mesh.n_elems), un.dtype)
    dudz = dudz.at[1:-1].set((state.u[:-1] - state.u[1:]) * dZi)
    dvdz = jnp.zeros_like(dudz).at[1:-1].set((state.v[:-1] - state.v[1:]) * dZi)
    dudz = jnp.where(imask_e, dudz, 0.0)
    dvdz = jnp.where(imask_e, dvdz, 0.0)
    out["dudz"], out["dvdz"] = dudz, dvdz
    out["av_dudz_sq"] = (dudz ** 2 + dvdz ** 2) * state.Av
    out["av_dudz"] = dudz * state.Av
    out["av_dvdz"] = dvdz * state.Av

    # surface/bottom stress work (C_d bottom drag, ref :276-283)
    C_d = cfg.dyn.C_d
    nle = mesh.nlevels_elem
    bot = jnp.maximum(nle - 2, 0)[None, :]
    ub = jnp.take_along_axis(state.u, bot, 0)[0]
    vb = jnp.take_along_axis(state.v, bot, 0)[0]
    spd = jnp.sqrt(ub ** 2 + vb ** 2)
    out["stress_bott_x"] = -C_d * spd * ub
    out["stress_bott_y"] = -C_d * spd * vb
    out["utau_surf"] = (forcing.stress_x * state.u[0]
                        + forcing.stress_y * state.v[0]) / density_0
    out["utau_bott"] = out["stress_bott_x"] * ub + out["stress_bott_y"] * vb
    out["u_surf"], out["v_surf"] = state.u[0], state.v[0]
    out["u_bott"], out["v_bott"] = ub, vb

    # w*u at element interfaces (thickness-weighted, ref :291-296)
    we = jnp.take(state.w, mesh.elem_nodes, axis=-1).mean(-1)   # [nl, E]
    iup = jnp.maximum(jnp.arange(nl - 1) - 1, 0)
    h_up, h_lo = hsafe[iup], hsafe
    out["u_x_w"] = jnp.where(lmask, we[:-1] * (state.u[iup] * h_up
                             + state.u * h_lo) / (h_up + h_lo), 0.0)
    out["v_x_w"] = jnp.where(lmask, we[:-1] * (state.v[iup] * h_up
                             + state.v * h_lo) / (h_up + h_lo), 0.0)

    # velocity-gradient tensor at nodes: area-weighted mean over adjacent
    # elements of the element gradients of Unode (ref :322-343)
    for name, f in (("dudx", un), ("dudy", un), ("dvdx", vn), ("dvdy", vn)):
        gx, gy = scalar_gradient(f, mesh)
        gsel = gx if name.endswith("x") else gy
        out[name] = elem_to_node_mean(jnp.where(lmask, gsel, 0.0), mesh,
                                      weight_area=True)

    # rho and w*rho at interfaces (thickness-weighted means, ref :300-317)
    hn = jnp.where(nmask, state.hnode_new, 1.0)
    rhof = jnp.zeros((nl, mesh.n_nodes), un.dtype)
    rhof = rhof.at[1:-1].set((hn[1:] * state.density_m_rho0[1:]
                              + hn[:-1] * state.density_m_rho0[:-1])
                             / (hn[1:] + hn[:-1]))
    rhof = rhof.at[0].set(state.density_m_rho0[0])
    nb = (mesh.nlevels_node - 1)[None, :]
    rho_bot = jnp.take_along_axis(state.density_m_rho0,
                                  jnp.maximum(nb - 1, 0), 0)
    rhof = jnp.where(lev == nb, rho_bot, rhof)
    rhof = jnp.where(mesh.node_level_mask, rhof, 0.0)
    out["rhof"] = rhof
    out["wrhof"] = rhof * state.w
    return out


def density_dmoc(state: OceanState, cfg):
    """Potential density referenced to 2000 db (sigma_2 + 1000) at layers
    [nl-1, N] (ref pressure_bv oce_ale_pressure_bv.F90:195-201)."""
    t, s = state.tr[0], state.tr[1]
    bulk_0, bulk_pz, bulk_pz2, rhopot = eos.eos_components(
        t, s, cfg.dyn.state_equation, cfg.run.toy_ocean)
    if cfg.dyn.state_equation == 0:
        return rhopot
    rho = bulk_0 - 2000.0 * (bulk_pz - 2000.0 * bulk_pz2)
    return rho * rhopot / (rho - 200.0)


def diag_dens_moc(state: OceanState, mesh: MeshTables, cfg,
                  forcing: Forcing = None, fer_u=None, fer_v=None,
                  sw_alpha=None, sw_beta=None) -> Dict[str, jnp.ndarray]:
    """Density-space MOC binning (ref diag_densMOC :387-632): per
    (element, layer) the interface-density interval [dmin, dmax] deposits
    transport/volume/depth into the std_dens classes with fractional-overlap
    weights.  The reference approximates the overlap with half-bin edge
    padding (:520-540); here the exact interval overlap is used.

    Returns per-element [S, E] arrays: udz/vdz transports, vol, z (weighted
    depth), w (weights), and the surface buoyancy-flux binning [S, E] x 3.
    """
    S = STD_DENS.shape[0]
    bins = jnp.asarray(STD_DENS, state.u.dtype)
    lmask = mesh.elem_layer_mask
    hsafe = jnp.where(lmask, state.helem, 1.0)

    # element-mean sigma2 at layers, then interface values by thickness
    # interpolation + boundary extrapolation (ref :438-452)
    dmoc = density_dmoc(state, cfg) - 1000.0                 # [nl-1, N]
    aux = jnp.take(dmoc, mesh.elem_nodes, axis=-1).mean(-1)  # [nl-1, E]
    nl = mesh.nl
    dens = jnp.zeros((nl, mesh.n_elems), aux.dtype)
    dens = dens.at[1:-1].set((aux[1:] * hsafe[:-1] + aux[:-1] * hsafe[1:])
                             / (hsafe[:-1] + hsafe[1:]))
    # top/bottom extrapolation
    dens = dens.at[0].set(dens[1] + (dens[1] - dens[2]) * hsafe[0] / hsafe[1])
    nle = mesh.nlevels_elem
    nbE = (nle - 1)[None, :]
    lev = jnp.arange(nl)[:, None]
    d_m1 = jnp.take_along_axis(dens, jnp.maximum(nbE - 1, 0), 0)
    d_m2 = jnp.take_along_axis(dens, jnp.maximum(nbE - 2, 0), 0)
    h_m1 = jnp.take_along_axis(hsafe, jnp.maximum(nbE - 2, 0), 0)
    h_m2 = jnp.take_along_axis(hsafe, jnp.maximum(nbE - 3, 0), 0)
    dens = jnp.where(lev == nbE, d_m1 + (d_m1 - d_m2) * h_m1 / h_m2, dens)

    # per-layer density interval
    dtop, dbot = dens[:-1], dens[1:]                         # [nl-1, E]
    dmin = jnp.minimum(dtop, dbot)
    dmax = jnp.maximum(dtop, dbot)

    # exact overlap of [dmin, dmax] with each density class
    # class s spans [mid(s-1,s), mid(s,s+1)] (midpoints between bin centers)
    mids = 0.5 * (bins[:-1] + bins[1:])
    lo = jnp.concatenate([jnp.asarray([-1e30], bins.dtype), mids])
    hi = jnp.concatenate([mids, jnp.asarray([1e30], bins.dtype)])
    ov = jnp.clip(jnp.minimum(dmax[:, None, :], hi[None, :, None])
                  - jnp.maximum(dmin[:, None, :], lo[None, :, None]),
                  0.0, None)                                  # [nl-1, S, E]
    wsum = ov.sum(1)
    # degenerate (unstratified) layer interval: whole layer into the
    # nearest class (ref else-branch :541-545)
    dmid = 0.5 * (dmin + dmax)
    nearest = (jnp.arange(S)[None, :, None]
               == jnp.argmin(jnp.abs(bins[None, :, None]
                                     - dmid[:, None, :]), 1)[:, None, :])
    w = jnp.where((wsum > 1e-10)[:, None, :],
                  ov / jnp.maximum(wsum, 1e-30)[:, None, :],
                  nearest.astype(ov.dtype))
    w = jnp.where(lmask[:, None, :], w, 0.0)

    u = state.u + (fer_u if fer_u is not None else 0.0)
    v = state.v + (fer_v if fer_v is not None else 0.0)
    udz = jnp.where(lmask, u * state.helem, 0.0)
    vdz = jnp.where(lmask, v * state.helem, 0.0)
    vol = jnp.where(lmask, state.helem, 0.0) * mesh.elem_area[None, :]
    # element interface depths (positive down) for the z-position binning
    depth = jnp.cumsum(jnp.where(lmask, state.helem, 0.0), 0)  # bottom ifaces
    zmid = depth - jnp.where(lmask, state.helem, 0.0) / 2.0

    out = {
        "std_dens_UDZ": jnp.einsum("lse,le->se", w, udz),
        "std_dens_VDZ": jnp.einsum("lse,le->se", w, vdz),
        "std_dens_VOL": jnp.einsum("lse,le->se", w, vol),
        "std_dens_Z": jnp.einsum("lse,le->se", w, -zmid * jnp.where(lmask, 1.0, 0.0)),
        "std_dens_W": w.sum(0),
        "std_dens": bins,
    }

    # surface buoyancy-flux binning into the surface density class
    # (ref :476-484)
    if forcing is not None and sw_alpha is not None:
        en = mesh.elem_nodes
        surf_bin = jnp.argmin(jnp.abs(bins[:, None] - dens[0][None, :]), 0)
        onehot = (jnp.arange(S)[:, None] == surf_bin[None, :]).astype(udz.dtype)
        hf = (jnp.take(sw_alpha[0] * forcing.heat_flux, en, -1).mean(-1)
              / vcpw * mesh.elem_area)
        rf = jnp.take(sw_beta[0] * forcing.relax_salt, en, -1).mean(-1) \
            * mesh.elem_area
        wf = jnp.take(sw_beta[0] * forcing.water_flux * state.tr[1, 0],
                      en, -1).mean(-1) * mesh.elem_area
        out["std_dens_flux_H"] = onehot * hf[None, :]
        out["std_dens_flux_R"] = onehot * rf[None, :]
        out["std_dens_flux_W"] = onehot * wf[None, :]
    return out


def salt3d_integral(state: OceanState, mesh: MeshTables):
    """Global volume integral of salinity (ref compute_diagnostics :649-657,
    integrate_nod gen_support.F90)."""
    vol = jnp.where(mesh.node_layer_mask,
                    state.hnode * mesh.areasvol[:-1], 0.0)
    return (state.tr[1] * vol).sum()


def compute_diagnostics(state: OceanState, mesh: MeshTables, cfg,
                        forcing: Forcing) -> Dict[str, jnp.ndarray]:
    """Dispatch over the &diag_list flags (ref compute_diagnostics
    :635-660); returns all requested diagnostic fields in one dict
    (jit-compatible — the flag set is static config)."""
    out: Dict[str, jnp.ndarray] = {}
    d = cfg.diag
    if d.lcurt_stress_surf:
        out["curl_stress_surf"] = curl_stress_surf(forcing, mesh)
    if d.ldiag_curl_vel3:
        out["curl_vel3"] = curl_vel3(state, mesh)
    if d.ldiag_energy:
        out.update(diag_energy(state, mesh, forcing, cfg))
    if d.ldiag_salt3D:
        out["salt3D_int"] = salt3d_integral(state, mesh)
    if d.ldiag_dMOC:
        al, be = eos.sw_alpha_beta(state.tr[0], state.tr[1], state.Z_3d)
        out.update(diag_dens_moc(state, mesh, cfg, forcing=forcing,
                                 sw_alpha=al, sw_beta=be))
    if d.ldiag_DVD and state.dvd_h.shape[0] >= 2:
        # computed inside the tracer driver (needs advection internals);
        # exposed here as streams (ref io_meandata.F90:503-513)
        out["tr_dvd_horiz_T"] = state.dvd_h[0]
        out["tr_dvd_vert_T"] = state.dvd_v[0]
        out["tr_dvd_horiz_S"] = state.dvd_h[1]
        out["tr_dvd_vert_S"] = state.dvd_v[1]
    return out
