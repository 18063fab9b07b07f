"""Tracer transport: advection scheme library, FCT limiter, diffusion.

Reference:
- driver: do_oce_adv_tra (``src/oce_adv_tra_driver.F90:41-197``),
  oce_tra_adv_flux2dtracer (:201-269), solve_tracers_ale / adv_tracers_ale /
  diff_tracers_ale (``src/oce_ale_tracer.F90:101-330``)
- horizontal fluxes: adv_tra_hor_{upw1:57,muscl:215} (``oce_adv_tra_hor.F90``)
- vertical fluxes: adv_tra_ver_{upw1:231,qr4c:286}, adv_tra_vert_impl:83
  (``oce_adv_tra_ver.F90``)
- FCT limiter: oce_tra_adv_fct (``oce_adv_tra_fct.F90:58-349``)
- MUSCL gradients: fill_up_dn_grad (``oce_muscl_adv.F90:286-447``)
- diffusion: diff_part_hor_redi (``oce_ale_tracer.F90:934-1077``),
  diff_ver_part_impl_ale (:398-860), bc_surface (:1154-1195)

Sign convention: `flux_h[.., Ed]` is counted positive INTO edge node 0, and
each scheme computes ``flux_new = -(scheme expression) - flux_prev`` so a
second call on top of a stored low-order flux directly yields the
antidiffusive flux (exactly the reference's in-place pattern).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..constants import r_earth, vcpw
from ..mesh import MeshTables
from .ops import (tridiag_solve, elem_to_node_mean, edge_divergence,
                  edge_signed_reduce, edge_signed_reduce2, halo_fix_nodes,
                  take_last)
from .tracer_setup import TracerStatics


# --------------------------------------------------------------------------
# gradients
# --------------------------------------------------------------------------
def tracer_gradient_elements(t, mesh: MeshTables):
    """[..., nl-1, N] -> (gx, gy) [..., nl-1, E] (ref oce_tracer_mod.F90:19-45).

    Leading batch axes (tracer stacking) are flattened into the gather's row
    axis (ops.take_last), so a T-tracer call costs one merged gather pass;
    the vertex axis is chunked (running sum) so the [.., E, 3] block never
    materializes in HBM."""
    gx = gy = None
    for j in range(3):
        v = take_last(t, mesh.elem_nodes[:, j])           # [..., nl-1, E]
        gxj = v * mesh.gradient_sca[:, j]
        gyj = v * mesh.gradient_sca[:, 3 + j]
        gx = gxj if gx is None else gx + gxj
        gy = gyj if gy is None else gy + gyj
    m = mesh.elem_layer_mask
    return jnp.where(m, gx, 0.0), jnp.where(m, gy, 0.0)


def tracer_gradient_z(t, Z_3d, mesh: MeshTables):
    """d t / dz on interfaces [..., nl, N] (zero at surface and bottom)."""
    dz = Z_3d[:-1] - Z_3d[1:]
    g = (t[..., :-1, :] - t[..., 1:, :]) / jnp.where(dz == 0, 1.0, dz)
    interior = mesh.node_level_mask[1:-1] & mesh.node_layer_mask[1:]
    g = jnp.where(interior, g, 0.0)
    zrow = jnp.zeros(t.shape[:-2] + (1, t.shape[-1]), t.dtype)
    return jnp.concatenate([zrow, g, zrow], axis=-2)


def fill_up_dn_grad(gx, gy, mesh: MeshTables, st: TracerStatics):
    """edge_up_dn_grad [4, nl-1, Ed] (ref oce_muscl_adv.F90:286-447).

    Components: 0=gx_up, 1=gx_dn, 2=gy_up, 3=gy_dn.  Where both up/downwind
    triangles exist, shared layers take the triangle gradients and deeper
    (non-shared) layers fall back to node-averaged gradients; where either is
    missing, node-averaged gradients are used on all layers (linear Miura).
    """
    up = st.edge_up_dn_tri[:, 0]
    dn = st.edge_up_dn_tri[:, 1]
    both = (up >= 0) & (dn >= 0)
    ups = jnp.where(both, up, 0)
    dns = jnp.where(both, dn, 0)

    # node-averaged gradients (area-weighted, level-aware); gx/gy stacked so
    # the nod_in_elem gather and the four edge gathers each run ONCE on a
    # merged operand (per-index gather cost dominates on TPU)
    gxy = jnp.stack([gx, gy])                             # [2, ..., nl-1, E]
    gn = elem_to_node_mean(gxy, mesh)                     # [2, ..., nl-1, N]
    n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]

    # shared layer range: nz < min(nlevels_nod2D_min(ednodes)) - 1 (0-based)
    nln_min = st.nln_min if st.nln_min is not None else _node_min_levels(mesh)
    shared = jnp.arange(mesh.nl - 1)[:, None] < \
        (jnp.minimum(nln_min[n0], nln_min[n1]) - 1)[None, :]
    use_tri = shared & both[None, :]

    g_up = take_last(gxy, ups)                            # [2, ..., nl-1, Ed]
    g_dn = take_last(gxy, dns)
    gn0 = take_last(gn, n0)
    gn1 = take_last(gn, n1)
    e0 = jnp.where(use_tri, g_up[0], gn0[0])
    e1 = jnp.where(use_tri, g_dn[0], gn1[0])
    e2 = jnp.where(use_tri, g_up[1], gn0[1])
    e3 = jnp.where(use_tri, g_dn[1], gn1[1])
    # tuple, NOT jnp.stack: the stacked [4, .., nl-1, Ed] copy costs
    # ~850 MB of peak HBM at CORE2+ scale with batched tracers
    return (e0, e1, e2, e3)


def _muscl_dxdy(mesh: MeshTables):
    """The static per-edge reconstruction factors (ref :281,:306): dx
    includes the cos blend a, dy the earth radius."""
    et2 = mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    cos1 = mesh.elem_cos[mesh.edge_tri[:, 0]]
    cos2 = mesh.elem_cos[jnp.where(has2, et2, 0)]
    a = jnp.where(has2, 0.5 * (cos1 + cos2), cos1) * r_earth
    dx = mesh.edge_dxdy[:, 0] * a
    dy = mesh.edge_dxdy[:, 1] * r_earth
    return dx, dy


def fill_up_dn_grad_r(gx, gy, mesh: MeshTables, st: TracerStatics):
    """fill_up_dn_grad with the MUSCL direction factors folded in at the
    gather site: returns (R1, R2) with R1 = dx*eg0 + dy*eg2 and
    R2 = dx*eg1 + dy*eg3 — the only combinations _muscl_reconstruct
    consumes (oce_adv_tra_hor.F90:301-309).  Halves the reconstruction's
    HBM footprint vs materializing the 4 per-edge gradient components
    (the batched-tracer pipeline OOM'd a 16 GB chip at 188k without it)."""
    up = st.edge_up_dn_tri[:, 0]
    dn = st.edge_up_dn_tri[:, 1]
    both = (up >= 0) & (dn >= 0)
    ups = jnp.where(both, up, 0)
    dns = jnp.where(both, dn, 0)
    gxy = jnp.stack([gx, gy])
    gn = elem_to_node_mean(gxy, mesh)
    n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]
    nln_min = st.nln_min if st.nln_min is not None else _node_min_levels(mesh)
    shared = jnp.arange(mesh.nl - 1)[:, None] < \
        (jnp.minimum(nln_min[n0], nln_min[n1]) - 1)[None, :]
    use_tri = shared & both[None, :]
    dx, dy = _muscl_dxdy(mesh)

    g_up = take_last(gxy, ups)
    r_up = dx * g_up[0] + dy * g_up[1]
    g_dn = take_last(gxy, dns)
    r_dn = dx * g_dn[0] + dy * g_dn[1]
    gn0 = take_last(gn, n0)
    r_n0 = dx * gn0[0] + dy * gn0[1]
    gn1 = take_last(gn, n1)
    r_n1 = dx * gn1[0] + dy * gn1[1]
    R1 = jnp.where(use_tri, r_up, r_n0)
    R2 = jnp.where(use_tri, r_dn, r_n1)
    return R1, R2


def _node_min_levels(mesh: MeshTables):
    nie = mesh.nod_in_elem
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    nle = jnp.where(valid, jnp.take(mesh.nlevels_elem, safe), 10 ** 6)
    return halo_fix_nodes(nle.min(-1))


# --------------------------------------------------------------------------
# helpers: per-edge element transports
# --------------------------------------------------------------------------
def _edge_vflux(u, v, helem, mesh: MeshTables):
    """vflux [nl-1, Ed]: volume transport through the dual edge face,
    as contribution c1 (from el1, masked) + c2 (from el2, masked).
    (u*h, v*h) are stacked so each edge-triangle gather runs once."""
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
    lmask = mesh.elem_layer_mask
    he = jnp.where(lmask, helem, 0.0)
    uvh = jnp.stack([u * he, v * he])          # [2, nl-1, E]
    q1 = take_last(uvh, et1)                   # [2, nl-1, Ed]
    q2 = take_last(uvh, et2s)
    c1 = -q1[1] * dX1[None] + q1[0] * dY1[None]
    c2 = jnp.where(has2[None, :], q2[1] * dX2[None] - q2[0] * dY2[None], 0.0)
    return c1 + c2


def _edge_union_mask(mesh: MeshTables):
    """[nl-1, Ed] True where at least one adjacent element is active."""
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    lmask = mesh.elem_layer_mask
    return lmask[:, et1] | (lmask[:, et2s] & has2[None, :])


# --------------------------------------------------------------------------
# horizontal advection schemes
# --------------------------------------------------------------------------
def _mpow(x, moment: int):
    """x**do_Xmoment for the reconstructed face values; moment=2 gives the
    2nd-moment (squared-tracer) transport used by the DVD diagnostic
    (ref oce_adv_tra_hor.F90:144, oce_adv_tra_ver.F90:278 etc.)."""
    return x * x if moment == 2 else x


def adv_hor_upw1(t, u, v, helem, mesh: MeshTables, flux_prev=None,
                 moment: int = 1, vflux=None):
    """First-order upwind horizontal flux (ref adv_tra_hor_upw1 :57-213)."""
    if vflux is None:
        vflux = _edge_vflux(u, v, helem, mesh)
    t1 = _mpow(take_last(t, mesh.edges[:, 0]), moment)
    t2 = _mpow(take_last(t, mesh.edges[:, 1]), moment)
    av = jnp.abs(vflux)
    expr = 0.5 * (t1 * (vflux + av) + t2 * (vflux - av))
    flux = -expr
    if flux_prev is not None:
        flux = flux - flux_prev
    return flux


def _muscl_reconstruct(t1, t2, R1, R2, mesh: MeshTables, st: TracerStatics,
                       dtype, boundary_fallback: bool):
    """Interface values (tm1, tm2) from the endpoint values and the
    direction-folded up/down gradients R1/R2 (fill_up_dn_grad_r;
    ref oce_adv_tra_hor.F90:301-309)."""
    n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]
    if boundary_fallback:
        nz1 = jnp.arange(mesh.nl - 1)[:, None] + 1               # 1-based layer
        c1 = (st.nboundary_lay[n0][None, :] >= nz1).astype(dtype)
        c2 = (st.nboundary_lay[n1][None, :] >= nz1).astype(dtype)
    else:
        c1 = c2 = jnp.ones((), dtype)
    common = 2.0 * (t2 - t1)
    tm1 = t1 + (common + R1) / 6.0 * c1
    tm2 = t2 - (common + R2) / 6.0 * c2
    return tm1, tm2


def _eg_to_r(eg, mesh: MeshTables):
    """Fold a 4-component edge_up_dn_grad into the (R1, R2) combinations."""
    dx, dy = _muscl_dxdy(mesh)
    return dx * eg[0] + dy * eg[2], dx * eg[1] + dy * eg[3]


def adv_hor_muscl(t, u, v, helem, mesh: MeshTables, st: TracerStatics,
                  eg, num_ord, flux_prev=None, moment: int = 1,
                  boundary_fallback: bool = True, vflux=None):
    """MUSCL horizontal flux (ref adv_tra_hor_muscl :215-485).

    With ``boundary_fallback=False`` this is the reference's MFCT scheme
    (adv_tra_hor_mfct :485-734): the two routines are line-identical except
    that MUSCL zeroes the high-order reconstruction correction at nodes
    within ``nboundary_lay`` of the lateral boundary (the ``c_lo`` factors,
    oce_adv_tra_hor.F90:262-267) while MFCT keeps it everywhere."""
    if vflux is None:
        vflux = _edge_vflux(u, v, helem, mesh)
    t1 = take_last(t, mesh.edges[:, 0])
    t2 = take_last(t, mesh.edges[:, 1])
    R1, R2 = _eg_to_r(eg, mesh)
    tm1, tm2 = _muscl_reconstruct(t1, t2, R1, R2, mesh, st, t.dtype,
                                  boundary_fallback)
    av = jnp.abs(vflux)
    cHO = (vflux + av) * _mpow(tm1, moment) + (vflux - av) * _mpow(tm2, moment)
    expr = 0.5 * (1.0 - num_ord) * cHO \
        + vflux * num_ord * _mpow(0.5 * (tm1 + tm2), moment)
    flux = -expr
    if flux_prev is not None:
        flux = flux - flux_prev
    return flux


def adv_hor_muscl_r(t, vflux, mesh: MeshTables, st: TracerStatics, rec,
                    num_ord, moment: int = 1,
                    boundary_fallback: bool = True):
    """adv_hor_muscl with a precomputed vflux and the direction-folded
    (R1, R2) reconstruction pair (fill_up_dn_grad_r)."""
    t1 = take_last(t, mesh.edges[:, 0])
    t2 = take_last(t, mesh.edges[:, 1])
    tm1, tm2 = _muscl_reconstruct(t1, t2, rec[0], rec[1], mesh, st,
                                  t.dtype, boundary_fallback)
    av = jnp.abs(vflux)
    cHO = (vflux + av) * _mpow(tm1, moment) + (vflux - av) * _mpow(tm2, moment)
    expr = 0.5 * (1.0 - num_ord) * cHO \
        + vflux * num_ord * _mpow(0.5 * (tm1 + tm2), moment)
    return -expr


def adv_hor_lo_ho(t, tAB, vflux, mesh: MeshTables, st: TracerStatics,
                  rec, num_ord, moment: int = 1, scheme: str = "MUSCL"):
    """Fused LO (upwind of t) + HO antidiffusive (scheme of tAB) horizontal
    fluxes: returns (flux_lo, flux_adf) with flux_adf already minus the LO
    flux — exactly adv_hor_upw1 followed by adv_hor_{muscl,mfct,upw1}
    (flux_prev=LO), but the endpoint gathers of t and tAB are merged into
    one gather per edge endpoint (the driver pattern of
    oce_adv_tra_driver.F90:83-135).  ``rec`` is the (R1, R2) pair from
    fill_up_dn_grad_r."""
    pair = jnp.stack([t, tAB])                    # [2, ..., nl-1, N]
    p1 = take_last(pair, mesh.edges[:, 0])        # [2, ..., nl-1, Ed]
    p2 = take_last(pair, mesh.edges[:, 1])
    av = jnp.abs(vflux)
    t1 = _mpow(p1[0], moment)
    t2 = _mpow(p2[0], moment)
    flux_lo = -0.5 * (t1 * (vflux + av) + t2 * (vflux - av))
    if scheme in ("MUSCL", "MFCT"):
        tm1, tm2 = _muscl_reconstruct(p1[1], p2[1], rec[0], rec[1], mesh,
                                      st, t.dtype,
                                      boundary_fallback=(scheme == "MUSCL"))
    else:                                          # UPW1 high-order pass
        tm1, tm2 = p1[1], p2[1]
    cHO = (vflux + av) * _mpow(tm1, moment) + (vflux - av) * _mpow(tm2, moment)
    if scheme in ("MUSCL", "MFCT"):
        expr = 0.5 * (1.0 - num_ord) * cHO \
            + vflux * num_ord * _mpow(0.5 * (tm1 + tm2), moment)
    else:
        expr = 0.5 * cHO
    flux_adf = -expr - flux_lo
    return flux_lo, flux_adf


# --------------------------------------------------------------------------
# vertical advection schemes
# --------------------------------------------------------------------------
def adv_ver_upw1(t, w, mesh: MeshTables, flux_prev=None, moment: int = 1):
    """First-order upwind vertical flux [nl, N] (ref :231-284).

    Deliberate deviation: the reference does not raise the surface flux to
    ``moment`` (oce_adv_tra_ver.F90:263 lacks do_Xmoment while :278-279
    have it), which makes the DVD diagnostic spuriously nonzero in the
    surface layer even for a uniform tracer.  We exponentiate all faces
    consistently."""
    area = mesh.area
    nln = mesh.nlevels_node
    uln0 = (mesh.ulevels_node - 1).astype(jnp.int32)
    lev = jnp.arange(mesh.nl)[:, None]
    aw = jnp.abs(w)
    t_above = _mpow(jnp.concatenate([t[..., :1, :], t], -2), moment)
    t_below = _mpow(jnp.concatenate([t, t[..., -1:, :]], -2), moment)
    interior = 0.5 * (t_below * (w + aw) + t_above * (w - aw)) * area
    from .ops import take_row
    surf = take_row(w, uln0) * _mpow(take_row(t, uln0), moment) \
        * take_row(area, uln0)                   # [..., N]
    expr = jnp.where(lev == uln0[None, :], surf[..., None, :], interior)
    expr = jnp.where(lev < uln0[None, :], 0.0, expr)        # above cavity
    expr = jnp.where(lev >= (nln - 1)[None, :], 0.0, expr)  # zero bottom flux
    flux = -expr
    if flux_prev is not None:
        flux = flux - flux_prev
    return flux


def adv_ver_qr4c(t, w, Z3, zb3, mesh: MeshTables, num_ord, flux_prev=None,
                 moment: int = 1):
    """QR4C 3rd/4th-order vertical flux (ref adv_tra_ver_qr4c :286-360)."""
    nl = mesh.nl
    nln = mesh.nlevels_node
    lev = jnp.arange(nl)[:, None]
    area = mesh.area

    # padded layer arrays aligned on the interface axis k: interface k sits
    # between layer k-1 (above) and layer k (below)
    def cat(parts):
        return jnp.concatenate(parts, -2)[..., :nl, :]
    t1r, tLr = t[..., :1, :], t[..., -1:, :]
    tm1 = cat([t1r, t])                       # t[k-1]
    t0 = cat([t, tLr])                        # t[k]
    tm2 = cat([t1r, t1r, t])                  # t[k-2]
    tp1 = cat([t[..., 1:, :], tLr, tLr])      # t[k+1]

    Zm1 = jnp.concatenate([Z3[:1], Z3], 0)[:nl]
    Z0 = jnp.concatenate([Z3, Z3[-1:]], 0)[:nl]
    Zm2 = jnp.concatenate([Z3[:1], Z3[:1], Z3], 0)[:nl]
    Zp1 = jnp.concatenate([Z3[1:], Z3[-1:], Z3[-1:]], 0)[:nl]

    def safediff(a, b):
        d = a - b
        return jnp.where(d == 0, 1.0, d)

    qc = (tm1 - t0) / safediff(Zm1, Z0)
    qu = (t0 - tp1) / safediff(Z0, Zp1)
    qd = (tm2 - tm1) / safediff(Zm2, Zm1)
    Tmean1 = t0 + (2.0 * qc + qu) * (zb3 - Z0) / 3.0
    Tmean2 = tm1 + (2.0 * qc + qd) * (zb3 - Zm1) / 3.0
    aw = jnp.abs(w)
    # deviation from ref (:352-354 exponentiates only the inner high-order
    # faces): centered/surface special rows are exponentiated too, so the
    # 2nd-moment transport is face-consistent and uniform-tracer DVD
    # vanishes
    Tup = (w + aw) * _mpow(Tmean1, moment) + (w - aw) * _mpow(Tmean2, moment)
    inner = (0.5 * (1.0 - num_ord) * Tup
             + num_ord * _mpow(0.5 * (Tmean1 + Tmean2), moment) * w) * area

    centered = _mpow(0.5 * (tm1 + t0), moment) * w * area
    from .ops import take_row
    uln0 = (mesh.ulevels_node - 1).astype(jnp.int32)
    surf = take_row(w, uln0) * _mpow(take_row(t, uln0), moment) \
        * take_row(area, uln0)                   # [..., N]

    is_surf = lev == uln0[None, :]
    is_bot = (lev >= (nln - 1)[None, :]) | (lev < uln0[None, :])
    is_cent = (lev == uln0[None, :] + 1) | (lev == (nln - 2)[None, :])
    expr = jnp.where(is_cent, centered, inner)
    expr = jnp.where(is_surf, surf[..., None, :], expr)
    expr = jnp.where(is_bot, 0.0, expr)
    flux = -expr
    if flux_prev is not None:
        flux = flux - flux_prev
    return flux


def adv_ver_cdiff(t, w, mesh: MeshTables, flux_prev=None, moment: int = 1):
    """Centered-difference vertical flux (ref adv_tra_ver_cdiff :542-590)."""
    area = mesh.area
    nln = mesh.nlevels_node
    uln0 = (mesh.ulevels_node - 1).astype(jnp.int32)
    lev = jnp.arange(mesh.nl)[:, None]
    tm1 = jnp.concatenate([t[..., :1, :], t], -2)[..., :mesh.nl, :]
    t0 = jnp.concatenate([t, t[..., -1:, :]], -2)[..., :mesh.nl, :]
    interior = _mpow(0.5 * (tm1 + t0), moment) * w * area
    from .ops import take_row
    surf = take_row(w, uln0) * _mpow(take_row(t, uln0), moment) \
        * take_row(area, uln0)
    expr = jnp.where(lev == uln0[None, :], surf[..., None, :], interior)
    expr = jnp.where(lev < uln0[None, :], 0.0, expr)
    expr = jnp.where(lev >= (nln - 1)[None, :], 0.0, expr)
    flux = -expr
    if flux_prev is not None:
        flux = flux - flux_prev
    return flux


def adv_ver_ppm(t, w, hnode_old, hnode_new, mesh: MeshTables, dt,
                flux_prev=None, moment: int = 1):
    """Piecewise-parabolic vertical flux (Colella & Woodward 1984).

    ref adv_tra_vert_ppm (``oce_adv_tra_ver.F90:361-538``): non-uniform-grid
    interface reconstruction (eq. 1.6-1.8) on hnode_NEW, monotonized parabola
    per layer, CFL-dependent upwind flux on hnode_OLD.
    """
    nl, N = mesh.nl, t.shape[-1]
    nln = mesh.nlevels_node
    lev = jnp.arange(nl)[:, None]
    lmask = mesh.node_layer_mask
    hN = jnp.where(lmask, hnode_new, 1.0)
    hO = jnp.where(lmask, hnode_old, 1.0)

    def layshift(arr, s):
        if s < 0:
            return jnp.concatenate([jnp.repeat(arr[:1], -s, 0), arr], 0)[:nl - 1]
        if s > 0:
            return jnp.concatenate([arr[s:], jnp.repeat(arr[-1:], s, 0)], 0)[:nl - 1]
        return arr

    # interface-aligned layer quantities: interface i uses layers i-2..i+1
    def iface(arr_lay, s):
        # value of layer (i-1+s) on the interface axis [nl, N]
        padded = jnp.concatenate([jnp.repeat(arr_lay[:1], 2, 0), arr_lay,
                                  jnp.repeat(arr_lay[-1:], 2, 0)], 0)
        return padded[1 + s: 1 + s + nl]

    tA, tB, tC, tD = iface(t, -1), iface(t, 0), iface(t, 1), iface(t, 2)
    hA, hB, hC, hD = iface(hN, -1), iface(hN, 0), iface(hN, 1), iface(hN, 2)

    def slope(hm, h0, hp, tm, t0_, tp):
        d = h0 / (hm + h0 + hp) * (
            (2.0 * hm + h0) / (hp + h0) * (tp - t0_)
            + (h0 + 2.0 * hp) / (hm + h0) * (t0_ - tm))
        mono = (tp - t0_) * (t0_ - tm) > 0.0
        lim = jnp.minimum(jnp.abs(d),
                          jnp.minimum(2.0 * jnp.abs(tp - t0_),
                                      2.0 * jnp.abs(t0_ - tm))) * jnp.sign(d)
        return jnp.where(mono, lim, 0.0)

    deltaj = slope(hA, hB, hC, tA, tB, tC)
    deltajp1 = slope(hB, hC, hD, tB, tC, tD)
    tv_int = (tB + hB / (hB + hC) * (tC - tB)
              + 1.0 / (hA + hB + hC + hD) * (
                  (2.0 * hC * hB) / (hB + hC)
                  * ((hA + hB) / (2.0 * hB + hC) - (hD + hC) / (2.0 * hC + hB))
                  * (tC - tB)
                  - hB * (hA + hB) / (2.0 * hB + hC) * deltajp1
                  + hC * (hC + hD) / (hB + 2.0 * hC) * deltaj))

    # special interfaces (ref :407-416); surface row = ulevels-1
    from .ops import take_row
    uln0 = (mesh.ulevels_node - 1).astype(jnp.int32)
    t_up = jnp.concatenate([t[:1], t], 0)[:nl]          # t[i-1]
    t_dn = jnp.concatenate([t, t[-1:]], 0)[:nl]         # t[i]
    tv = tv_int
    tv = jnp.where(lev <= uln0[None, :], take_row(t, uln0)[None, :], tv)
    tv = jnp.where(lev == uln0[None, :] + 1, 0.5 * (t_up + t_dn), tv)
    upw = jnp.where(w >= 0, t_dn, t_up)                 # note ref sign select
    tv = jnp.where(lev == (nln - 2)[None, :], upw, tv)
    bot_t = jnp.take_along_axis(t_dn, (nln - 2)[None, :].astype(jnp.int32), 0)
    tv = jnp.where(lev >= (nln - 1)[None, :], bot_t, tv)

    # per-layer monotonized parabola (ref :499-520)
    aL = tv[:-1]                                        # [nl-1, N]
    aR = tv[1:]
    over = (aR - t) * (t - aL) <= 0.0
    aL = jnp.where(over, t, aL)
    aR = jnp.where(over, t, aR)
    steepL = (aR - aL) * (t - 0.5 * (aL + aR)) > (aR - aL) ** 2 / 6.0
    aL = jnp.where(steepL, 3.0 * t - 2.0 * aR, aL)
    steepR = (aR - aL) * (t - 0.5 * (aR + aL)) < -(aR - aL) ** 2 / 6.0
    aR = jnp.where(steepR, 3.0 * t - 2.0 * aL, aR)
    aj = 6.0 * (t - 0.5 * (aL + aR))

    # interface fluxes (ref :522-536): from the layer below when W>0,
    # from the layer above when W<0
    # moment is applied to the NEGATED reconstruction before the W*area
    # factor (ref :517-525) — for moment=2 the minus sign vanishes, a
    # reference quirk kept for DVD parity
    w_lay = w[:-1]                                      # interface i == W at top of layer i
    x_up = jnp.minimum(w_lay * dt / hO, 1.0)
    from_below = _mpow(-aL - 0.5 * x_up * (aR - aL + (1.0 - 2.0 / 3.0 * x_up)
                                           * aj), moment) \
        * mesh.area[:-1] * w_lay
    w_dn = w[1:]
    x_dn = jnp.minimum(-w_dn * dt / hO, 1.0)
    from_above = _mpow(-aR + 0.5 * x_dn * (aR - aL - (1.0 - 2.0 / 3.0 * x_dn)
                                           * aj), moment) \
        * mesh.area[1:] * w_dn

    tvert = jnp.zeros((nl, N), t.dtype)
    tvert = tvert.at[:-1].set(jnp.where(w_lay > 0, from_below, 0.0))
    tvert = tvert.at[1:].add(jnp.where(w_dn < 0, from_above, 0.0))
    # surface + bottom overrides (ref :530-533)
    surf = -_mpow(take_row(tv, uln0), moment) * take_row(w, uln0) \
        * take_row(mesh.area, uln0)
    tvert = jnp.where(lev == uln0[None, :], surf[None, :], tvert)
    tvert = jnp.where(lev < uln0[None, :], 0.0, tvert)
    tvert = jnp.where(lev >= (nln - 1)[None, :], 0.0, tvert)
    flux = tvert
    if flux_prev is not None:
        flux = flux - flux_prev
    return flux


def adv_vert_impl(t, w, hnode_new, mesh: MeshTables, dt):
    """Implicit vertical advection tridiagonal update (ref :83-230)."""
    nl, N = mesh.nl, t.shape[-1]
    nln = mesh.nlevels_node
    lay = jnp.arange(nl - 1)[:, None]
    lmask = mesh.node_layer_mask
    is_surf = lay == 0
    is_bot = lay == (nln - 2)[None, :]

    ratio_up = dt * mesh.area[:-1] / jnp.where(mesh.areasvol[:-1] > 0,
                                               mesh.areasvol[:-1], 1.0)
    ratio_dn = dt * mesh.area[1:] / jnp.where(mesh.areasvol[:-1] > 0,
                                              mesh.areasvol[:-1], 1.0)
    wu = w[:-1]
    wd = w[1:]
    a = jnp.where(is_surf, 0.0, jnp.minimum(0.0, wu) * ratio_up)
    b_up = jnp.where(is_surf, wu * ratio_up, jnp.maximum(0.0, wu) * ratio_up)
    b_dn = jnp.where(is_bot, 0.0, -jnp.minimum(0.0, wd) * ratio_dn)
    c = jnp.where(is_bot, 0.0, -jnp.maximum(0.0, wd) * ratio_dn)
    h = jnp.where(lmask, hnode_new, 1.0)
    b = h + b_up + b_dn

    t_up = jnp.concatenate([jnp.zeros_like(t[:1]), t[:-1]], 0)
    t_dn = jnp.concatenate([t[1:], jnp.zeros_like(t[:1])], 0)
    rhs = -a * t_up - (b - h) * t - c * jnp.where(is_bot, 0.0, t_dn)
    a = jnp.where(lmask, a, 0.0)
    c = jnp.where(lmask, c, 0.0)
    b = jnp.where(lmask, b, 1.0)
    rhs = jnp.where(lmask, rhs, 0.0)
    dtr = tridiag_solve(a, b, c, rhs)
    return t + jnp.where(lmask, dtr, 0.0)


# --------------------------------------------------------------------------
# FCT limiter
# --------------------------------------------------------------------------
def fct_limiter(ttf, lo, adf_h, adf_v, mesh: MeshTables, dt):
    """Zalesak FCT (ref oce_tra_adv_fct.F90:58-349, vlimit=1).

    Returns limited (adf_h, adf_v).
    """
    flux_eps = 1e-16
    bignumber = 1e3
    nmask = mesh.node_layer_mask
    emask = mesh.elem_layer_mask

    # a1: node max/min of (LO, ttf).  The min-side fields ride stacked with
    # the max side, NEGATED, so every a2/a3 gather+reduce pair runs as a
    # single merged gather + max (per-index gather cost dominates on TPU;
    # -max(-x) == min(x) exactly in IEEE float).
    tmax = jnp.where(nmask, jnp.maximum(lo, ttf), -bignumber)
    tmin = jnp.where(nmask, jnp.minimum(lo, ttf), bignumber)

    # a2: elementwise max/min over vertices (one merged gather pass,
    # chunked over the 3 vertex slots so the [.., E, 3] block never lands
    # in HBM)
    tpair = jnp.stack([tmax, -tmin])                   # [2, ..., nl-1, N]
    tep = None
    for j in range(3):
        v = take_last(tpair, mesh.elem_nodes[:, j])    # [2, ..., nl-1, E]
        tep = v if tep is None else jnp.maximum(tep, v)
    tep = jnp.where(emask, tep, -bignumber)

    # a3 (vlimit=1): cluster max/min over adjacent elements, +-1 layer
    # (one merged gather pass, chunked over the incidence slots)
    nie = mesh.nod_in_elem
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    clp = None
    for kk in range(nie.shape[-1]):
        v = jnp.where(valid[:, kk], take_last(tep, safe[:, kk]), -bignumber)
        clp = v if clp is None else jnp.maximum(clp, v)
    clp = halo_fix_nodes(clp)                          # [2, ..., nl-1, N]
    cl_max, cl_min = clp[0], -clp[1]
    up_max = jnp.concatenate([cl_max[..., :1, :], cl_max[..., :-1, :]], -2)
    dn_max = jnp.concatenate([cl_max[..., 1:, :], cl_max[..., -1:, :]], -2)
    up_min = jnp.concatenate([cl_min[..., :1, :], cl_min[..., :-1, :]], -2)
    dn_min = jnp.concatenate([cl_min[..., 1:, :], cl_min[..., -1:, :]], -2)
    nln = mesh.nlevels_node
    lay = jnp.arange(mesh.nl - 1)[:, None]
    interior = (lay >= 1) & (lay <= (nln - 3)[None, :])
    vmax = jnp.where(interior, jnp.maximum(cl_max, jnp.maximum(up_max, dn_max)), cl_max)
    vmin = jnp.where(interior, jnp.minimum(cl_min, jnp.minimum(up_min, dn_min)), cl_min)
    inc_max = jnp.where(nmask, vmax - lo, 0.0)
    inc_min = jnp.where(nmask, vmin - lo, 0.0)

    # b1: positive/negative antidiffusive sums (one merged edge gather)
    pv = jnp.maximum(0.0, adf_v[..., :-1, :]) + jnp.maximum(0.0, -adf_v[..., 1:, :])
    mv = jnp.minimum(0.0, adf_v[..., :-1, :]) + jnp.minimum(0.0, -adf_v[..., 1:, :])
    hplus, hminus = edge_signed_reduce2(adf_h, mesh)
    fplus = pv + hplus
    fminus = mv + hminus

    # b2: limiting factors
    av = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)
    fplus = jnp.minimum(1.0, inc_max / (fplus * dt / av + flux_eps))
    fminus = jnp.minimum(1.0, inc_min / (fminus * dt / av - flux_eps))
    fplus = jnp.where(nmask, fplus, 0.0)
    fminus = jnp.where(nmask, fminus, 0.0)

    # b3 vertical: ae from donor/receiver cells (ref :284-313)
    ones = jnp.full_like(fplus[..., :1, :], 1.0)
    fplus_up = jnp.concatenate([ones, fplus[..., :-1, :]], -2)
    fminus_up = jnp.concatenate([ones, fminus[..., :-1, :]], -2)
    pos = adf_v[..., :-1, :] >= 0.0
    lev = jnp.arange(mesh.nl - 1)[:, None]
    ae_surf = jnp.where(pos, fplus, fminus)
    ae_int = jnp.where(pos, jnp.minimum(fminus_up, fplus),
                       jnp.minimum(fplus_up, fminus))
    ae_v = jnp.where(lev == 0, ae_surf, ae_int)
    ae_v = jnp.clip(ae_v, None, 1.0)
    adf_v = jnp.concatenate([adf_v[..., :-1, :] * ae_v, adf_v[..., -1:, :]],
                            -2)

    # b3 horizontal: donor/receiver factors (one merged gather per endpoint)
    n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]
    fpm = jnp.stack([fplus, fminus])                   # [2, ..., nl-1, N]
    f0 = take_last(fpm, n0)                            # [2, ..., nl-1, Ed]
    f1 = take_last(fpm, n1)
    posh = adf_h >= 0.0
    ae_h = jnp.where(posh,
                     jnp.minimum(f0[0], f1[1]),
                     jnp.minimum(f0[1], f1[0]))
    ae_h = jnp.clip(ae_h, None, 1.0)
    adf_h = adf_h * ae_h
    return adf_h, adf_v


# --------------------------------------------------------------------------
# flux -> tracer increments
# --------------------------------------------------------------------------
def flux2dtracer(flux_h, flux_v, mesh: MeshTables, dt,
                 ttf=None, lo=None, hnode=None, hnode_new=None):
    """(ref oce_tra_adv_flux2dtracer :201-269). Returns (dttf_h, dttf_v)."""
    av = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)
    nmask = mesh.node_layer_mask
    dttf_v = (flux_v[..., :-1, :] - flux_v[..., 1:, :]) * dt / av
    if lo is not None:
        dttf_v = dttf_v - ttf * hnode + lo * hnode_new
    dttf_h = edge_divergence(flux_h, mesh) * dt / av
    return jnp.where(nmask, dttf_h, 0.0), jnp.where(nmask, dttf_v, 0.0)


# --------------------------------------------------------------------------
# diffusion
# --------------------------------------------------------------------------
def diff_hor(gx, gy, helem, Ki_node, mesh: MeshTables, dt,
             tr_z=None, slope_tapered=None):
    """Explicit horizontal (+Redi isoneutral) diffusion (ref :934-1077).

    gx/gy are CURRENT-step tracer gradients on elements.  Ki_node is [N] or
    layered [nl-1, N].  With `tr_z` [nl, N] and `slope_tapered` [3, nl-1, N]
    given, the Redi cross terms Kh*(Sx*Tz, Sy*Tz) are added (isredi=1)."""
    from .ops import take_multi
    et1, et2 = mesh.edge_tri[:, 0], mesh.edge_tri[:, 1]
    has2 = et2 >= 0
    et2s = jnp.where(has2, et2, 0)
    dX1, dY1 = mesh.edge_cross_dxdy[:, 0], mesh.edge_cross_dxdy[:, 1]
    dX2, dY2 = mesh.edge_cross_dxdy[:, 2], mesh.edge_cross_dxdy[:, 3]
    n0, n1 = mesh.edges[:, 0], mesh.edges[:, 1]
    lmask = mesh.elem_layer_mask
    m1 = lmask[:, et1]
    m2 = lmask[:, et2s] & has2[None, :]
    both = m1 & m2

    he = jnp.where(lmask, helem, 0.0)
    # one merged gather per edge-triangle side for (gx, gy, he)
    (gx1, gy1, h1), (gx2, gy2, h2) = take_multi([gx, gy, he], et1, et2s)

    if tr_z is not None and slope_tapered is not None:
        # Redi cross terms (ref :984-991): Tz at layer mid from the two
        # bounding interfaces, averaged over the edge's two nodes; the node
        # fields (Ki, Sx*Tz, Sy*Tz) ride one merged gather per endpoint
        Tz_lay = 0.5 * (tr_z[..., :-1, :] + tr_z[..., 1:, :])  # [.., nl-1, N]
        SxTz_n = Tz_lay * slope_tapered[0]
        SyTz_n = Tz_lay * slope_tapered[1]
        (ki0, sx0, sy0), (ki1, sx1, sy1) = take_multi(
            [Ki_node, SxTz_n, SyTz_n], n0, n1)
        Kh = 0.5 * (ki0 + ki1)
        SxTz = 0.5 * (sx0 + sx1)
        SyTz = 0.5 * (sy0 + sy1)
        gx1 = gx1 + SxTz
        gy1 = gy1 + SyTz
        gx2 = gx2 + SxTz
        gy2 = gy2 + SyTz
    else:
        ki0, ki1 = take_multi([Ki_node], n0, n1)
        Kh = 0.5 * (ki0[0] + ki1[0])
        if Ki_node.ndim == 1:
            Kh = Kh[None, :]

    # shared layers: mean gradient, mean h, combined (dX2-dX1) stencil;
    # single-sided layers: one element only
    c_both = ((dX2 - dX1)[None] * Kh * 0.5 * (gy1 + gy2)
              - (dY2 - dY1)[None] * Kh * 0.5 * (gx1 + gx2)) * 0.5 * (h1 + h2)
    c_el1 = (-dX1[None] * Kh * gy1 + dY1[None] * Kh * gx1) * h1
    c_el2 = (dX2[None] * Kh * gy2 - dY2[None] * Kh * gx2) * h2
    c = jnp.where(both, c_both, jnp.where(m1, c_el1, 0.0) + jnp.where(m2 & ~m1, c_el2, 0.0))
    # NOTE: below min-depth one side can continue (D/E cases) — handled by the
    # jnp.where chain: both -> combined; only el1 -> c_el1; only el2 -> c_el2.

    av = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)
    # gather-based signed edge assembly (TPU scatters serialize; the raw
    # .at[].add here was also the one assembly without a halo-exchange
    # hook, leaving ring-1 tr halos stale under the distributed runtime)
    out = edge_divergence(c, mesh)
    return jnp.where(mesh.node_layer_mask, out * dt / av, 0.0)


def diff_ver_redi_expl(gx, gy, slope_tapered, Ki_layered, hnode_new,
                       mesh: MeshTables, dt):
    """Explicit vertical Redi flux from horizontal gradients (ref :860-934).

    Returns a tracer increment [nl-1, N].  gx/gy are the element tracer
    gradients of the CURRENT step (tr_xy).
    """
    # node-averaged gradients: tx/(3*areasvol) with elem_area weights
    # (gx, gy stacked through one merged nod_in_elem gather)
    nie = mesh.nod_in_elem
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    w = jnp.where(valid, jnp.take(mesh.elem_area, safe), 0.0)
    lm = jnp.take(mesh.elem_layer_mask, safe, axis=-1)
    wl = jnp.where(lm, w[None], 0.0)
    av = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)
    # chunked over incidence slots: the [2, .., nl-1, N, K] gathered block
    # is GB-scale at CORE2+ sizes with batched tracers
    gxy2 = jnp.stack([gx, gy])
    acc = None
    for kk in range(nie.shape[-1]):
        v = take_last(gxy2, safe[:, kk]) * wl[..., kk]
        acc = v if acc is None else acc + v
    txy = halo_fix_nodes(acc / 3.0 / av)
    tx, ty = txy[0], txy[1]

    # actual interface/mid depths
    lmask = mesh.node_layer_mask
    hm = jnp.where(lmask, hnode_new, 0.0)
    nln = mesh.nlevels_node
    zbot = mesh.zbar_n_bot
    hsum = jnp.cumsum(jnp.flip(hm, 0), 0)
    zbar_n = jnp.concatenate([zbot[None, :] + jnp.flip(hsum, 0),
                              zbot[None, :]], 0)
    Z_n = 0.5 * (zbar_n[:-1] + zbar_n[1:])
    dZ = Z_n[:-1] - Z_n[1:]
    dZ = jnp.where(dZ == 0, 1.0, dZ)

    sxt = slope_tapered[0] * tx + slope_tapered[1] * ty      # [.., nl-1, N]
    ks = Ki_layered * sxt
    # interface flux (interior interfaces 1..nl-2)
    fa = (Z_n[:-1] - zbar_n[1:-1]) * ks[..., :-1, :]
    fb = (zbar_n[1:-1] - Z_n[1:]) * ks[..., 1:, :]
    vd = (fa + fb) / dZ * mesh.area[1:-1]
    lev = jnp.arange(mesh.nl)[:, None]
    interior = (lev >= 1) & (lev <= (nln - 2)[None, :])
    zrow = jnp.zeros(vd.shape[:-2] + (1, vd.shape[-1]), gx.dtype)
    vd_full = jnp.concatenate([zrow, vd, zrow], -2)
    vd_full = jnp.where(interior, vd_full, 0.0)
    out = (vd_full[..., :-1, :] - vd_full[..., 1:, :]) * dt / av
    return jnp.where(lmask, out, 0.0)


def shortwave_penetration(shortwave, a_ice, zbar_3d, mesh: MeshTables,
                          albw: float, chl_const: float = 0.1):
    """Penetrating visible shortwave through interfaces, Morel & Antoine 1994
    parametrization with Sweeney et al. 2005 coefficients and constant
    chlorophyll (ref cal_shortwave_rad oce_shortwave_pene.F90:1-95; chl=0.1
    from gen_forcing_init.F90:129).

    Returns (sw_3d [nl, N] temperature flux through interfaces [K m/s],
    dheat [N] to ADD to heat_flux — the visible fraction is removed from the
    surface flux and deposited in depth instead). No penetration under ice.
    """
    # compile-time Python constants (a jnp scalar chain here materializes
    # as strong f64 under x64 and silently promotes the whole sw_3d field)
    import math
    c = math.log10(max(chl_const, 0.02))
    c2, c3, c4, c5 = c * c, c ** 3, c ** 4, c ** 5
    v1 = 0.008 * c + 0.132 * c2 + 0.038 * c3 - 0.017 * c4 - 0.007 * c5
    v2 = 0.679 - v1
    v1 = 0.321 + v1
    sc1 = 1.54 - 0.197 * c + 0.166 * c2 - 0.252 * c3 - 0.055 * c4 + 0.042 * c5
    sc2 = 7.925 - 6.644 * c + 3.662 * c2 - 1.815 * c3 - 0.218 * c4 + 0.502 * c5

    open_w = a_ice <= 0.0
    swsurf = jnp.where(open_w, (1.0 - albw) * shortwave * 0.54, 0.0)   # [N]
    swflux = swsurf / vcpw
    aux = v1 * jnp.exp(zbar_3d / sc1) + v2 * jnp.exp(zbar_3d / sc2)    # [nl, N]
    lev = jnp.arange(mesh.nl)[:, None]
    nln = mesh.nlevels_node[None, :]
    # reference zeroes the flux at the first interface where aux < 1e-5 and
    # exits the loop; also always zero at/below the bottom interface
    dead = jnp.cumsum((aux < 1e-5).astype(aux.dtype), 0) > 0
    sw = jnp.where(dead | (lev >= nln - 1), 0.0, swflux[None, :] * aux)
    sw = sw.at[0].set(swflux)
    return sw, swsurf


def sw_3d_source(sw_3d, mesh: MeshTables, dt):
    """Layer temperature source from the interface flux divergence
    (ref oce_ale_tracer.F90:784-790)."""
    ratio = mesh.area[1:] / jnp.where(mesh.areasvol[:-1] > 0,
                                      mesh.areasvol[:-1], 1.0)
    src = (sw_3d[:-1] - sw_3d[1:] * ratio) * dt
    return jnp.where(mesh.node_layer_mask, src, 0.0)


def salt_plume(S, state, mesh: MeshTables, forcing, cfg):
    """Salt-plume parameterization: brine rejected by growing ice is removed
    from the surface layer and redistributed over the mixed layer with
    (Z1-Zk)^5 weights — Northern Hemisphere, Nguyen 2011 criterion
    (ref cal_rejected_salt/app_rejected_salt oce_spp.F90:1-69).

    S [nl-1, N] salinity; returns the updated salinity.
    """
    from ..constants import rhoice, rhowat, density_0, g
    dt = cfg.dt
    Sice = cfg.ice.Sice
    n_distr = 5
    drhodz_cri = 0.01
    S0 = S[0]

    rej = jnp.where(forcing.thdgr > 0.0,
                    (S0 - Sice) * forcing.thdgr * (rhoice / rhowat) * dt
                    * mesh.area[0], 0.0)                      # [N]
    apply = (rej > 0.0) & (S0 >= 10.0) & (mesh.geo_coords[:, 1] > 0.0)

    # mixed-layer extent: first layer k with drho/dz >= cri or Z_k < -50 m
    drhodz = state.bvfreq[:-1] * density_0 / g                # layer-indexed
    cond = (drhodz >= drhodz_cri) | (state.Z_3d < -50.0)      # [nl-1, N]
    lay = jnp.arange(mesh.nl - 1)[:, None]
    cond = cond | (lay >= (mesh.nlevels_node - 2)[None, :])   # stop above bottom
    n_cont = jnp.argmax(cond, 0)                              # deepest layer
    recv = (lay >= 1) & (lay <= n_cont[None, :])              # layers 1..kml

    w = mesh.area[:-1] * state.hnode \
        * (state.Z_3d[0][None, :] - state.Z_3d) ** n_distr
    w = jnp.where(recv, w, 0.0)
    wsum = w.sum(0)
    ok = apply & (n_cont >= 1) & (wsum > 0.0)
    w = w / jnp.where(wsum > 0, wsum, 1.0)[None, :]

    hsafe = jnp.where(mesh.node_layer_mask, state.hnode, 1.0)
    asafe = jnp.where(mesh.areasvol[:-1] > 0, mesh.areasvol[:-1], 1.0)
    dS = rej[None, :] * w / asafe / hsafe                     # additions
    dS = dS.at[0].set(-rej / asafe[0] / hsafe[0])             # removal
    return jnp.where(ok[None, :] & mesh.node_layer_mask, S + dS, S)


def bc_surface(tracer_id: int, t_surf, forcing, dt, is_nonlinfs: float):
    """Surface boundary source (ref bc_surface :1154-1195)."""
    if tracer_id == 0:
        return -dt * (forcing.heat_flux / vcpw
                      + t_surf * forcing.water_flux * is_nonlinfs)
    if tracer_id == 1:
        return dt * (forcing.virtual_salt + forcing.relax_salt
                     - forcing.real_salt_flux * is_nonlinfs)
    if tracer_id == 101:
        # rain-water passive tracer: sourced by liquid precipitation
        # (ref :1178)
        return dt * forcing.prec_rain
    # 301-303 region-restored tracers and unknown ids: no surface source
    return jnp.zeros_like(t_surf)


def diff_ver_impl(t, Kv, hnode_new, zbar_n_bot, mesh: MeshTables, dt,
                  surf_bc, w_i=None, sw_source=None, Ki_layered=None,
                  slope3=None):
    """Implicit vertical diffusion (ref diff_ver_part_impl_ale :398-860).

    `surf_bc` [N] is the bc_surface source added to the top row; `w_i` adds
    the implicit vertical-advection split when not using FCT.  With
    `Ki_layered` [nl-1,N] and tapered-slope magnitude `slope3` [nl-1,N] the
    Redi K33 = Ki*S^2 augmentation is added to Kv (isredi=1, ref :548-590).
    """
    nl = mesh.nl
    nln = mesh.nlevels_node
    lay = jnp.arange(nl - 1)[:, None]
    lmask = mesh.node_layer_mask
    is_surf = lay == (mesh.ulevels_node - 1)[None, :]
    is_bot = lay == (nln - 2)[None, :]

    # actual interface/mid depths from hnode_new (ref :536-548)
    hm = jnp.where(lmask, hnode_new, 0.0)
    hsum = jnp.cumsum(jnp.flip(hm, 0), 0)
    zbar_n = jnp.concatenate([zbar_n_bot[None, :] + jnp.flip(hsum, 0),
                              zbar_n_bot[None, :]], 0)       # [nl, N]
    Z_n = 0.5 * (zbar_n[:-1] + zbar_n[1:])

    dZ = Z_n[:-1] - Z_n[1:]                                  # [nl-2, N]
    dZ = jnp.where(dZ == 0, 1.0, dZ)
    ratio_up = mesh.area[:-1] / jnp.where(mesh.areasvol[:-1] > 0,
                                          mesh.areasvol[:-1], 1.0)
    ratio_dn = mesh.area[1:] / jnp.where(mesh.areasvol[:-1] > 0,
                                         mesh.areasvol[:-1], 1.0)

    Kv_eff = Kv
    if Ki_layered is not None and slope3 is not None:
        # K33 interface augmentation Ty = weighted mean of Ki*S^2 from the
        # two layers bounding each interior interface (ref :548-556)
        ks2 = Ki_layered * slope3 ** 2                       # [nl-1, N]
        wa = (Z_n[:-1] - zbar_n[1:-1]) / dZ                  # above-layer weight
        wb = (zbar_n[1:-1] - Z_n[1:]) / dZ
        Ty = wa * ks2[:-1] + wb * ks2[1:]                    # [nl-2, N]
        Kv_eff = Kv.at[1:-1].add(jnp.where(jnp.isfinite(Ty), Ty, 0.0))
    a = jnp.zeros_like(t).at[1:].set(-Kv_eff[1:-1] / dZ * dt)
    a = a * ratio_up
    a = jnp.where(is_surf, 0.0, a)
    c = jnp.zeros_like(t).at[:-1].set(-Kv_eff[1:-1] / dZ * dt)
    c = c * ratio_dn
    c = jnp.where(is_bot, 0.0, c)
    h = jnp.where(lmask, hnode_new, 1.0)
    b = -a - c + h

    if w_i is not None:
        wu, wd = w_i[:-1], w_i[1:]
        zinv = dt
        a = a + jnp.where(is_surf, 0.0, jnp.minimum(0.0, wu)) * zinv * ratio_up
        b = b + jnp.where(is_surf, wu, jnp.maximum(0.0, wu)) * zinv * ratio_up
        b = b - jnp.where(is_bot, 0.0, jnp.minimum(0.0, wd)) * zinv * ratio_dn
        c = c - jnp.where(is_bot, 0.0, jnp.maximum(0.0, wd)) * zinv * ratio_dn

    t_up = jnp.concatenate([jnp.zeros_like(t[:1]), t[:-1]], 0)
    t_dn = jnp.concatenate([t[1:], jnp.zeros_like(t[:1])], 0)
    rhs = -a * t_up - (b - h) * t - jnp.where(is_bot, 0.0, c * t_dn)
    rhs = rhs + jnp.where(is_surf, surf_bc[None, :], 0.0)
    if sw_source is not None:
        rhs = rhs + sw_source

    a = jnp.where(lmask, a, 0.0)
    c = jnp.where(lmask, c, 0.0)
    b = jnp.where(lmask, b, 1.0)
    rhs = jnp.where(lmask, rhs, 0.0)
    dtr = tridiag_solve(a, b, c, rhs)
    return t + jnp.where(lmask, dtr, 0.0)
