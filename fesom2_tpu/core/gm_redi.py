"""GM (Gent-McWilliams after Ferrari et al. 2010) + Redi isoneutral mixing.

Reference: ``src/oce_fer_gm.F90`` — fer_solve_Gamma :8-123 (vertical BVP for
the eddy streamfunction, tridiagonal per node), fer_gamma2vel :125-157,
init_Redi_GM :159-341; ``src/oce_ale_pressure_bv.F90`` — compute_sigma_xy
:2826-2900, compute_neutral_slope :2905-2950; Redi explicit vertical part
diff_ver_part_redi_expl (``oce_ale_tracer.F90:860-934``).
"""
from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from ..constants import g, density_0, pi
from ..mesh import MeshTables
from .state import OceanState
from .ops import tridiag_solve, elem_to_node_mean
from . import eos


def compute_sigma_xy(state: OceanState, mesh: MeshTables):
    """Area-averaged nodal density gradients [2, nl-1, N] (ref :2826-2900)."""
    alpha, beta = eos.sw_alpha_beta(state.tr[0], state.tr[1], state.Z_3d)
    te = jnp.take(state.tr[0], mesh.elem_nodes, axis=-1)
    se = jnp.take(state.tr[1], mesh.elem_nodes, axis=-1)
    gx_t = (te * mesh.gradient_sca[:, 0:3]).sum(-1)
    gy_t = (te * mesh.gradient_sca[:, 3:6]).sum(-1)
    gx_s = (se * mesh.gradient_sca[:, 0:3]).sum(-1)
    gy_s = (se * mesh.gradient_sca[:, 3:6]).sum(-1)
    tx = elem_to_node_mean(gx_t, mesh)
    ty = elem_to_node_mean(gy_t, mesh)
    sx = elem_to_node_mean(gx_s, mesh)
    sy = elem_to_node_mean(gy_s, mesh)
    m = mesh.node_layer_mask
    sig_x = jnp.where(m, (-alpha * tx + beta * sx) * density_0, 0.0)
    sig_y = jnp.where(m, (-alpha * ty + beta * sy) * density_0, 0.0)
    return jnp.stack([sig_x, sig_y])


def compute_neutral_slope(sigma_xy, bvfreq, mesh: MeshTables):
    """Neutral slope + tanh-tapered slope [3, nl-1, N] (ref :2905-2950)."""
    eps, S_cr, S_d = 5.0e-6, 1.0e-2, 1.0e-3
    nl = mesh.nl
    lay = jnp.arange(nl - 1)[:, None]
    nln = mesh.nlevels_node
    active = (lay >= 1) & (lay <= (nln - 2)[None, :])
    denom = jnp.maximum(bvfreq[:-1] + bvfreq[1:], eps ** 2)
    ro_z_inv = 2.0 * g / density_0 / denom
    s1 = jnp.where(active, sigma_xy[0] * ro_z_inv, 0.0)
    s2 = jnp.where(active, sigma_xy[1] * ro_z_inv, 0.0)
    s3 = jnp.sqrt(s1 ** 2 + s2 ** 2)
    c = 0.5 * (1.0 + jnp.tanh((S_cr - s3) / S_d))
    c = jnp.where((bvfreq[:-1] <= 0.0) | (bvfreq[1:] <= 0.0), 0.0, c)
    tapered = jnp.stack([s1 * c, s2 * c, s3 * c])
    return jnp.stack([s1, s2, s3]), tapered


def init_redi_gm(state: OceanState, mesh: MeshTables, cfg, neutral_slope):
    """Horizontal + vertical (Ferreira) scaling of GM/Redi diffusivities.

    Returns (fer_c [N], fer_K [nl, N], Ki [nl-1, N]).  ref :159-341 with the
    default flags (scaling_Ferreira, scaling_resolution; Rossby off).
    """
    d = cfg.dyn
    nl = mesh.nl
    nln = mesh.nlevels_node
    reso = mesh.resolution
    # first baroclinic wave speed c1 (ref :186-192)
    bv_sqrt = jnp.sqrt(jnp.maximum(state.bvfreq, 0.0))
    hmask = jnp.where(mesh.node_layer_mask, state.hnode_new, 0.0)
    c1 = (hmask * 0.5 * (bv_sqrt[:-1] + bv_sqrt[1:])).sum(0)
    c1 = jnp.maximum(0.5, c1 / pi)
    scaling = jnp.ones_like(reso)
    if d.scaling_resolution:
        scaling = scaling * (reso / 100000.0) ** d.K_GM_resscalorder \
            if hasattr(d, "K_GM_resscalorder") else scaling * (reso / 100000.0) ** 2
    ramp = jnp.maximum((reso / 1000.0 - d.K_GM_rampmin)
                       / (d.K_GM_rampmax - d.K_GM_rampmin), 0.0)
    scaling = jnp.where(reso / 1000.0 < d.K_GM_rampmax, scaling * ramp, scaling)
    fer_scal = jnp.minimum(scaling, 1.0)
    fer_k_surf = jnp.maximum(fer_scal * d.K_GM_max, d.K_GM_min)
    fer_c = c1 * c1

    Ki_surf = cfg.tra.K_hor * (reso / 100000.0) ** 2
    if d.Redi and d.Fer_GM:
        Ki_surf = fer_k_surf

    # vertical Ferreira scaling (ref :259-341; K_GM_bvref=2 mean over ML)
    lev = jnp.arange(nl)[:, None]
    # MLD1_ind approximation: use MLD2-based index stored in state.mld2 depth:
    # find first level deeper than |mld2|
    mld_depth = jnp.abs(state.mld2)
    deeper = jnp.abs(state.zbar_3d) > mld_depth[None, :]
    mld_ind = jnp.maximum(jnp.argmax(deeper, 0), 1)
    in_ml = lev <= mld_ind[None, :]
    bv_ml = jnp.where(in_ml, state.bvfreq, 0.0).sum(0) / jnp.maximum(mld_ind, 1)
    bvref = jnp.maximum(bv_ml, 1e-6)
    zscaling = jnp.clip(state.bvfreq / bvref[None, :], 0.2, 1.0)
    if d.scaling_FESOM14:
        ns3 = neutral_slope[2]
        ns3_lvl = jnp.concatenate([ns3, ns3[-1:]], 0)[:nl]
        zscaling = jnp.where(ns3_lvl > 5.0e-3, 0.0, zscaling)
    fer_K = fer_k_surf[None, :] * zscaling
    Ki = Ki_surf[None, :] * 0.5 * (zscaling[:-1] + zscaling[1:])
    return fer_c, fer_K, Ki


def fer_solve_gamma(state: OceanState, mesh: MeshTables, sigma_xy, fer_c,
                    fer_K):
    """Vertical BVP for the eddy streamfunction Gamma [2, nl, N] (ref :8-123).

    Operator: fer_c * d2/dz2 - max(N^2, 1e-8) with Dirichlet 0 at surface &
    bottom; rhs = (g/rho0) * mean(sigma_xy across layers) * fer_K.
    """
    nl, N = mesh.nl, mesh.n_nodes
    nln = mesh.nlevels_node
    lev = jnp.arange(nl)[:, None]
    hm = jnp.where(mesh.node_layer_mask, state.hnode_new, 0.0)
    # interface/mid depth spacings
    nln_min = _node_min_levels(mesh)
    hsum = jnp.cumsum(jnp.flip(hm, 0), 0)
    zbot = mesh.zbar_n_bot
    zbar_n = jnp.concatenate([zbot[None, :] + jnp.flip(hsum, 0),
                              zbot[None, :]], 0)            # [nl, N]
    Z_n = 0.5 * (zbar_n[:-1] + zbar_n[1:])

    dz_lvl = zbar_n[:-1] - zbar_n[1:]                        # layer thickness
    dz_lvl = jnp.where(dz_lvl == 0, 1.0, dz_lvl)
    dz_mid = Z_n[:-1] - Z_n[1:]                              # between mids
    dz_mid = jnp.where(dz_mid == 0, 1.0, dz_mid)

    interior = (lev >= 1) & (lev <= (nln_min - 1)[None, :] - 0)  # rows 2..nzmax-1
    interior = (lev >= 1) & (lev < (nln_min - 1)[None, :])
    zinv1 = 1.0 / dz_lvl                                     # [nl-1, N]
    a = jnp.zeros((nl, N), hm.dtype)
    c = jnp.zeros((nl, N), hm.dtype)
    a = a.at[1:].set(fer_c[None, :] * zinv1 / jnp.concatenate(
        [dz_mid, dz_mid[-1:]], 0)[:nl - 1])
    c = c.at[1:-1].set(fer_c[None, :] * zinv1[1:] / dz_mid)
    a = jnp.where(interior, a, 0.0)
    c = jnp.where(interior, c, 0.0)
    b = jnp.where(interior,
                  -a - c - jnp.maximum(state.bvfreq, 1e-8), 1.0)

    r = g / density_0
    sig_mid = 0.5 * (jnp.concatenate([sigma_xy[:, :1], sigma_xy], 1)[:, :nl]
                     + jnp.concatenate([sigma_xy, sigma_xy[:, -1:]], 1)[:, :nl])
    rhs1 = jnp.where(interior, r * sig_mid[0] * fer_K, 0.0)
    rhs2 = jnp.where(interior, r * sig_mid[1] * fer_K, 0.0)

    g1 = tridiag_solve(a, b, c, rhs1)
    g2 = tridiag_solve(a, b, c, rhs2)
    ok = lev <= (nln_min - 1)[None, :]
    return jnp.stack([jnp.where(ok, g1, 0.0), jnp.where(ok, g2, 0.0)])


def fer_gamma2vel(gamma, state: OceanState, mesh: MeshTables):
    """Bolus velocity on elements [2, nl-1, E] (ref :125-157)."""
    he = jnp.where(mesh.elem_layer_mask, state.helem, 1.0)
    zinv = (1.0 / 3.0) / he
    en = mesh.elem_nodes
    du = jnp.take(gamma[0, :-1] - gamma[0, 1:], en, axis=-1).sum(-1) * zinv
    dv = jnp.take(gamma[1, :-1] - gamma[1, 1:], en, axis=-1).sum(-1) * zinv
    m = mesh.elem_layer_mask
    return jnp.where(m, du, 0.0), jnp.where(m, dv, 0.0)


def _node_min_levels(mesh: MeshTables):
    from .ops import halo_fix_nodes
    nie = mesh.nod_in_elem
    valid = nie >= 0
    safe = jnp.where(valid, nie, 0)
    nle = jnp.where(valid, jnp.take(mesh.nlevels_elem, safe), 10 ** 6)
    return halo_fix_nodes(nle.min(-1))
