"""Soufflet et al. (2016) baroclinic zonal channel — the reference's minimal
end-to-end configuration (zero I/O, analytic state + zonal relaxation).

Reference: ``src/toy_channel_soufflet.F90`` — initial_state_soufflet :220-343,
relax_zonal_vel :45-76, relax_zonal_temp :78-103, compute_zonal_mean :160-218.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import pi, g, density_0, r_earth
from ..mesh import MeshTables
from ..core.state import OceanState

# parameters (ref :18-37)
TAU_INV = 1.0 / 50.0 / 24.0 / 3600.0
LAT0 = 0.0
YSIZE = 2000000.0
XSIZE = 90018410.49779853
NYBINS = 100
LJET = 1600000.0
RHOMAX = 27.75
SB = 9.8e-6
ZSIZE = 4000.0
DRHO_NO, DRHO_SO = 1.41, 1.4
Z_NO, Z_SO = -400.0, -1000.0
DZ_NO, DZ_SO = 300.0, 700.0
DRHOSURF_NO, DRHOSURF_SO = 0.0, 1.5
ZSURF = -300.0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SouffletStatics:
    Tclim: jnp.ndarray      # [nl-1, N]
    Uclim: jnp.ndarray      # [nl-1, E]
    coriolis: jnp.ndarray   # [E] (beta-plane redefinition, ref :306-310)
    bpos: jnp.ndarray       # [E] i32 meridional bin of each element
    bin_w: jnp.ndarray      # [E] interpolation weight "a" for nodes? (elem none)
    node_nn: jnp.ndarray    # [N, 2] i32 bins for node interpolation
    node_a: jnp.ndarray     # [N] interpolation weight
    znum: jnp.ndarray       # [nl-1, NYBINS] element counts per bin/layer


def _profiles(mesh: MeshTables):
    Z = np.asarray(mesh.Z)
    d_No = Z_NO + (Z - Z_NO) * np.sqrt(1 + 0.5 * (((Z - Z_NO) + np.abs(Z - Z_NO)) / 1.3 / DZ_NO) ** 2)
    d_So = Z_SO + (Z - Z_SO) * np.sqrt(1 + 0.5 * (((Z - Z_SO) + np.abs(Z - Z_SO)) / 1.3 / DZ_SO) ** 2)
    rho_No = (RHOMAX - SB * (Z + ZSIZE) - 0.5 * DRHO_NO * (1 + np.tanh((d_No - Z_NO) / DZ_NO))
              - 1.0 / (2 * np.tanh(1.0)) * DRHOSURF_NO * (1 + np.tanh((ZSURF - Z) / ZSURF)))
    rho_So = (RHOMAX - SB * (Z + ZSIZE) - 0.5 * DRHO_SO * (1 + np.tanh((d_So - Z_SO) / DZ_SO))
              - 1.0 / (2 * np.tanh(1.0)) * DRHOSURF_SO * (1 + np.tanh((ZSURF - Z) / ZSURF)))
    T_No = 10.0 - (rho_No - RHOMAX) / (0.00025 * density_0)
    T_So = 10.0 - (rho_So - RHOMAX) / (0.00025 * density_0)
    return T_No, T_So


def setup_soufflet(mesh: MeshTables, dtype=jnp.float64):
    """Build initial T/S/U state pieces + relaxation statics (ref :220-343)."""
    coords = np.asarray(mesh.coords)
    en = np.asarray(mesh.elem_nodes)
    nle = np.asarray(mesh.nlevels_elem)
    nln = np.asarray(mesh.nlevels_node)
    Z = np.asarray(mesh.Z)
    zbar = np.asarray(mesh.zbar)
    nl = mesh.nl
    N, E = mesh.n_nodes, mesh.n_elems
    dy = YSIZE / NYBINS / r_earth

    T_No, T_So = _profiles(mesh)

    # meridional blending profile (ref :268-284)
    dst = (coords[:, 1] - LAT0) * r_earth
    yn = pi * (YSIZE / LJET) * (dst / YSIZE - 0.5) + pi / 2.0
    Fy = np.where(yn < 0, 1.0, np.where(yn > pi, 0.0,
                                        1.0 - (yn - np.sin(yn) * np.cos(yn)) / pi))
    T = T_So[:, None] + (T_No - T_So)[:, None] * (1.0 - Fy)[None, :]
    lay = np.arange(nl - 1)
    nmask = lay[:, None] < (nln - 1)[None, :]
    T = np.where(nmask, T, 0.0)
    Tclim = T.copy()

    # small perturbation (ref :293-300)
    pert = (-0.1 * np.sin(2 * pi * dst / YSIZE)[None, :]
            * np.exp(2 * Z / ZSIZE)[:, None]
            * (np.sin(8 * pi * coords[:, 0] * r_earth / XSIZE)
               + 0.5 * np.sin(3 * pi * coords[:, 0] * r_earth / XSIZE))[None, :])
    T = np.where(nmask, T + pert, 0.0)

    # beta-plane Coriolis on elements (ref :306-310)
    ecy = coords[en][:, :, 1].mean(1)
    dste = (ecy - LAT0) * r_earth - YSIZE / 2
    coriolis = 1.0e-4 + dste * 1.6e-11

    # geostrophically balanced zonal flow by thermal wind (ref :312-326)
    gsca = np.asarray(mesh.gradient_sca)
    TclimE = Tclim[:, en]                                   # [nl-1, E, 3]
    dTdy = (TclimE * gsca[None, :, 3:6]).sum(-1)            # [nl-1, E]
    shear = (-(0.00025 * density_0) * g / density_0 / coriolis)[None, :] * dTdy
    emask = lay[:, None] < (nle - 1)[None, :]
    shear = np.where(emask, shear, 0.0)
    # vectorised vertical integration (ref :321-325):
    # U(bot) = shear(bot)*(Z(bot)-zbar(bot+1));
    # U(k) = U(k+1) + shear(k+1)*(zbar(k+1)-Z(k+1)) + shear(k)*(Z(k)-zbar(k+1))
    inc_own = shear * (Z[:, None] - zbar[1:, None])         # shear(k)*(Z(k)-zbar(k+1))
    inc_up = shear * (zbar[:-1, None] - Z[:, None])         # shear(k)*(zbar(k)-Z(k)) used by layer k-1
    inc_own = np.where(emask, inc_own, 0.0)
    inc_up = np.where(emask, inc_up, 0.0)
    # U(k) = sum_{j>=k} inc_own(j) + sum_{j>k} inc_up(j)
    rev_own = np.flip(np.cumsum(np.flip(inc_own, 0), 0), 0)
    rev_up = np.flip(np.cumsum(np.flip(inc_up, 0), 0), 0)
    rev_up_below = np.concatenate([rev_up[1:], np.zeros((1, E))], 0)
    U = np.where(emask, rev_own + rev_up_below, 0.0)
    Uclim = U.copy()

    # zonal-mean bin structure (ref compute_zonal_mean_ini :105-158)
    ecy_rel = ecy - LAT0
    bpos = np.clip(np.floor(ecy_rel / dy).astype(np.int64), 0, NYBINS - 1)
    znum = np.zeros((nl - 1, NYBINS))
    for b in range(NYBINS):
        sel = bpos == b
        if sel.any():
            znum[:, b] = emask[:, sel].sum(1)
    # node interpolation bins (ref relax_zonal_temp :86-97)
    yy = coords[:, 1] - LAT0
    nn = np.where(yy < dy / 2, 0, np.floor(yy / dy - 0.5).astype(np.int64))
    nn1 = np.minimum(nn + 1, NYBINS - 1)
    a = np.where(yy < dy / 2, 0.0, yy / dy + 0.5 - (nn + 1))
    node_nn = np.stack([np.clip(nn, 0, NYBINS - 1), nn1], 1)

    # element interpolation (relax_zonal_vel uses element center y the same way)
    f = lambda x: jnp.asarray(x, dtype)
    statics = SouffletStatics(
        Tclim=f(Tclim), Uclim=f(U), coriolis=f(coriolis),
        bpos=jnp.asarray(bpos, jnp.int32), bin_w=f(np.zeros(E)),
        node_nn=jnp.asarray(node_nn, jnp.int32), node_a=f(a),
        znum=f(znum))
    return f(T), f(U), statics


def zonal_means(state: OceanState, mesh: MeshTables, st: SouffletStatics,
                psum=None):
    """Per-bin zonal mean of u (elements) and T (element-mean of nodes).

    ref compute_zonal_mean :160-218.  Returns (zvel, ztem) [nl-1, NYBINS].
    """
    emask = mesh.elem_layer_mask
    u = jnp.where(emask, state.u, 0.0)
    Te = jnp.take(state.tr[0], mesh.elem_nodes, axis=-1).mean(-1)
    Te = jnp.where(emask, Te, 0.0)
    # bin accumulation as a one-hot matmul (MXU) — avoids slow TPU scatters
    onehot = (st.bpos[:, None] == jnp.arange(NYBINS)[None, :]).astype(u.dtype)
    zvel = u @ onehot
    ztem = Te @ onehot
    if psum is not None:
        zvel, ztem = psum(zvel), psum(ztem)
    zvel = zvel / (st.znum + 0.001)
    ztem = ztem / (st.znum + 0.001)
    return zvel, ztem


def _elem_interp(mesh: MeshTables, zfield, st: SouffletStatics):
    """Interpolate a [nl-1, NYBINS] zonal profile to element centers."""
    coords = mesh.coords
    ecy = jnp.take(coords[:, 1], mesh.elem_nodes, axis=0).mean(-1)
    dy = YSIZE / NYBINS / r_earth
    yy = ecy - LAT0
    nn = jnp.where(yy < dy / 2, 0,
                   jnp.floor(yy / dy - 0.5).astype(jnp.int32))
    nn = jnp.clip(nn, 0, NYBINS - 1)
    nn1 = jnp.minimum(nn + 1, NYBINS - 1)
    a = jnp.where(yy < dy / 2, 0.0, yy / dy + 0.5 - (nn + 1))
    return (1.0 - a)[None, :] * zfield[:, nn] + a[None, :] * zfield[:, nn1]


def relax_zonal_vel(state: OceanState, mesh: MeshTables, st: SouffletStatics,
                    dt, u_rhs, zvel):
    """u_rhs += dt*tau_inv*(Uclim - Uzonal) (ref relax_zonal_vel :45-76)."""
    Uzon = _elem_interp(mesh, zvel, st)
    add = dt * TAU_INV * (st.Uclim - Uzon)
    return u_rhs + jnp.where(mesh.elem_layer_mask, add, 0.0)


def relax_zonal_temp(state: OceanState, mesh: MeshTables, st: SouffletStatics,
                     dt, ztem):
    """T += dt*tau_inv*(Tclim - Tzonal) (ref relax_zonal_temp :78-103)."""
    nn = st.node_nn[:, 0]
    nn1 = st.node_nn[:, 1]
    a = st.node_a
    Tzon = (1.0 - a)[None, :] * ztem[:, nn] + a[None, :] * ztem[:, nn1]
    add = dt * TAU_INV * (st.Tclim - Tzon)
    t_new = state.tr[0] + jnp.where(mesh.node_layer_mask, add, 0.0)
    return state.tr.at[0].set(t_new)
