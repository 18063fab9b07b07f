"""3D tracer initial conditions from climatology netCDF.

Reference: ``src/gen_ic3d.F90:1-656`` (trilinear interpolation with nearest
extrapolation into unfilled cells) and the in-situ -> potential temperature
conversion insitu2pot / ptheta / atg
(``src/oce_ale_pressure_bv.F90:2930-2731``).
"""
from __future__ import annotations

import numpy as np

from ..constants import rad
from ..mesh import MeshTables
from ..io.netcdf import read_vars


def atg(s, t, p):
    """Adiabatic temperature gradient [C/dbar] (Bryden 1973; ref :2704-2731)."""
    ds = s - 35.0
    return (((-2.1687e-16 * t + 1.8676e-14) * t - 4.6206e-13) * p
            + ((2.7759e-12 * t - 1.1351e-10) * ds
               + ((-5.4481e-14 * t + 8.733e-12) * t - 6.7795e-10) * t
               + 1.8741e-8)) * p \
        + (-4.2393e-8 * t + 1.8932e-6) * ds \
        + ((6.6228e-10 * t - 6.836e-8) * t + 8.5258e-6) * t + 3.5803e-5


def ptheta(s, t, p, pr=0.0):
    """Potential temperature via RK4 (ref ptheta :2659-2699), vectorised."""
    t = np.array(t, dtype=np.float64, copy=True)
    p = np.array(p, dtype=np.float64, copy=True)
    h = pr - p
    xk = h * atg(s, t, p)
    t = t + 0.5 * xk
    q = xk
    p = p + 0.5 * h
    xk = h * atg(s, t, p)
    t = t + 0.29289322 * (xk - q)
    q = 0.58578644 * xk + 0.121320344 * q
    xk = h * atg(s, t, p)
    t = t + 1.707106781 * (xk - q)
    q = 3.414213562 * xk - 4.121320344 * q
    p = p + 0.5 * h
    xk = h * atg(s, t, p)
    return t + (xk - 2.0 * q) / 6.0


def _fill_missing(field, missing_mask, n_pass=60):
    """Iterative nearest-neighbor fill of masked cells (lateral + vertical)."""
    f = np.where(missing_mask, np.nan, field)
    for _ in range(n_pass):
        if not np.isnan(f).any():
            break
        shifted = []
        for ax, sh in ((2, 1), (2, -1), (1, 1), (1, -1), (0, 1)):
            s = np.roll(f, sh, axis=ax)
            if ax == 1:   # latitude: do not wrap
                if sh == 1:
                    s[:, 0, :] = np.nan
                else:
                    s[:, -1, :] = np.nan
            if ax == 0:   # depth: only fill downward from above
                s[0, :, :] = np.nan
            shifted.append(s)
        stack = np.stack(shifted)
        # explicit all-NaN handling (nanmean would warn on empty slices):
        # cells with no filled neighbor this pass stay NaN for the next pass
        cnt = (~np.isnan(stack)).sum(axis=0)
        tot = np.nansum(np.where(np.isnan(stack), 0.0, stack), axis=0)
        fill = np.where(cnt > 0, tot / np.maximum(cnt, 1), np.nan)
        f = np.where(np.isnan(f), fill, f)
    # cells unreachable by the flood fill (enclosed basins below the deepest
    # data level): fill with the horizontal mean of their depth level, which
    # is a physically sane stand-in for T/S (0.0 was not)
    if np.isnan(f).any():
        lvl_cnt = (~np.isnan(f)).sum(axis=(1, 2))
        lvl_tot = np.nansum(np.where(np.isnan(f), 0.0, f), axis=(1, 2))
        glob = lvl_tot.sum() / max(lvl_cnt.sum(), 1)
        lvl_mean = np.where(lvl_cnt > 0, lvl_tot / np.maximum(lvl_cnt, 1),
                            glob)
        f = np.where(np.isnan(f), lvl_mean[:, None, None], f)
    return f


def climatology_ic(mesh: MeshTables, path: str,
                   temp_var="temp", salt_var="salt", t_insitu=True):
    """Trilinear-interpolate WOA-style [depth, lat, lon] T/S onto mesh columns.

    Returns (T, S) as [nl-1, N] numpy arrays (potential temperature).
    """
    d = read_vars(path, ["lon", "lat", "depth", temp_var, salt_var])
    lon = d["lon"].astype(np.float64)
    lat = d["lat"].astype(np.float64)
    dep = np.abs(d["depth"].astype(np.float64))
    T = d[temp_var].astype(np.float64)
    S = d[salt_var].astype(np.float64)
    miss = (~np.isfinite(T) | ~np.isfinite(S) | (np.abs(T) > 1e10)
            | (np.abs(S) > 1e10) | (S <= 0))
    T = _fill_missing(T, miss)
    S = _fill_missing(S, miss)

    glon = np.mod(np.asarray(mesh.geo_coords)[:, 0] / rad, 360.0)
    if lon.min() < -1.0:    # grid in [-180, 180)
        glon = np.where(glon > 180.0, glon - 360.0, glon)
    glat = np.asarray(mesh.geo_coords)[:, 1] / rad

    nx, ny = lon.size, lat.size
    dxg = lon[1] - lon[0]
    i0 = np.clip(np.floor((glon - lon[0]) / dxg).astype(np.int64), 0, nx - 1)
    i1 = (i0 + 1) % nx
    wx = np.clip((glon - lon[i0]) / dxg, 0.0, 1.0)
    j0 = np.clip(np.searchsorted(lat, glat) - 1, 0, ny - 2)
    j1 = j0 + 1
    wy = np.clip((glat - lat[j0]) / (lat[j1] - lat[j0]), 0.0, 1.0)

    Z = -np.asarray(mesh.Z)                     # positive depths of layers
    nz = dep.size
    k0 = np.clip(np.searchsorted(dep, Z) - 1, 0, nz - 2)
    k1 = k0 + 1
    wz = np.clip((Z - dep[k0]) / (dep[k1] - dep[k0]), 0.0, 1.0)

    def tri(F):
        # horizontal bilinear at both bracketing depth levels, then linear in z
        def horiz(k):       # k: [nl-1] depth indices -> [nl-1, N]
            f = F[k]                                 # [nl-1, ny, nx]
            v00 = f[np.arange(len(k))[:, None], j0[None, :], i0[None, :]]
            v01 = f[np.arange(len(k))[:, None], j0[None, :], i1[None, :]]
            v10 = f[np.arange(len(k))[:, None], j1[None, :], i0[None, :]]
            v11 = f[np.arange(len(k))[:, None], j1[None, :], i1[None, :]]
            return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
                    + wy * ((1 - wx) * v10 + wx * v11))
        va = horiz(k0)
        vb = horiz(k1)
        return (1 - wz)[:, None] * va + wz[:, None] * vb

    Tn = tri(T)
    Sn = tri(S)
    if t_insitu:
        Tn = ptheta(Sn, Tn, np.abs(Z)[:, None] * np.ones_like(Tn))
    mask = np.asarray(mesh.node_layer_mask)
    return np.where(mask, Tn, 0.0), np.where(mask, Sn, 0.0)
