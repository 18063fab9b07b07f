"""Plotting helpers for unstructured FESOM-style output (replaces
``view/modules/fesom_plot_tools.py``: ftriplot :6, wplot_xy :91,
wplot_yz :150, movingaverage :163).

Pure matplotlib — the reference uses Basemap for map projections, which is
not a baked-in dependency here; ``ftriplot`` draws in plate-carree
(lon/lat) coordinates with optional north/south polar views, which is what
the projection choice in the reference amounts to for quick-look plots.
"""
from __future__ import annotations

import numpy as np

from .mesh_loader import PostMesh


def _non_cyclic_elems(mesh: PostMesh, max_span_deg: float = 100.0):
    """Triangles that do not wrap the periodic seam (the reference
    precomputes ``mesh.no_cyclic_elem`` in load_mesh; we derive it here)."""
    x = mesh.x2[mesh.elem]
    span = x.max(axis=1) - x.min(axis=1)
    return np.nonzero(span < max_span_deg)[0]


def ftriplot(mesh: PostMesh, data, contours=None, cmap=None, oce="global",
             do_cbar=True, extend="both", data_on_elem=False, ax=None):
    """Filled plot of a nodal (or element) field on the triangular mesh.

    ``oce``: 'global' (plate-carree), 'np' (lat>45N), 'sp' (lat<-45S).
    ``contours``: array of levels; default 41 levels over the finite range.
    Returns (fig, ax, artist).
    """
    import matplotlib.pyplot as plt

    data = np.asarray(data, dtype=float).copy()
    keep = _non_cyclic_elems(mesh)
    elem2 = mesh.elem[keep]
    if data_on_elem:
        data = data[keep]
        finite_e = np.isfinite(data)
        elem2, data = elem2[finite_e], data[finite_e]
    else:
        finite_e = np.isfinite(data[elem2]).all(axis=1)
        elem2 = elem2[finite_e]

    if oce == "np":
        sel = (mesh.y2[elem2] > 45.0).all(axis=1)
    elif oce == "sp":
        sel = (mesh.y2[elem2] < -45.0).all(axis=1)
    else:
        sel = np.ones(elem2.shape[0], bool)
    elem2 = elem2[sel]
    if data_on_elem:
        data = data[sel]

    if contours is None:
        ref = data if data_on_elem else data[np.unique(elem2)]
        lo, hi = np.nanmin(ref), np.nanmax(ref)
        if not np.isfinite(lo) or lo == hi:
            lo, hi = lo - 1.0, lo + 1.0
        contours = np.linspace(lo, hi, 41)
    contours = np.asarray(contours, dtype=float)

    if ax is None:
        fig, ax = plt.subplots(figsize=(10, 5))
    else:
        fig = ax.figure
    cmap = cmap or plt.cm.viridis

    if data_on_elem:
        im = ax.tripcolor(mesh.x2, mesh.y2, elem2, facecolors=data,
                          cmap=cmap, vmin=contours.min(), vmax=contours.max())
    else:
        # clamp into the contour range like the reference (ftriplot :34-37)
        eps = (contours.max() - contours.min()) / 50.0
        d = np.clip(data, contours.min() + eps, contours.max() - eps)
        im = ax.tricontourf(mesh.x2, mesh.y2, elem2, d, levels=contours,
                            cmap=cmap, extend=extend)
    ax.set_xlabel("lon")
    ax.set_ylabel("lat")
    if do_cbar:
        fig.colorbar(im, ax=ax, orientation="horizontal", pad=0.08,
                     fraction=0.05)
    return fig, ax, im


def wplot_xy(xx, yy, zz, contours=None, cmap=None, do_cbar=True, ax=None):
    """Filled-contour plot of a regular-grid (regridded) field
    (reference wplot_xy :91); masks NaN."""
    import matplotlib.pyplot as plt

    zz = np.ma.masked_invalid(np.asarray(zz, dtype=float))
    if contours is None:
        contours = np.linspace(zz.min(), zz.max(), 41)
    if ax is None:
        fig, ax = plt.subplots(figsize=(10, 5))
    else:
        fig = ax.figure
    im = ax.contourf(xx, yy, zz, levels=contours,
                     cmap=cmap or plt.cm.viridis, extend="both")
    if do_cbar:
        fig.colorbar(im, ax=ax, orientation="horizontal", pad=0.08,
                     fraction=0.05)
    return fig, ax, im


def wplot_yz(y, z, v, contours=None, cmap=None, ax=None):
    """Meridional-section plot (lat x depth), e.g. for MOC streamfunctions
    (reference wplot_yz :150); depth axis increases downward."""
    import matplotlib.pyplot as plt

    v = np.ma.masked_invalid(np.asarray(v, dtype=float))
    if contours is None:
        contours = np.linspace(v.min(), v.max(), 41)
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 4))
    else:
        fig = ax.figure
    im = ax.contourf(y, z, v, levels=contours, cmap=cmap or plt.cm.viridis,
                     extend="both")
    if np.asarray(z).ndim == 1 and np.asarray(z).max() > 0:
        ax.invert_yaxis()
    ax.set_xlabel("lat")
    ax.set_ylabel("depth")
    fig.colorbar(im, ax=ax, orientation="vertical", fraction=0.05)
    return fig, ax, im


def moving_average(series, window_size: int):
    """Centered running mean via convolution (reference movingaverage :163)."""
    series = np.asarray(series, dtype=float)
    window = np.ones(int(window_size)) / float(window_size)
    return np.convolve(series, window, mode="same")
