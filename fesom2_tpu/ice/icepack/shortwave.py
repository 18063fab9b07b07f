"""CCSM3 albedo and shortwave absorption (shortwave='ccsm3',
albedo_type='ccsm3', config/namelist.icepack:55-70).

Computes, per category: broadband albedo, SW absorbed at the surface,
SW absorbed inside each ice layer (Beer's law for the penetrating
visible fraction), and SW transmitted to the ocean.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import constants as c


def ccsm3_shortwave(cfg, hi, hs, Tsf, fsw):
    """All inputs broadcastable to [ncat, N]; fsw is incoming SW [W/m^2].

    Returns (albedo, fswsfc, iabs [ncat, nilyr, N], fswthru)."""
    nilyr = cfg.nilyr
    fh = jnp.minimum(jnp.arctan(4.0 * hi) / jnp.arctan(4.0 * cfg.ahmax), 1.0)

    albiv = cfg.albicev * fh + cfg.albocn * (1.0 - fh)
    albin = cfg.albicei * fh + cfg.albocn * (1.0 - fh)
    albsv = jnp.full_like(hi, cfg.albsnowv)
    albsn = jnp.full_like(hi, cfg.albsnowi)

    # near-melt reduction over the last dT_mlt degrees
    warm = jnp.clip((Tsf + cfg.dT_mlt) / cfg.dT_mlt, 0.0, 1.0)
    albiv = albiv + cfg.dalb_mlt * warm * fh
    albin = albin + cfg.dalb_mlt * warm * fh
    albsv = albsv + cfg.dalb_mltv * warm
    albsn = albsn + cfg.dalb_mlti * warm

    fsnow = hs / (hs + cfg.snowpatch)
    albv = albiv * (1.0 - fsnow) + albsv * fsnow
    albn = albin * (1.0 - fsnow) + albsn * fsnow
    albedo = cfg.frac_vis * albv + (1.0 - cfg.frac_vis) * albn

    avis = cfg.frac_vis * fsw * (1.0 - albv)
    anir = (1.0 - cfg.frac_vis) * fsw * (1.0 - albn)

    # visible light penetrates bare ice only
    fswpen = avis * cfg.i0vis * (1.0 - fsnow)
    fswsfc = avis + anir - fswpen

    # Beer's-law absorption per layer
    z = jnp.arange(nilyr + 1, dtype=hi.dtype) / nilyr        # [nilyr+1]
    trans = jnp.exp(-cfg.kappav * z[None, :, None] * hi[:, None, :])
    iabs = fswpen[:, None, :] * (trans[:, :-1, :] - trans[:, 1:, :])
    fswthru = fswpen * trans[:, -1, :]
    return albedo, fswsfc, iabs, fswthru
