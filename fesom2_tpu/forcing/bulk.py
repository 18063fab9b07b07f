"""NCAR (Large & Yeager 2004/2009) bulk transfer coefficients, vectorised.

Reference: ``src/gen_bulk_formulae.F90`` ncar_ocean_fluxes_mode :115-290.
The per-node Newton/fixed-point loop becomes a fixed 5-iteration vector loop
(the reference exits early on convergence; 5 iterations bounds it).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ice.state import rhoair, inv_rhoair, tmelt

grav = 9.80
vonkarm = 0.40
q1 = 640380.0
q2 = -5107.4
u10min = 0.3


def _cd_n10(u10):
    hl1 = (2.7 / u10 + 0.142 + 0.0764 * u10 - 3.14807e-10 * u10 ** 6) / 1.0e3
    return jnp.where(u10 < 33.0, hl1, 2.34e-3)      # LY2009 eqn. 11


def _psi(zeta):
    x2 = jnp.maximum(jnp.sqrt(jnp.abs(1.0 - 16.0 * zeta)), 1.0)
    x = jnp.sqrt(x2)
    psi_m_un = jnp.log((1.0 + 2.0 * x + x2) * (1.0 + x2) / 8.0) \
        - 2.0 * (jnp.arctan(x) - jnp.arctan(1.0))
    psi_h_un = 2.0 * jnp.log((1.0 + x2) / 2.0)
    psi_m = jnp.where(zeta > 0, -5.0 * zeta, psi_m_un)
    psi_h = jnp.where(zeta > 0, -5.0 * zeta, psi_h_un)
    return psi_m, psi_h


def ncar_ocean_fluxes(tair_C, sst_C, shum, u_wind, v_wind, u_w, v_w,
                      z_wind=10.0, z_tair=10.0, z_shum=10.0, n_itts=5):
    """Return (cd, ch, ce) transfer coefficients at measurement height."""
    t = tair_C + tmelt
    ts = sst_C + tmelt
    q = shum
    qs = 0.98 * q1 * inv_rhoair * jnp.exp(q2 / ts)
    tv = t * (1.0 + 0.608 * q)
    u = jnp.maximum(jnp.sqrt((u_wind - u_w) ** 2 + (v_wind - v_w) ** 2), u10min)
    u10, t10, q10 = u, t, q

    cd_n10 = _cd_n10(u10)
    cd_n10_rt = jnp.sqrt(cd_n10)
    ce_n10 = 34.6 * cd_n10_rt * 1.0e-3
    stab = 0.5 + jnp.sign(t - ts) * 0.5
    ch_n10 = (18.0 * stab + 32.7 * (1.0 - stab)) * cd_n10_rt * 1.0e-3
    cd, ch, ce = cd_n10, ch_n10, ce_n10

    for _ in range(n_itts):
        cd_rt = jnp.sqrt(cd)
        ustar = cd_rt * u
        tstar = (ch / cd_rt) * (t10 - ts)
        qstar = (ce / cd_rt) * (q10 - qs)
        bstar = grav * (tstar / tv + qstar / (q10 + 1.0 / 0.608))
        us2 = ustar * ustar + 1e-30

        def zeta_of(z):
            zeta = vonkarm * bstar * z / us2
            return jnp.sign(zeta) * jnp.minimum(jnp.abs(zeta), 10.0)

        zeta_u = zeta_of(z_wind)
        psi_m_u, psi_h_u = _psi(zeta_u)
        zeta_t = zeta_of(z_tair)
        _, psi_h_t = _psi(zeta_t)
        zeta_q = zeta_of(z_shum)
        _, psi_h_q = _psi(zeta_q)

        u10 = u / (1.0 + cd_n10_rt * (jnp.log(z_wind / 10.0) - psi_m_u) / vonkarm)
        u10 = jnp.maximum(u10, u10min)
        t10 = t - tstar / vonkarm * (jnp.log(z_tair / z_wind) + psi_h_u - psi_h_t)
        q10 = q - qstar / vonkarm * (jnp.log(z_shum / z_wind) + psi_h_u - psi_h_q)
        tv = t10 * (1.0 + 0.608 * q10)

        cd_n10 = _cd_n10(u10)
        cd_n10_rt = jnp.sqrt(cd_n10)
        ce_n10 = 34.6 * cd_n10_rt * 1.0e-3
        stab = 0.5 + jnp.sign(zeta_u) * 0.5
        ch_n10 = (18.0 * stab + 32.7 * (1.0 - stab)) * cd_n10_rt * 1.0e-3

        xx = (jnp.log(z_wind / 10.0) - psi_m_u) / vonkarm
        cd = cd_n10 / (1.0 + cd_n10_rt * xx) ** 2
        xx = (jnp.log(z_wind / 10.0) - psi_h_u) / vonkarm
        ch = ch_n10 / (1.0 + ch_n10 * xx / cd_n10_rt) * jnp.sqrt(cd / cd_n10)
        ce = ce_n10 / (1.0 + ce_n10 * xx / cd_n10_rt) * jnp.sqrt(cd / cd_n10)
    return cd, ch, ce
