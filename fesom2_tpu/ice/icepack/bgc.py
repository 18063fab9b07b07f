"""Skeletal-layer sea-ice biogeochemistry (skl_bgc).

Reference behavior: the skeletal-layer BGC option of the externally
downloaded Icepack library, whose hooks the reference driver declares
(``src/icepack_drivers/icedrv_main.F90:61-62`` n_bgc/nltrcr, ``:395``
cpl_bgc, ``:557`` ocean_bio, ``:668`` trcrn_sw), after Arrigo et
al. 1993 and the Icepack skl_bgc description (Jeffery et al.).

The biologically active "skeletal layer" is the bottom ``sk_l`` (3 cm)
of each ice category.  Three tracers per category live in the generic
area-weighted aux stack (concentrations in the skeletal layer,
mmol/m^3): ice algae (as nitrogen), nitrate, and dissolved silicate.
Horizontal FCT advection, ITD remapping, ridging and restart handle
them with no BGC-specific code; the column processes here are

- **photosynthesis**: algal growth at rate mu_max * exp(grow_Tdep*T) *
  min(f_light, f_NO3, f_Si); light limitation saturates with the
  shortwave flux transmitted through the category (fswthru), nutrient
  limitation is Michaelis-Menten;
- **uptake**: growth consumes NO3 1:1 (nitrogen currency) and silicate
  with the diatom ratio R_Si2N;
- **mortality / remineralization**: linear algal mortality; a fraction
  fr_resp is respired back to NO3 in the layer, the rest sinks out;
- **ocean exchange**: congelation growth and bottom melt flush the
  layer toward the ocean mixed-layer concentrations with a piston
  velocity proportional to the interface speed plus a molecular
  background (the Icepack PV closure collapsed to its leading terms).

The ocean mixed-layer nutrient pool is prescribed (IcepackConfig
bgc_NO3_ocn / bgc_Sil_ocn) — the reference ocean carries no nutrient
tracers either; coupling to an ocean BGC would replace these constants.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import constants as c

# tracer storage order within the ta block
BGC_NAMES = ("bgc_N", "bgc_NO3", "bgc_Sil")
N_BGC = len(BGC_NAMES)

sk_l = 0.03          # skeletal layer thickness [m]
pv_mol = 1.0e-6      # background molecular piston velocity [m/s]
pv_grow = 1.44       # piston velocity per unit interface speed (growth)
pv_melt = 1.0        # ... (melt; full flushing of the retreating layer)


def bgc_defaults(ipc):
    """New-ice / initial skeletal concentrations [mmol/m^3]."""
    return {"bgc_N": ipc.bgc_N_seed, "bgc_NO3": ipc.bgc_NO3_ocn,
            "bgc_Sil": ipc.bgc_Sil_ocn}


def skl_bgc_step(ipc, algN, NO3, Sil, aicen, vicen, fswthru, dhi_dt,
                 T_bot, dt):
    """Advance the skeletal ecosystem one step.

    algN/NO3/Sil [ncat, N]: skeletal-layer concentrations (mmol/m^3);
    fswthru [ncat, N]: shortwave transmitted through the category [W/m^2]
    (the light arriving at the skeletal layer);
    dhi_dt [ncat, N]: net ice thickness tendency [m/s] (positive growth);
    T_bot [N]: ice-bottom (ocean freezing) temperature [C].

    Returns (algN, NO3, Sil, flux_N, flux_NO3, flux_Sil) with fluxes in
    mmol/m^2/s INTO the ocean, per grid area (aggregated over categories,
    for a future ocean-BGC coupling; discarded by the driver today)."""
    has = (aicen > c.puny) & (vicen > c.puny)

    # --- growth --------------------------------------------------------
    f_light = fswthru / (fswthru + ipc.bgc_K_par)
    f_NO3 = NO3 / (NO3 + ipc.bgc_K_NO3)
    f_Sil = Sil / (Sil + ipc.bgc_K_Sil)
    lim = jnp.minimum(f_light, jnp.minimum(f_NO3, f_Sil))
    mu = ipc.bgc_mu_max / 86400.0 \
        * jnp.exp(ipc.bgc_grow_Tdep * T_bot)[None, :] * lim
    grow = mu * algN * dt                                   # mmol N/m^3
    # cap uptake at the available nutrient
    grow = jnp.minimum(grow, NO3 * (1.0 - c.puny))
    grow = jnp.minimum(grow, Sil * (1.0 - c.puny) / ipc.bgc_R_Si2N)

    # --- mortality / remineralization ---------------------------------
    mort = ipc.bgc_mort / 86400.0 * algN * dt
    mort = jnp.minimum(mort, algN * (1.0 - c.puny))
    remin = ipc.bgc_fr_resp * mort
    loss = mort - remin                                     # sinks out

    algN2 = algN + grow - mort
    NO32 = NO3 - grow + remin
    Sil2 = Sil - grow * ipc.bgc_R_Si2N

    # --- ocean exchange ------------------------------------------------
    gr = jnp.maximum(dhi_dt, 0.0)
    ml = jnp.maximum(-dhi_dt, 0.0)
    pv = pv_mol + pv_grow * gr + pv_melt * ml               # [m/s]
    relax = 1.0 - jnp.exp(-pv * dt / sk_l)
    dNO3 = relax * (ipc.bgc_NO3_ocn - NO32)
    dSil = relax * (ipc.bgc_Sil_ocn - Sil2)
    # algae are flushed out on melt only (no oceanic seed population)
    dalg = -relax * jnp.where(ml > 0.0, algN2, 0.0) * 0.5
    NO33 = NO32 + dNO3
    Sil3 = Sil2 + dSil
    algN3 = jnp.maximum(algN2 + dalg, 0.0)

    algN3 = jnp.where(has, algN3, 0.0)
    NO33 = jnp.where(has, NO33, 0.0)
    Sil3 = jnp.where(has, Sil3, 0.0)

    # grid-mean fluxes into the ocean [mmol/m^2/s]: layer-volume scaled
    w = aicen * sk_l / dt
    flux_N = (w * (loss - dalg)).sum(0)
    flux_NO3 = (w * -dNO3).sum(0)
    flux_Sil = (w * -dSil).sum(0)
    return algN3, NO33, Sil3, flux_N, flux_NO3, flux_Sil
