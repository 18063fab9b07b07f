"""Sea-ice state and atmospheric inputs (replaces i_ARRAYS,
``src/ice_modules.F90:52-105``)."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..mesh import MeshTables

# thermodynamic constants (i_therm_param, ice_modules.F90:109-156)
rhoair = 1.3
inv_rhoair = 1.0 / 1.3
rhowat = 1025.0
inv_rhowat = 1.0 / 1025.0
rhoice = 910.0
inv_rhoice = 1.0 / 910.0
rhosno = 290.0
inv_rhosno = 1.0 / 290.0
cpair = 1005.0
cc = rhowat * 4190.0
cl = rhoice * 3.34e5
clhw = 2.501e6
clhi = 2.835e6
tmelt = 273.15
boltzmann = 5.67e-8
Sice = 4.0
iclasses = 7
hmin = 0.01
Armin = 0.01
Ch_atm_ice = 1.75e-3  # transfer coeff. sensible heat over ice (gen_modules_forcing.F90:18)
Ce_atm_ice = 1.75e-3  # transfer coeff. evaporation over ice (gen_modules_forcing.F90:17)


@jax.tree_util.register_dataclass
@dataclass
class IceState:
    u_ice: jnp.ndarray       # [N]
    v_ice: jnp.ndarray       # [N]
    m_ice: jnp.ndarray       # [N] ice volume per area [m]
    a_ice: jnp.ndarray       # [N] concentration
    m_snow: jnp.ndarray      # [N]
    sigma11: jnp.ndarray     # [E] stress memory across subcycles/steps
    sigma12: jnp.ndarray
    sigma22: jnp.ndarray
    t_skin: jnp.ndarray      # [N] snow/ice surface temperature [C]
    # fluxes to the ocean (filled by thermodynamics)
    fresh_wa_flux: jnp.ndarray   # [N] positive down
    net_heat_flux: jnp.ndarray   # [N] positive down
    real_salt_flux: jnp.ndarray  # [N]
    evaporation: jnp.ndarray     # [N]
    thdgr: jnp.ndarray           # [N] thermodynamic ice growth rate [m/s]
    thdgrsn: jnp.ndarray         # [N]
    flice: jnp.ndarray           # [N] snow->ice flooding rate
    a_ice_old: jnp.ndarray       # [N] (pre-thermo concentration, for fluxes)
    # adaptive-EVP stability parameters (whichEVP=2), persistent across steps
    # (alpha_evp_array/beta_evp_array, ice_modules.F90:98-99)
    alpha_aevp: jnp.ndarray      # [E]
    beta_aevp: jnp.ndarray       # [N]


@jax.tree_util.register_dataclass
@dataclass
class IceForcing:
    """Atmospheric inputs to the ice model (subset of g_forcing_arrays)."""
    shortwave: jnp.ndarray
    longwave: jnp.ndarray
    Tair: jnp.ndarray        # [C]
    shum: jnp.ndarray        # specific humidity
    prec_rain: jnp.ndarray   # [m water/s]
    prec_snow: jnp.ndarray
    runoff: jnp.ndarray
    evaporation_in: jnp.ndarray
    u_wind: jnp.ndarray
    v_wind: jnp.ndarray
    stress_atmice_x: jnp.ndarray
    stress_atmice_y: jnp.ndarray
    stress_atmoce_x: jnp.ndarray
    stress_atmoce_y: jnp.ndarray
    Ch_atm_oce: jnp.ndarray  # sensible-heat transfer coeff over open water
    Ce_atm_oce: jnp.ndarray  # evaporation transfer coeff over open water


@jax.tree_util.register_dataclass
@dataclass
class OceanSurface:
    """Ocean fields seen by the ice model (ocean2ice output)."""
    T_oc: jnp.ndarray
    S_oc: jnp.ndarray
    u_w: jnp.ndarray
    v_w: jnp.ndarray
    elevation: jnp.ndarray


def allocate_ice(mesh: MeshTables, dtype=jnp.float64) -> IceState:
    N, E = mesh.n_nodes, mesh.n_elems
    z = lambda *s: jnp.zeros(s, dtype)
    return IceState(u_ice=z(N), v_ice=z(N), m_ice=z(N), a_ice=z(N),
                    m_snow=z(N), sigma11=z(E), sigma12=z(E), sigma22=z(E),
                    t_skin=z(N), fresh_wa_flux=z(N), net_heat_flux=z(N),
                    real_salt_flux=z(N), evaporation=z(N), thdgr=z(N),
                    thdgrsn=z(N), flice=z(N), a_ice_old=z(N),
                    alpha_aevp=jnp.full(E, 250.0, dtype),
                    beta_aevp=jnp.full(N, 250.0, dtype))


def zero_ice_forcing(mesh: MeshTables, dtype=jnp.float64) -> IceForcing:
    N = mesh.n_nodes
    z = lambda: jnp.zeros(N, dtype)
    return IceForcing(shortwave=z(), longwave=z(), Tair=z(), shum=z(),
                      prec_rain=z(), prec_snow=z(), runoff=z(),
                      evaporation_in=z(), u_wind=z(), v_wind=z(),
                      stress_atmice_x=z(), stress_atmice_y=z(),
                      stress_atmoce_x=z(), stress_atmoce_y=z(),
                      Ch_atm_oce=jnp.full(N, 1.75e-3, dtype),
                      Ce_atm_oce=jnp.full(N, 1.75e-3, dtype))
