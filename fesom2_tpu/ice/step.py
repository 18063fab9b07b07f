"""Ice timestep driver: dynamics -> FCT advection -> thermodynamics.

Reference: ``src/ice_setup_step.F90`` ice_timestep :165-279.
"""
from __future__ import annotations

from ..mesh import MeshTables
from .state import IceState, IceForcing, OceanSurface
from .evp import ice_dynamics
from .fct import ice_fct_advect
from .thermo import thermodynamics


def ice_timestep(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                 ocean: OceanSurface, cfg, use_virt_salt: bool,
                 ref_sss: float = 34.0, ref_sss_local: bool = False,
                 sub=None) -> IceState:
    ice_dt = cfg.dt * cfg.ice.ice_ave_steps
    ice = ice_dynamics(ice, mesh, forcing, ocean, cfg, sub=sub)
    ice = ice_fct_advect(ice, mesh, cfg, ice_dt)
    ice = thermodynamics(ice, mesh, forcing, ocean, cfg, use_virt_salt,
                         ref_sss, ref_sss_local)
    return ice


def ice_timestep_cpl(ice: IceState, mesh: MeshTables, forcing: IceForcing,
                     atm_fluxes, ocean: OceanSurface, cfg,
                     use_virt_salt: bool, ref_sss: float = 34.0,
                     ref_sss_local: bool = False) -> IceState:
    """Coupled-mode ice step: identical dynamics/advection, but the
    thermodynamics consumes atmosphere-model fluxes (Dorn 2009,
    ref ice_thermo_cpl.F90 replacing ice_thermo_oce.F90 in __oasis
    builds)."""
    from .thermo_cpl import thermodynamics_cpl
    ice_dt = cfg.dt * cfg.ice.ice_ave_steps
    ice = ice_dynamics(ice, mesh, forcing, ocean, cfg)
    ice = ice_fct_advect(ice, mesh, cfg, ice_dt)
    ice = thermodynamics_cpl(ice, atm_fluxes, ocean, cfg, use_virt_salt,
                             ref_sss, ref_sss_local)
    return ice
