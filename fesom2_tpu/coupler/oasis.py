"""Atmosphere coupler interface (OASIS3-MCT equivalent).

Reference: ``src/cpl_driver.F90`` — field sets :26-37,:382-426, send-side
time averaging :491-559; ``src/gen_forcing_couple.F90`` — recv mapping onto
forcing arrays :99-170 and conservative flux correction ``force_flux_consv``
:356-468.

The reference links the OASIS3-MCT library (MPI-based field exchange with an
atmosphere executable).  Here the exchange backend is a pluggable transport:
``InMemoryTransport`` serves tests and same-process coupling; a file- or
socket-based transport can be dropped in without touching the driver.  The
numerical behavior — send-side accumulation/averaging between coupling
events, recv-side field mapping, residual-conserving flux correction — is
the reference's.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..mesh import MeshTables
from ..ice.thermo_cpl import CoupledAtmFluxes

tmelt = 273.15

# ref cpl_driver.F90:382-398
SEND_FIELDS_OIFS = ["sst_feom", "sie_feom", "snt_feom", "ist_feom",
                    "sia_feom"]
SEND_FIELDS_ECHAM = ["sst_feom", "sit_feom", "sie_feom", "snt_feom"]
# ref cpl_driver.F90:401-426
RECV_FIELDS_ECHAM = ["taux_oce", "tauy_oce", "taux_ico", "tauy_ico",
                     "prec_oce", "snow_oce", "evap_oce", "subl_oce",
                     "heat_oce", "heat_ico", "heat_swo", "hydr_oce"]
RECV_FIELDS_OIFS = RECV_FIELDS_ECHAM + ["enth_oce"]


class InMemoryTransport:
    """Test double for the OASIS exchange: a named-field mailbox."""

    def __init__(self):
        self._box: Dict[str, np.ndarray] = {}

    def put(self, name: str, field):
        self._box[name] = np.asarray(field)

    def get(self, name: str) -> Optional[np.ndarray]:
        return self._box.get(name)


class CplDriver:
    """Send/receive driver with the reference's averaging protocol:
    send fields are accumulated every step and their time mean is shipped
    at coupling events (ref cpl_oasis3mct_send ``cpl_driver.F90:491-559``,
    o2a_call_count)."""

    def __init__(self, mesh: MeshTables, transport, oifs: bool = False):
        self.mesh = mesh
        self.transport = transport
        self.oifs = oifs
        self.send_names = SEND_FIELDS_OIFS if oifs else SEND_FIELDS_ECHAM
        self.recv_names = RECV_FIELDS_OIFS if oifs else RECV_FIELDS_ECHAM
        self._acc: Dict[str, np.ndarray] = {}
        self._count = 0

    # -- send side -----------------------------------------------------------
    def collect(self, state, ice, ice_temp=None, ice_alb=None):
        """Accumulate this step's send fields (ref update_atm_forcing
        send block, gen_forcing_couple.F90:58-95)."""
        sst = np.asarray(state.tr[0, 0])
        if self.oifs:
            fields = {"sst_feom": sst + tmelt,
                      "sie_feom": np.asarray(ice.a_ice),
                      "snt_feom": np.asarray(ice.m_snow),
                      "ist_feom": (np.asarray(ice_temp) if ice_temp
                                   is not None else np.asarray(ice.t_skin)
                                   + tmelt),
                      "sia_feom": (np.asarray(ice_alb) if ice_alb is not None
                                   else np.zeros_like(sst))}
        else:
            fields = {"sst_feom": sst,
                      "sit_feom": np.asarray(ice.m_ice),
                      "sie_feom": np.asarray(ice.a_ice),
                      "snt_feom": np.asarray(ice.m_snow)}
        for k, v in fields.items():
            self._acc[k] = self._acc.get(k, 0.0) + v
        self._count += 1

    def send(self):
        """Ship the time-averaged send fields and reset the accumulator."""
        if self._count == 0:
            return
        for k, v in self._acc.items():
            self.transport.put(k, v / self._count)
        self._acc = {}
        self._count = 0

    # -- recv side -----------------------------------------------------------
    def recv(self):
        """Fetch the atmosphere fields and map them onto the model's
        forcing slots (ref gen_forcing_couple.F90:99-170).  Returns
        (CoupledAtmFluxes, stresses dict) or None if the transport has no
        data yet."""
        got = {n: self.transport.get(n) for n in self.recv_names}
        if any(v is None for v in got.values()):
            return None
        f = lambda n: jnp.asarray(got[n])
        atm = CoupledAtmFluxes(
            oce_heat_flux=f("heat_oce"), ice_heat_flux=f("heat_ico"),
            shortwave=f("heat_swo"), evap_no_ifrac=f("evap_oce"),
            sublimation=f("subl_oce"), prec_rain=f("prec_oce"),
            prec_snow=f("snow_oce"), runoff=f("hydr_oce"))
        stresses = {"stress_atmoce_x": f("taux_oce"),
                    "stress_atmoce_y": f("tauy_oce"),
                    "stress_atmice_x": f("taux_ico"),
                    "stress_atmice_y": f("tauy_ico")}
        if self.oifs:
            stresses["enthalpyoffuse"] = f("enth_oce")
        return atm, stresses


def force_flux_consv(field, mask, atm_net, mesh: MeshTables,
                     hemisphere: int = 0):
    """Conservative flux correction (ref force_flux_consv
    gen_forcing_couple.F90:356-468): redistribute the residual between the
    atmosphere-side net flux and the ocean-grid integral, weighted by
    |field| (falling back to uniform weights), restricted to a hemisphere
    (0=global, 1=NH, 2=SH).  Skipped entirely in OIFS builds, which rely on
    OASIS conservative remapping (ref :384-386)."""
    area = mesh.area[0]
    lat = mesh.geo_coords[:, 1]
    if hemisphere == 1:
        rmask = jnp.where(lat >= 0, mask, 0.0)
    elif hemisphere == 2:
        rmask = jnp.where(lat < 0, mask, 0.0)
    else:
        rmask = mask
    w_area = rmask * area
    oce_net = (field * w_area).sum()
    residual = atm_net - oce_net

    absint = (jnp.abs(field) * w_area).sum()
    eff_vol = w_area.sum()
    uniform = jnp.ones_like(field) / jnp.where(eff_vol > 0, eff_vol, 1.0)
    weighted = jnp.abs(field) / jnp.where(absint > 1e-10, absint, 1.0)
    weight = jnp.where(absint > 1e-10, weighted, uniform)
    weight = jnp.where(rmask > 1e-10, weight, 0.0)
    return field + weight * residual
