"""Device-mesh sharding of the model state (horizontal domain decomposition).

FESOM2's single scale-out strategy is METIS domain decomposition of the
horizontal mesh with halo exchange (``SURVEY.md §2.1``; reference
``gen_modules_partitioning.F90``/``gen_halo_exchange.F90``).  The TPU-native
expression used here is GSPMD: every entity axis (nodes/elements/edges) is
sharded over a 1-D ``jax.sharding.Mesh`` axis ``"cell"`` and XLA inserts the
halo collectives for the gather/scatter stencils.  (An explicit shard_map +
ppermute halo path with overlap is the planned optimisation; this module
establishes the partitioned-execution contract.)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import OceanState, Forcing
from ..mesh import MeshTables


def make_device_mesh(n_devices: int = None) -> Mesh:
    import numpy as np
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("cell",))


def state_shardings(mesh: Mesh, state: OceanState):
    """PartitionSpec tree: shard the minor (entity) axis of every 2D field."""
    def spec(x):
        if x.ndim == 0:
            return NamedSharding(mesh, P())
        # shard the last axis (nodes/elements) over "cell"
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["cell"])))
    return jax.tree.map(spec, state)


def forcing_shardings(mesh: Mesh, forcing: Forcing):
    def spec(x):
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["cell"])))
    return jax.tree.map(spec, forcing)


def shard_state(mesh: Mesh, state: OceanState) -> OceanState:
    return jax.device_put(state, state_shardings(mesh, state))


def shard_forcing(mesh: Mesh, forcing: Forcing) -> Forcing:
    return jax.device_put(forcing, forcing_shardings(mesh, forcing))
