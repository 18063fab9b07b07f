"""fesom2_tpu — a TPU-native (JAX/XLA/Pallas) unstructured-mesh ocean + sea-ice
dynamical core with the capabilities of FESOM2.

The model is a pure-functional state transition ``step(state, mesh, cfg) ->
state`` compiled with ``jax.jit`` / ``shard_map``; all mesh geometry is static
(`fesom2_tpu.mesh.MeshTables`), all vertical structure is dense-masked, and the
horizontal dimension is sharded over a JAX device mesh with ppermute-based halo
exchange (`fesom2_tpu.parallel`).
"""

__version__ = "0.1.0"

from . import constants
from .config import ModelConfig, load_config

__all__ = ["constants", "ModelConfig", "load_config", "__version__"]
