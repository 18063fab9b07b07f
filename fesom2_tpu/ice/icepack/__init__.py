"""Multi-category sea-ice column physics (Icepack-equivalent).

The reference optionally couples the CICE Icepack column-physics library
through ``src/icepack_drivers/`` (icedrv_main.F90, icedrv_step.F90 — the
library itself is downloaded externally, ``download_icepack.sh``).  This
package re-implements the column physics exercised by the reference's
default configuration (``config/namelist.icepack``) TPU-first:

- ncat ice-thickness categories with kcatbound=1 bounds,
- BL99 (Bitz & Lipscomb 1999) vertical thermodynamics, ktherm=1,
  conduct='bubbly', nilyr/nslyr vertical layers,
- linear ITD remapping (Lipscomb 2001), kitd=1,
- Rothrock '75 ice strength (kstrength=1) fed to the EVP rheology,
- exponential ridging participation/redistribution
  (krdg_partic=1 / krdg_redist=1, Lipscomb et al. 2007),
- CCSM3 albedo / shortwave partitioning,
- frazil new-ice formation and lateral melt.

Everything is expressed as fixed-shape array programs over ``[ncat, N]``
(and ``[ncat, nlyr, N]``) arrays under ``jax.jit`` — categories and layers
are static axes, per-column Newton/tridiagonal iterations are
``lax.fori_loop``/``lax.scan``.
"""
from .state import IcepackConfig, IcepackState, init_icepack_state
from .driver import icepack_timestep
