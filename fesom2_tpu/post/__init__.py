"""Post-processing tools: mesh/result loaders, regridding, climatology
comparison, MOC/TS/curl diagnostics (replaces the reference's ``view/``
Python modules and the ``fpost2/`` Fortran post-processor)."""
from .mesh_loader import PostMesh, load_mesh, read_stream, ind_for_depth, \
    cut_region
from .regrid import lon_lat_to_cartesian, fesom2regular, regular_grid
from .moc import moc_z, moc_dens
from .climatology import Climatology, fesom2clim
from .plot import ftriplot, wplot_xy, wplot_yz, moving_average
