from .tables import MeshTables, build_mesh
from .io import RawMesh, read_raw_mesh

__all__ = ["MeshTables", "build_mesh", "RawMesh", "read_raw_mesh"]
