from . import generators, geometry
from .geometry import BBox, simplex_geometry, boundary_normals
from .simplicial import TriMesh, TetMesh
from .femmesh import FEMMesh, ElementGeometry
