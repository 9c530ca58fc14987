from . import materials, boundary_conditions, poisson, elasticity
from .poisson import PoissonProblem
from .materials import Material, MaterialField, load_material, parse_material
from .boundary_conditions import parse_bc, load_bc, BoundaryConditions
from .elasticity import ElasticitySimulator, von_mises
