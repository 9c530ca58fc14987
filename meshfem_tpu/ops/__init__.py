from . import element_matrices, operators
from .operators import laplacian, mass, mass_elasticity, gradient, divergence
