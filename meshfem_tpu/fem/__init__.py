from . import flattening, simplex, shape_functions, quadrature, elasticity_tensor
from .elasticity_tensor import ElasticityTensor
