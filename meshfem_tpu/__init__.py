"""meshfem_tpu — a TPU-native finite element framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of MeshFEM
(https://github.com/MeshFEM/MeshFEM): P1/P2 simplicial FEM, linear
elasticity, periodic homogenization, scalar Laplace/Poisson solvers,
differential operators, generalized eigensolves, material optimization,
parametrization, mesh I/O and processing — with host-side numpy mesh
connectivity flattened into static index arrays, batched element kernels,
matrix-free / BCSR iterative solvers, and `jax.sharding` scale-out.
"""

from . import config  # noqa: F401  (enables x64 on import)
from . import fem  # noqa: F401
from .fem import ElasticityTensor  # noqa: F401

__version__ = "0.1.0"
