from . import cg
from .cg import CGResult, solve_dirichlet, mask_projector, nullspace_projector
