"""Periodic homogenization of the reference's 2D microstructure cell.

Computes the effective elasticity tensor C^h of a two-phase (1000:1
contrast) microstructure with periodic boundary conditions, using ONE
multi-RHS block CG for all cell problems with the P1-coarse two-level
preconditioner (bounded iteration counts at high contrast).

Run: python examples/homogenize_microstructure.py [mesh.msh]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from meshfem_tpu.io import meshio
from meshfem_tpu.mesh import FEMMesh
from meshfem_tpu.analysis import homogenization as hom
from meshfem_tpu.physics.materials import MaterialField

path = sys.argv[1] if len(sys.argv) > 1 \
    else "/root/reference/examples/meshes/2D_microstructure.msh"
V, F = meshio.load(path)
mesh = FEMMesh(V[:, :2], F, degree=2)

c = np.asarray(mesh.V)[np.asarray(mesh.F)].mean(axis=1)
E_field = np.where(c[:, 0] < 0.0, 1000.0, 1.0)        # stiff left phase
mats = MaterialField.isotropic_field(2, jnp.asarray(E_field),
                                     jnp.full(len(E_field), 0.3))

res = hom.homogenize(mesh, mats, tol=1e-11, precond="twolevel")
Ch = np.asarray(res.Ch)
print(f"cell problems converged in {res.cg_iters[0]} block-CG iterations")
print("effective C^h:")
print(np.array_str(Ch, precision=5, suppress_small=True))
w = np.linalg.eigvalsh(Ch)
print(f"SPD check: eigenvalues in [{w.min():.4g}, {w.max():.4g}]")
