"""3D cantilever bend — the canonical Simulate_cli workload.

Clamp one face of a P2 tet bar, press the opposite face down, solve, and
report tip deflection + von Mises range.  The solver auto-selects the best
operator for the mesh (structured multigrid on box grids, routed SpMV +
f64 refinement on large unstructured meshes on TPU, gather-EBE otherwise).

Run: python examples/cantilever.py [nx ny nz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material

nx, ny, nz = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
    else (24, 6, 6)
V, T = generators.grid_tet(nx, ny, nz, hi=(4.0, 1.0, 1.0))
mesh = FEMMesh(V, T, degree=2)
sim = ElasticitySimulator(mesh, Material.isotropic(3, 200.0, 0.3))

X = np.asarray(mesh.node_positions)
sim.fix_nodes(np.flatnonzero(X[:, 0] < 1e-9))          # clamp x = 0
load = np.zeros((mesh.num_nodes, 3))
load[X[:, 0] > 4.0 - 1e-9, 2] = -0.05                   # press the tip
sim.neumann_load = jnp.asarray(load)

u, info = sim.solve(tol=1e-10)
vm = sim.von_mises_field(u)
tip = X[:, 0] > 4.0 - 1e-9
print(f"dofs={mesh.num_nodes * 3}  solver iters={int(info.iters)}  "
      f"relres={float(info.resnorm):.2e}")
print(f"tip deflection (mean u_z at x=4): {float(u[tip, 2].mean()):+.6f}")
print(f"von Mises: min={float(jnp.min(vm)):.4f} max={float(jnp.max(vm)):.4f}")
