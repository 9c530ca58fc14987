"""Vibrational modes of the reference's ball mesh (BASELINE config 5).

Smallest nonzero eigenpairs of K x = lambda M x with the six rigid modes
deflated — generalized LOBPCG with matrix-free multi-RHS operators; an
HTML viewer with the animated mode shapes is written next to the script.

Run: python examples/vibrational_modes.py [mesh.msh] [n_modes]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from meshfem_tpu.io import meshio
from meshfem_tpu.mesh import FEMMesh
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.analysis.modes import compute_vibrational_modes
from meshfem_tpu import vis

path = sys.argv[1] if len(sys.argv) > 1 \
    else "/root/reference/examples/meshes/ball.msh"
n_modes = int(sys.argv[2]) if len(sys.argv) > 2 else 4

V, T = meshio.load(path)
mesh = FEMMesh(V, T, degree=2)
sim = ElasticitySimulator(mesh, Material.isotropic(3, 200.0, 0.35))

lam, modes = compute_vibrational_modes(sim, n_modes=n_modes)
print("smallest nonzero eigenvalues:", np.array_str(np.asarray(lam),
                                                    precision=6))
out = "ball_modes.html"
mode0 = np.asarray(modes)[:mesh.num_vertices, :, 0]   # vertex part
vis.write_html_viewer(out, mesh, mode=mode0, scale=0.3)
print(f"wrote {out} (open in a browser; animates the first mode shape)")
