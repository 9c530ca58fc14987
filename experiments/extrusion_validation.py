"""Extrusion validation suite: 2D plane-stress vs thin 3D extrusions.

Port of ``/root/reference/experiments/extrusion_validation/`` and
``stress_extrusion_validation/`` (``gen.sh``: Simulate_cli on
``sample_poisson.msh`` with opposing relative compression forces +
no_rigid_motion, then tetgen-extruded copies at thicknesses 0.25..3.0
solved in 3D; ``process_stresses.py`` compares the stress fields).

TPU port: the same reference mesh and the verbatim reference .bc JSONs
drive the library simulator; extrusions use ``mesh.filters.extrude``
(conforming prism split — replaces the tetgen call).  Asserted outcomes:

  1. the mid-plane 3D displacement field converges to the 2D plane-stress
     field as thickness -> 0 (monotone across the thickness sweep, and
     the thinnest extrusion agrees to a few percent);
  2. the von Mises stress distribution (median / p90 quantiles over the
     mid-layer elements) converges likewise — the
     stress_extrusion_validation criterion.

Run: python experiments/extrusion_validation.py [--thicknesses 0.25 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if os.environ.get("MESHFEM_PLATFORM"):      # sitecustomize pre-imports jax,
    import jax                              # so JAX_PLATFORMS is baked in;
    jax.config.update(                      # override via jax.config instead
        "jax_platforms", os.environ["MESHFEM_PLATFORM"])

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshfem_tpu.mesh import FEMMesh, filters
from meshfem_tpu.io import meshio
from meshfem_tpu.physics import ElasticitySimulator, Material, parse_bc
from meshfem_tpu.physics.elasticity import von_mises

REF = "/root/reference/experiments/extrusion_validation"
BC2 = json.load(open(f"{REF}/compression_relative_2D.bc"))
BC3 = json.load(open(f"{REF}/compression_relative_3D.bc"))
MAT = json.load(open(f"{REF}/ProJet7000_2D.material.material"))


def solve_2d(degree=2, tol=1e-10):
    V, F = meshio.load(f"{REF}/sample_poisson.msh")
    mesh = FEMMesh(V[:, :2], F, degree=degree)
    sim = ElasticitySimulator(
        mesh, Material.isotropic(2, MAT["young"], MAT["poisson"]))
    sim.apply_boundary_conditions(parse_bc(json.dumps(BC2), dim=2))
    u, res = sim.solve(tol=tol)
    vm = np.asarray(sim.von_mises_field(u))
    return mesh, sim, np.asarray(u), vm


def solve_extruded(thickness, degree=2, tol=1e-9, layers=None):
    V, F = meshio.load(f"{REF}/sample_poisson.msh")
    if layers is None:
        layers = min(6, max(1, int(round(thickness / 0.25))))
    V3, T3 = filters.extrude(V[:, :2], F, height=thickness, layers=layers)
    mesh = FEMMesh(V3, T3, degree=degree)
    sim = ElasticitySimulator(
        mesh, Material.isotropic(3, MAT["young"], MAT["poisson"]))
    sim.apply_boundary_conditions(parse_bc(json.dumps(BC3), dim=3))
    u, res = sim.solve(tol=tol)
    vm = np.asarray(sim.von_mises_field(u))
    return mesh, sim, np.asarray(u), vm, layers


def compare(thicknesses=(0.25, 1.0, 3.0), degree=2):
    mesh2, sim2, u2, vm2 = solve_2d(degree=degree)
    n2 = mesh2.num_nodes
    # center the 2D field (no_rigid_motion leaves translations projected,
    # but comparing against the 3D solve needs a common gauge): remove
    # mean translation and mean in-plane rotation about the centroid
    results = []
    for t in thicknesses:
        mesh3, sim3, u3, vm3, layers = solve_extruded(t, degree=degree)
        # the extruded mesh stacks the 2D nodes per z-layer in order —
        # vertex i of layer L is vertex i + L * n2v of the extrusion; P2
        # edge nodes differ, so compare on VERTEX nodes only
        n2v = mesh2.num_vertices
        v2 = mesh2.vertex_nodes                         # 2D vertex -> node
        mid = layers // 2
        v3 = mesh3.vertex_nodes[mid * n2v:(mid + 1) * n2v]
        d2 = u2[v2]                                     # [n2v, 2]
        # the .bc applies a fixed TOTAL force (-> traction F / area); the
        # loaded face area grows with thickness, so the linear 3D fields
        # carry an exact 1/t scale relative to the unit-implicit-depth 2D
        # plane-stress run — normalize by t (== loading with force 100 t)
        d3 = t * u3[v3][:, :2]                          # in-plane part
        vm3 = t * vm3
        # common gauge: subtract each field's mean and best-fit rotation
        X = np.asarray(mesh2.node_positions)[v2]
        for d in (d2, d3):
            d -= d.mean(axis=0)
        Xc = X - X.mean(axis=0)
        for d in (d2, d3):
            # in-plane infinitesimal rotation fit: omega minimizing
            # ||d - omega * perp(Xc)||
            perp = np.column_stack([-Xc[:, 1], Xc[:, 0]])
            om = (perp * d).sum() / (perp * perp).sum()
            d -= om * perp
        scale = np.abs(d2).max()
        disp_err = np.abs(d3 - d2).max() / scale
        # stress distribution on the mid layer (elements whose centroid z
        # is nearest the mid-plane): quantile comparison
        cz = np.asarray(mesh3.barycenters())[:, 2]
        band = np.abs(cz - t / 2.0) < t / (2.0 * layers)
        q = lambda v, p: float(np.quantile(v, p))
        vm_med_err = abs(q(vm3[band], 0.5) - q(vm2, 0.5)) / q(vm2, 0.5)
        vm_p90_err = abs(q(vm3[band], 0.9) - q(vm2, 0.9)) / q(vm2, 0.9)
        results.append(dict(thickness=t, layers=layers,
                            dofs=mesh3.num_nodes * 3,
                            disp_err=disp_err, vm_med_err=vm_med_err,
                            vm_p90_err=vm_p90_err))
        print(f"t={t:<5} layers={layers:<2} dofs={mesh3.num_nodes * 3:<8} "
              f"disp_err={disp_err:.4f} vm_med_err={vm_med_err:.4f} "
              f"vm_p90_err={vm_p90_err:.4f}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thicknesses", type=float, nargs="+",
                    default=[0.25, 1.0, 3.0])
    ap.add_argument("--degree", type=int, default=2)
    args = ap.parse_args()
    res = compare(tuple(args.thicknesses), degree=args.degree)
    thin, thick = res[0], res[-1]
    # plane-stress convergence: thin extrusion close to 2D, and closer
    # than the thick one
    assert thin["disp_err"] < 0.05, thin
    assert thin["vm_med_err"] < 0.05, thin
    if len(res) > 1 and thick["thickness"] > thin["thickness"]:
        assert thin["disp_err"] <= thick["disp_err"] + 1e-9, (thin, thick)
    print("extrusion_validation OK")


if __name__ == "__main__":
    main()
