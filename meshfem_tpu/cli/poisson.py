"""Poisson solve CLI (parity with ``Poisson_cli.cc``):

    python -m meshfem_tpu.cli.poisson mesh.off -b dirichlet.bc -o out.msh \\
        [--degree 2]

Dirichlet regions come from the .bc file (value[0] is the scalar field).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mesh")
    ap.add_argument("-b", "--boundaryConditions", required=True)
    ap.add_argument("-o", "--outputMSH", default=None)
    ap.add_argument("-d", "--degree", type=int, default=1)
    ap.add_argument("--tol", type=float, default=1e-12)
    args = ap.parse_args(argv)

    from ..io import meshio
    from ..mesh import FEMMesh
    from ..physics import PoissonProblem, load_bc
    from ..physics.boundary_conditions import match_boundary_nodes
    from ..utils.expressions import evaluate

    V, F = meshio.load(args.mesh)
    if F.shape[1] == 3 and np.allclose(V[:, 2], 0):
        V = V[:, :2]
    mesh = FEMMesh(V, F, degree=args.degree)
    bc = load_bc(args.boundaryConditions, dim=mesh.dim)
    prob = PoissonProblem(mesh)

    import numpy as np_
    nodes_all, vals_all = [], []
    for region in bc.regions:
        if region.type != "dirichlet":
            continue
        nodes = match_boundary_nodes(mesh, region)
        vals = evaluate(region.value[0], mesh.node_positions[nodes])
        nodes_all.append(nodes)
        vals_all.append(vals)
    nodes = np_.concatenate(nodes_all)
    vals = np_.concatenate(vals_all)
    u, res = prob.solve(nodes, vals, tol=args.tol)
    print(f"solved: {int(res.iters)} iterations, "
          f"residual {float(res.resnorm):.3e}")
    print(f"u range: [{float(np.min(np.asarray(u))):.6g}, "
          f"{float(np.max(np.asarray(u))):.6g}]")
    if args.outputMSH:
        g = np.asarray(prob.gradient(u))
        meshio.save_msh(args.outputMSH, mesh.node_positions,
                        mesh.elem_nodes, fields=[
                            {"name": "u", "data": np.asarray(u),
                             "where": "node", "kind": "scalar"},
                            {"name": "grad_u", "data": g,
                             "where": "element", "kind": "vector"},
                        ])
        print(f"wrote {args.outputMSH}")


if __name__ == "__main__":
    main()
