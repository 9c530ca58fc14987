"""Small tool CLIs (parity with src/bin/tools generators and the
ConstStrainDisplacement / ExtractBMatrix binaries):

    python -m meshfem_tpu.cli.tools grid 16 16 -o grid.msh
    python -m meshfem_tpu.cli.tools grid3d 8 8 8 -o box.msh
    python -m meshfem_tpu.cli.tools ellipse 64 --a 1 --b 0.6 -o e.off
    python -m meshfem_tpu.cli.tools lshape 16 -o L.off
    python -m meshfem_tpu.cli.tools const_strain mesh.msh --strain 0.1 0 0 -o u.msh
    python -m meshfem_tpu.cli.tools extract_b mesh.msh -o B.txt
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("grid")
    g.add_argument("nx", type=int)
    g.add_argument("ny", type=int)
    g.add_argument("-o", "--output", required=True)

    g3 = sub.add_parser("grid3d")
    g3.add_argument("nx", type=int)
    g3.add_argument("ny", type=int)
    g3.add_argument("nz", type=int)
    g3.add_argument("-o", "--output", required=True)

    e = sub.add_parser("ellipse")
    e.add_argument("n", type=int)
    e.add_argument("--a", type=float, default=1.0)
    e.add_argument("--b", type=float, default=0.6)
    e.add_argument("-o", "--output", required=True)

    l = sub.add_parser("lshape")
    l.add_argument("n", type=int)
    l.add_argument("-o", "--output", required=True)

    cs = sub.add_parser("const_strain",
                        help="displacement field with prescribed constant "
                             "strain (ConstStrainDisplacement_cli)")
    cs.add_argument("mesh")
    cs.add_argument("--strain", type=float, nargs="+", required=True,
                    help="flattened strain (Voigt raw components)")
    cs.add_argument("-o", "--output", required=True)

    eb = sub.add_parser("extract_b",
                        help="displacement->strain matrix in triplet form "
                             "(ExtractBMatrix)")
    eb.add_argument("mesh")
    eb.add_argument("--degree", type=int, default=1)
    eb.add_argument("-o", "--output", required=True)

    args = ap.parse_args(argv)
    from ..io import meshio
    from ..mesh import generators, FEMMesh

    if args.cmd == "grid":
        V, F = generators.grid_tri(args.nx, args.ny)
        meshio.save(args.output, V, F)
    elif args.cmd == "grid3d":
        V, F = generators.grid_tet(args.nx, args.ny, args.nz)
        meshio.save(args.output, V, F)
    elif args.cmd == "ellipse":
        V, F = generators.ellipse(args.n, args.a, args.b)
        meshio.save(args.output, V, F)
    elif args.cmd == "lshape":
        V, F = generators.l_shape(args.n)
        meshio.save(args.output, V, F)
    elif args.cmd == "const_strain":
        from ..fem.flattening import flat_to_sym

        V, F = meshio.load(args.mesh)
        dim = F.shape[1] - 1
        if dim == 2:
            V = V[:, :2]
        mesh = FEMMesh(V, F, degree=1)
        eps = np.asarray(flat_to_sym(np.asarray(args.strain)))
        u = mesh.node_positions @ eps.T
        meshio.save_msh(args.output, mesh.node_positions, mesh.elem_nodes,
                        fields=[{"name": "u", "data": u, "where": "node",
                                 "kind": "vector"}])
    elif args.cmd == "extract_b":
        import jax.numpy as jnp
        from ..ops import element_matrices as em

        V, F = meshio.load(args.mesh)
        dim = F.shape[1] - 1
        if dim == 2:
            V = V[:, :2]
        mesh = FEMMesh(V, F, degree=args.degree)
        g = mesh.geometry()
        centroid = np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
        B = np.asarray(em.element_strain_matrix(
            g.grad_lambda, mesh.degree, centroid))[:, 0]  # [E, fl, n, d]
        with open(args.output, "w") as f:
            E_, fl, n, d = B.shape
            f.write(f"{E_ * fl} {mesh.num_nodes * d}\n")
            for e in range(E_):
                for a in range(fl):
                    for i in range(n):
                        node = mesh.elem_nodes[e, i]
                        for c in range(d):
                            v = B[e, a, i, c]
                            if v != 0.0:
                                f.write(f"{e * fl + a} {node * d + c} "
                                        f"{v:.17g}\n")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
