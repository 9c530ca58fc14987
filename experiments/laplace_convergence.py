"""Laplace/Poisson convergence suite (parity with reference
``experiments/laplace_convergence/run.sh``): P1 vs P2 L2-error slopes on
refining grids under two BC sets (manufactured sin-sin solution, and the
linear/twisted-square Dirichlet sets).

    python experiments/laplace_convergence.py [--max 64] [--cpu]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.physics import PoissonProblem
    from meshfem_tpu.ops import operators

    def l2_error(mesh, u, exact_fn):
        ue = np.apply_along_axis(exact_fn, 1, mesh.node_positions)
        d = jnp.asarray(np.asarray(u) - ue)
        M = operators.mass(mesh)
        return float(np.sqrt(max(float(d @ M(d)), 0.0)))

    exact = lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])
    source = lambda x: 2 * np.pi ** 2 * exact(x)

    print(f"{'n':>5} {'deg':>4} {'L2 error':>14} {'rate':>6}")
    for deg in (1, 2):
        prev = None
        n = 4
        while n <= args.max:
            V, F = generators.grid_tri(n, n)
            mesh = FEMMesh(V, F, degree=deg)
            prob = PoissonProblem(mesh)
            u, res = prob.solve(mesh.bdry_nodes, 0.0, source=source,
                                tol=1e-13)
            err = l2_error(mesh, u, exact)
            rate = np.log2(prev / err) if prev else float("nan")
            print(f"{n:>5} {deg:>4} {err:>14.6e} {rate:>6.2f}")
            prev = err
            n *= 2
        print()


if __name__ == "__main__":
    main()
