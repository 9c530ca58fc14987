"""Poisson end-to-end solves (parity with reference Poisson_cli +
laplace_convergence experiments)."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import PoissonProblem


def test_p1_reproduces_linear():
    """P1 Galerkin is exact for harmonic linear solutions."""
    V, F = generators.grid_tri(5, 4)
    mesh = FEMMesh(V, F, degree=1)
    exact = mesh.node_positions @ np.array([2.0, -1.0]) + 0.5
    prob = PoissonProblem(mesh)
    u, res = prob.solve(mesh.bdry_nodes, exact[mesh.bdry_nodes], tol=1e-14)
    np.testing.assert_allclose(np.asarray(u), exact, atol=1e-10)


@pytest.mark.parametrize("K", [2, 3])
def test_p2_reproduces_quadratic(K):
    """P2 Galerkin with consistent load is exact for quadratic solutions."""
    if K == 2:
        V, F = generators.grid_tri(4, 4)
        coef = np.array([1.0, -2.0])
    else:
        V, F = generators.grid_tet(2, 2, 2)
        coef = np.array([1.0, -2.0, 1.5])
    mesh = FEMMesh(V, F, degree=2)
    X = mesh.node_positions
    exact = (X ** 2) @ coef                 # u = sum c_i x_i^2
    f = -2.0 * coef.sum()                   # f = -Laplace(u)
    prob = PoissonProblem(mesh)
    u, res = prob.solve(mesh.bdry_nodes, exact[mesh.bdry_nodes],
                        source=lambda x: f, tol=1e-14)
    np.testing.assert_allclose(np.asarray(u), exact, atol=1e-8)


def l2_error(mesh, u, exact_fn):
    from meshfem_tpu.ops import operators

    ue = np.apply_along_axis(exact_fn, 1, mesh.node_positions)
    d = jnp.asarray(np.asarray(u) - ue)
    M = operators.mass(mesh)
    return float(np.sqrt(d @ M(d)))


@pytest.mark.parametrize("deg,order", [(1, 2.0), (2, 3.0)])
def test_convergence_rate(deg, order):
    """Manufactured solution u = sin(pi x) sin(pi y): L2 error ~ h^(deg+1)."""
    errs = []
    for n in (8, 16):
        V, F = generators.grid_tri(n, n)
        mesh = FEMMesh(V, F, degree=deg)

        def exact(x):
            return np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])

        def source(x):
            return 2 * np.pi ** 2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])

        prob = PoissonProblem(mesh)
        u, _ = prob.solve(mesh.bdry_nodes, 0.0, source=source, tol=1e-12)
        errs.append(l2_error(mesh, u, exact))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.35, (errs, rate)


def test_neumann_flux():
    """-u'' = 0, u(0)=0, du/dn = 1 on x=1 edge of the unit square: u = x."""
    V, F = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, F, degree=1)
    prob = PoissonProblem(mesh)
    left = mesh.nodes_in_box((0, 0), (0, 1))
    right_be = mesh.boundary_elems_in_box((1, 0), (1, 1))
    load = prob.neumann_load(np.ones(len(right_be)), right_be)
    u, _ = prob.solve(left, 0.0, extra_load=load, tol=1e-13)
    np.testing.assert_allclose(np.asarray(u), mesh.node_positions[:, 0],
                               atol=1e-9)


def test_average_gradient():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    prob = PoissonProblem(mesh)
    u = jnp.asarray(mesh.node_positions @ np.array([3.0, 4.0]))
    np.testing.assert_allclose(np.asarray(prob.average_gradient(u)),
                               [3.0, 4.0], atol=1e-12)
