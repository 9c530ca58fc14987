"""Mass/Laplacian property tests (parity with reference
``tests/test_mass.cc:7-45``: u^T M u == int ||u_interp||^2 for random fields,
2D/3D x P1/P2, tol 1e-14)."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.ops import operators
from meshfem_tpu.fem import quadrature, shape_functions as sf


def make_mesh(K, deg):
    if K == 2:
        V, F = generators.grid_tri(4, 3)
    else:
        V, T = generators.grid_tet(2, 2, 2)
        V, F = V, T
    return FEMMesh(V, F, degree=deg)


def integrate_field_sq(mesh, u):
    """Direct quadrature of int u_interp^2 over the mesh."""
    P, W = quadrature.rule_np(mesh.K, 2 * mesh.degree
                              if mesh.K == 2 else min(2 * mesh.degree, 4))
    N = sf.eval_shape_np(mesh.K, mesh.degree, P)        # [Q, n]
    ue = np.asarray(u)[mesh.elem_nodes]                 # [E, n]
    uq = ue @ N.T                                       # [E, Q]
    vol = np.asarray(mesh.geometry().volume)
    return float(np.einsum("e,q,eq->", vol, W, uq ** 2))


@pytest.mark.parametrize("K", [2, 3])
@pytest.mark.parametrize("deg", [1, 2])
def test_mass_matrix_l2(K, deg, rng):
    mesh = make_mesh(K, deg)
    M = operators.mass(mesh)
    for _ in range(8):
        u = jnp.asarray(rng.standard_normal(mesh.num_nodes))
        quad = integrate_field_sq(mesh, u)
        # P2 tet needs a degree-4 rule (exact since u^2 has degree 4). OK.
        assert float(u @ M(u)) == pytest.approx(quad, rel=1e-12)


@pytest.mark.parametrize("K", [2, 3])
@pytest.mark.parametrize("deg", [1, 2])
def test_mass_total(K, deg):
    mesh = make_mesh(K, deg)
    M = operators.mass(mesh)
    ones = jnp.ones(mesh.num_nodes)
    assert float(ones @ M(ones)) == pytest.approx(mesh.volume(), rel=1e-12)
    Ml = operators.mass(mesh, lumped=True)
    assert float(jnp.sum(Ml)) == pytest.approx(mesh.volume(), rel=1e-12)


@pytest.mark.parametrize("K", [2, 3])
@pytest.mark.parametrize("deg", [1, 2])
def test_laplacian_nullspace_and_energy(K, deg, rng):
    mesh = make_mesh(K, deg)
    L = operators.laplacian(mesh)
    ones = jnp.ones(mesh.num_nodes)
    np.testing.assert_allclose(np.asarray(L(ones)), 0.0, atol=1e-11)
    # Linear field u = a . x: u^T L u = |a|^2 * volume (P1 and P2 both exact).
    a = rng.standard_normal(mesh.dim)
    u = jnp.asarray(mesh.node_positions @ a)
    assert float(u @ L(u)) == pytest.approx(
        float(a @ a) * mesh.volume(), rel=1e-11)


def test_laplacian_vs_scipy_assembly():
    """EBE matrix-free apply agrees with the assembled CSR matrix."""
    mesh = make_mesh(2, 2)
    L = operators.laplacian(mesh)
    A = L.to_scipy()
    rng = np.random.default_rng(1)
    u = rng.standard_normal(mesh.num_nodes)
    np.testing.assert_allclose(np.asarray(L(jnp.asarray(u))), A @ u,
                               atol=1e-11)
    # symmetry
    assert abs(A - A.T).max() < 1e-12


def test_vector_mass_matches_scalar():
    mesh = make_mesh(2, 2)
    M = operators.mass(mesh)
    Mv = operators.mass_elasticity(mesh)
    rng = np.random.default_rng(2)
    u = rng.standard_normal((mesh.num_nodes, mesh.dim))
    out_v = np.asarray(Mv(jnp.asarray(u)))
    for c in range(mesh.dim):
        np.testing.assert_allclose(out_v[:, c],
                                   np.asarray(M(jnp.asarray(u[:, c]))),
                                   atol=1e-12)


def test_gradient_exact_for_linear():
    mesh = make_mesh(2, 2)
    a = np.array([0.3, -1.2])
    u = jnp.asarray(mesh.node_positions @ a + 0.7)
    g = np.asarray(operators.gradient(mesh, u))
    np.testing.assert_allclose(g, np.tile(a, (mesh.num_elements, 1)),
                               atol=1e-12)


def test_divergence_adjoint():
    """divergence load == -L u when X = grad u (integration by parts,
    zero-boundary test function identity on the full operator)."""
    mesh = make_mesh(2, 1)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(mesh.num_nodes))
    X = operators.gradient(mesh, u)   # P1: exact per-element grad
    b = np.asarray(operators.divergence(mesh, X))
    L = operators.laplacian(mesh)
    np.testing.assert_allclose(b, -np.asarray(L(u)), atol=1e-11)
