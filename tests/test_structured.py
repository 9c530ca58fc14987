"""Structured conv fast path: exactness vs the general EBE operator and
end-to-end CG solve equivalence."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.ops.structured import StructuredP2Elasticity


@pytest.fixture(scope="module")
def setup():
    n = 3
    V, T = generators.grid_tet(n, n, n, hi=(2.0, 2.0, 2.0))
    mesh = FEMMesh(V, T, degree=2)
    mat = Material.isotropic(3, 200.0, 0.3)
    sim = ElasticitySimulator(mesh, mat)
    op = StructuredP2Elasticity.build(mesh, mat.D)
    return mesh, sim, op


def test_operator_exact(setup):
    mesh, sim, op = setup
    rng = np.random.default_rng(0)
    for _ in range(3):
        u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)))
        r1 = np.asarray(sim.apply_K(u))
        r2 = np.asarray(op(u))
        np.testing.assert_allclose(r2, r1, rtol=1e-12, atol=1e-12)


def test_diagonal_exact(setup):
    mesh, sim, op = setup
    d1 = np.asarray(sim.K_diagonal())
    d2 = np.asarray(op.from_channels(op.diagonal_channels()))
    np.testing.assert_allclose(d2, d1, rtol=1e-12)


def test_solve_matches_general(setup):
    """Cantilever solve: structured channel-space CG == general path."""
    mesh, sim, op = setup
    fixed = np.zeros((mesh.num_nodes, 3), dtype=bool)
    left = mesh.nodes_in_box((0, 0, 0), (0, 2, 2))
    fixed[left] = True
    load = np.zeros((mesh.num_nodes, 3))
    right = mesh.nodes_in_box((2, 0, 0), (2, 2, 2))
    load[right, 2] = -0.5

    sim.fix_nodes(left, 0.0)
    u1, _ = sim.solve(extra_load=jnp.asarray(load), tol=1e-12)
    u2, res2 = op.solve_cg(jnp.asarray(load), fixed_mask=jnp.asarray(fixed),
                           tol=1e-12)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-8)


@pytest.mark.parametrize("n", [2, 4, 5, 7])
def test_packed_matches_channels(n):
    """Lane-packed apply == channel-space apply == EBE, for grid sizes
    aligned and misaligned with the z-pack factor P=5."""
    V, T = generators.grid_tet(n, n, n)
    mesh = FEMMesh(V, T, degree=2)
    mat = Material.isotropic(3, 75.0, 0.35)
    sim = ElasticitySimulator(mesh, mat)
    op = StructuredP2Elasticity.build(mesh, mat.D)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)))
    ref = np.asarray(sim.apply_K(u))
    via_packed = np.asarray(op.from_packed(op.apply_packed(op.to_packed(u))))
    np.testing.assert_allclose(via_packed, ref, rtol=1e-11, atol=1e-11)
    # diagonal + valid mask agree through the packing
    d1 = np.asarray(op.from_channels(op.diagonal_channels()))
    d2 = np.asarray(op.from_packed(op.diagonal_packed()))
    np.testing.assert_allclose(d2, d1, rtol=1e-12)


def test_anisotropic_box_grid():
    """Per-axis cell counts and spacings (2:1:1 cantilever box)."""
    V, T = generators.grid_tet(6, 3, 4, hi=(2.0, 1.0, 1.0))
    mesh = FEMMesh(V, T, degree=2)
    mat = Material.isotropic(3, 200.0, 0.3)
    sim = ElasticitySimulator(mesh, mat)
    op = StructuredP2Elasticity.build(mesh, mat.D)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)))
    np.testing.assert_allclose(np.asarray(op(u)), np.asarray(sim.apply_K(u)),
                               rtol=1e-11, atol=1e-11)
    d1 = np.asarray(sim.K_diagonal())
    d2 = np.asarray(op.from_packed(op.diagonal_packed()))
    np.testing.assert_allclose(d2, d1, rtol=1e-11)
