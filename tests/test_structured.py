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
