"""Morton reordering: solution invariance and structural integrity."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.mesh.reorder import reorder_mesh
from meshfem_tpu.physics import ElasticitySimulator, Material


def test_reorder_preserves_mesh():
    V, T = generators.grid_tet(3, 3, 3)
    V2, T2, vperm, eperm = reorder_mesh(V, T)
    assert V2.shape == V.shape and T2.shape == T.shape
    # Same geometry: element volumes multiset identical; vertex sets map.
    np.testing.assert_allclose(V2[vperm], V, atol=0)
    m1 = FEMMesh(V, T)
    m2 = FEMMesh(V2, T2)
    assert m2.volume() == pytest.approx(m1.volume(), rel=1e-12)
    v1 = np.sort(np.asarray(m1.geometry().volume))
    v2 = np.sort(np.asarray(m2.geometry().volume))
    np.testing.assert_allclose(v1, v2, atol=1e-15)


def test_reorder_solution_invariance():
    """Same physics: cantilever solves agree through the permutation."""
    V, T = generators.grid_tet(4, 2, 2, hi=(2.0, 1.0, 1.0))
    V2, T2, vperm, eperm = reorder_mesh(V, T)
    mat = Material.isotropic(3, 100.0, 0.3)

    def solve(Vx, Tx):
        mesh = FEMMesh(Vx, Tx, degree=1)
        sim = ElasticitySimulator(mesh, mat)
        sim.fix_nodes(mesh.nodes_in_box((0, 0, 0), (0, 1, 1)))
        load = np.zeros((mesh.num_nodes, 3))
        tip = mesh.nodes_in_box((2, 0, 0), (2, 1, 1))
        load[tip, 2] = -0.1
        u, _ = sim.solve(extra_load=jnp.asarray(load), tol=1e-12)
        return mesh, np.asarray(u)

    m1, u1 = solve(V, T)
    m2, u2 = solve(V2, T2)
    # P1: node order = vertex order; compare through vperm.
    np.testing.assert_allclose(u2[vperm], u1, atol=1e-8)
