"""Device-resident unstructured multigrid (solvers/amg.py).

Runs on CPU with the routing kernels in interpret mode.  The hierarchy
replaces the CHOLMOD factorize-once role (``SparseMatrices.hh:1984-2296``)
for arbitrary meshes: bounded PCG iterations with every level on device.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.solvers.amg import UnstructuredMG


def _cantilever(n=5, contrast=None):
    V, T = generators.grid_tet(n, n, n)
    mesh = FEMMesh(V, T, degree=2)
    if contrast is None:
        mat = Material.isotropic(3, 200.0, 0.3)
    else:
        from meshfem_tpu.physics.materials import MaterialField

        cent = V[T].mean(axis=1)
        E = np.where(cent[:, 2] > 0.5, 200.0, 200.0 / contrast)
        mat = MaterialField.isotropic_field(
            3, jnp.asarray(E), jnp.full(len(E), 0.3))
    sim = ElasticitySimulator(mesh, mat)
    X = np.asarray(mesh.node_positions)
    sim.dirichlet_mask[X[:, 0] < 1e-9] = True
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > 1 - 1e-9, 1] = -0.01
    sim.neumann_load = jnp.asarray(load)
    return sim


def test_amg_vcycle_symmetric(rng):
    """<x, M y> == <y, M x>: the V-cycle is a symmetric linear map (a
    hard requirement for plain-CG preconditioning)."""
    sim = _cantilever(4)
    mg = UnstructuredMG.build(sim, agg_size=12, coarse_target=200)
    x = jnp.asarray(rng.standard_normal((sim.num_dofs, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((sim.num_dofs, 3)), jnp.float32)
    x = x * mg.free_f
    y = y * mg.free_f
    Mx = mg.precondition(x)
    My = mg.precondition(y)
    a = float(jnp.vdot(y, Mx))
    b = float(jnp.vdot(x, My))
    assert abs(a - b) <= 1e-4 * max(abs(a), abs(b))
    # positive definite on a random free vector
    assert float(jnp.vdot(x, Mx)) > 0


def test_amg_solve_matches_ebe(rng):
    """MG-PCG reproduces the f64 EBE reference solve in bounded
    iterations (<= 60 at this size vs hundreds for Jacobi CG); built
    with a forced AGGREGATION level so the full hierarchy (P2 -> P1 ->
    agg -> dense) is exercised, not just the two-level fallback."""
    sim = _cantilever(5)
    u0, _ = sim.solve(tol=1e-12, operator="ebe")
    mg = UnstructuredMG.build(sim, agg_size=16, coarse_target=200)
    assert len(mg.levels) >= 1
    b = sim.neumann_load
    u1, res = mg.solve(jnp.asarray(b, jnp.float32), tol=1e-6, maxiter=120)
    scale = np.abs(np.asarray(u0)).max()
    assert int(res.iters) <= 60
    np.testing.assert_allclose(np.asarray(u1) / scale,
                               np.asarray(u0) / scale, atol=2e-5)


def test_amg_bounded_iters_high_contrast(rng):
    """1e4 material contrast: iteration count stays bounded (the case
    where plain Jacobi CG explodes into thousands of iterations)."""
    sim = _cantilever(5, contrast=1e4)
    mg = UnstructuredMG.build(sim)
    b = sim.neumann_load
    u, res = mg.solve(jnp.asarray(b, jnp.float32), tol=1e-6, maxiter=300)
    assert int(res.iters) <= 150
    # cross-check against the f64 reference solve
    u0, _ = sim.solve(tol=1e-12, operator="ebe", precond="block")
    scale = np.abs(np.asarray(u0)).max()
    np.testing.assert_allclose(np.asarray(u)[:, 1] / scale,
                               np.asarray(u0)[:, 1] / scale, atol=5e-4)


def test_amg_refined_to_1e10(rng):
    """f64 refinement around the f32 MG solve reaches 1e-10 — the full
    CHOLMOD-role contract on an unstructured path."""
    from meshfem_tpu.solvers.refine import refine

    sim = _cantilever(5)
    mg = UnstructuredMG.build(sim)
    fixed = jnp.asarray(sim.dirichlet_mask)
    free64 = (~fixed).astype(jnp.float64)
    b64 = jnp.asarray(sim.neumann_load, jnp.float64) * free64
    apply_hi = lambda x: sim.apply_K(x) * free64

    def solve_lo(r32):
        u, res = mg.solve(r32, tol=1e-4, maxiter=80)
        return u, int(res.iters)

    ref = refine(apply_hi, solve_lo, b64, tol=1e-10)
    assert ref.resnorm <= 1e-10
    assert ref.rounds <= 8


def test_amg_through_simulator(rng):
    """precond='amg' through the simulator surface (routed operator)."""
    sim = _cantilever(5)
    u0, _ = sim.solve(tol=1e-12, operator="ebe")
    u1, res = sim.solve(tol=1e-9, operator="routed", precond="amg")
    scale = np.abs(np.asarray(u0)).max()
    np.testing.assert_allclose(np.asarray(u1) / scale,
                               np.asarray(u0) / scale, atol=1e-7)
    assert float(res.resnorm) <= 1e-9
