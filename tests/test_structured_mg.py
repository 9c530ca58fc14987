"""Structured geometric multigrid (ops/structured_mg.py).

Validates the mathematical load-bearing claims:
  * transfer adjointness (R == P^T exactly);
  * Galerkin == rediscretization for BOTH coarsenings (P1 c P2 on the
    same mesh; Kuhn self-similarity under 2:1 refinement) — this is what
    lets every level be an assembly-free conv/matmul operator;
  * MG-PCG reproduces the EBE reference solve and cuts iteration counts
    by >= 10x; the splu coarse fallback (odd grid tails) works.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.fem.elasticity_tensor import ElasticityTensor
from meshfem_tpu.ops import element_matrices as em
from meshfem_tpu.ops.structured_mg import (
    StructuredMG, prolong_p2, restrict_p2, prolong_h, restrict_h)
from meshfem_tpu.sparse import assembly
from meshfem_tpu.sparse.ebe import EBEKernel
from meshfem_tpu.solvers import cg as cg_mod

D = ElasticityTensor.isotropic(3, 200.0, 0.3).D


def _assemble(mesh, deg):
    g = mesh.geometry()
    Ke = em.element_elasticity(g.grad_lambda, g.volume, jnp.asarray(D), deg)
    return assembly.assemble_scipy(np.asarray(Ke, np.float64),
                                   mesh.elem_nodes, mesh.num_nodes, d=3)


def _midpoint_transfer(Xf, Xc, h):
    """Host reference transfer: fine node -> (coarse endpoints, 1/2)."""
    keyc = {tuple(np.round(x, 9)): i for i, x in enumerate(Xc)}
    rows, cols, vals = [], [], []
    for i, x in enumerate(Xf):
        qi = np.round(x / (np.asarray(h) / 2)).astype(int)
        bits = qi % 2
        c = (qi // 2) * h
        if bits.sum() == 0:
            rows.append(i)
            cols.append(keyc[tuple(np.round(x, 9))])
            vals.append(1.0)
        else:
            rows += [i, i]
            cols += [keyc[tuple(np.round(c, 9))],
                     keyc[tuple(np.round(c + bits * h, 9))]]
            vals += [0.5, 0.5]
    P = sp.coo_matrix((vals, (rows, cols)), shape=(len(Xf), len(Xc)))
    return sp.kron(P.tocsr(), sp.eye(3)).tocsr()


def test_transfers_are_adjoint():
    rng = np.random.default_rng(0)
    n = 6
    v = jnp.asarray(rng.standard_normal((n + 1, n + 1, n + 1, 3)))
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1, n + 1, 8, 3)))
    assert abs(float(jnp.vdot(prolong_p2(v), u)
                     - jnp.vdot(v, restrict_p2(u)))) < 1e-10
    vc = jnp.asarray(rng.standard_normal((n // 2 + 1,) * 3 + (3,)))
    uf = jnp.asarray(rng.standard_normal((n + 1,) * 3 + (3,)))
    assert abs(float(jnp.vdot(prolong_h(vc, (n, n, n)), uf)
                     - jnp.vdot(vc, restrict_h(uf, (n // 2,) * 3)))) < 1e-10


def test_galerkin_equals_rediscretization():
    """P^T A P == rediscretized coarse for both coarsening steps, on an
    anisotropic box (the exactness that justifies assembly-free levels)."""
    n, hi = 4, (1.3, 0.9, 1.1)
    V, T = generators.grid_tet(n, n, n, hi=hi)
    m2 = FEMMesh(V, T, degree=2)
    m1 = FEMMesh(V, T, degree=1)
    A2, A1 = _assemble(m2, 2), _assemble(m1, 1)
    h = np.asarray(hi) / n
    P = _midpoint_transfer(np.asarray(m2.node_positions),
                           np.asarray(m1.node_positions), h)
    err = abs(P.T @ A2 @ P - A1).max()
    assert err < 1e-10 * abs(A1).max()

    Vc, Tc = generators.grid_tet(n // 2, n // 2, n // 2, hi=hi)
    mc = FEMMesh(Vc, Tc, degree=1)
    Ac = _assemble(mc, 1)
    Ph = _midpoint_transfer(np.asarray(m1.node_positions),
                            np.asarray(mc.node_positions), h * 2)
    err = abs(Ph.T @ A1 @ Ph - Ac).max()
    assert err < 1e-10 * abs(Ac).max()


def _mg_problem(n, hi=(1.0, 1.0, 1.0), **kw):
    V, T = generators.grid_tet(n, n, n, hi=hi)
    mesh = FEMMesh(V, T, degree=2)
    X = np.asarray(mesh.node_positions)
    fixed = np.zeros((mesh.num_nodes, 3), bool)
    fixed[X[:, 0] < 1e-9] = True
    mg = StructuredMG.build(mesh, D, fixed_mask=jnp.asarray(fixed), **kw)
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > hi[0] - 1e-9, 1] = -0.01
    return mesh, mg, fixed, jnp.asarray(load)


def _reference_solve(mesh, fixed, load, maxiter=40000):
    g = mesh.geometry()
    Ke = em.element_elasticity(g.grad_lambda, g.volume, jnp.asarray(D), 2)
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    free = jnp.asarray(~fixed, jnp.float64)
    dg = kern.diagonal()
    return cg_mod.cg(kern, load * free,
                     M_inv=lambda r: r / jnp.where(dg > 0, dg, 1.0),
                     project=lambda v: v * free, tol=1e-12,
                     maxiter=maxiter)


def test_mg_solve_matches_reference_and_cuts_iterations():
    mesh, mg, fixed, load = _mg_problem(8)
    ref = _reference_solve(mesh, fixed, load)
    u, res = mg.solve(load)
    err = float(jnp.max(jnp.abs(u - ref.x))) / float(jnp.max(jnp.abs(ref.x)))
    assert err < 1e-8
    assert int(res.iters) * 10 <= int(ref.iters), \
        f"MG {int(res.iters)} vs CG {int(ref.iters)}"


def test_mg_anisotropic_box_and_deeper_chain():
    mesh, mg, fixed, load = _mg_problem(12, hi=(1.3, 0.9, 1.1),
                                        dense_cap=2000)
    assert len(mg.levels) >= 2          # 12 -> 6 at least
    ref = _reference_solve(mesh, fixed, load)
    u, res = mg.solve(load)
    err = float(jnp.max(jnp.abs(u - ref.x))) / float(jnp.max(jnp.abs(ref.x)))
    assert err < 1e-8
    assert int(res.iters) <= 40


def test_mg_splu_coarse_fallback():
    """Odd chain tail: coarsest level too big for the dense cap ->
    host SuperLU through pure_callback."""
    mesh, mg, fixed, load = _mg_problem(10, dense_cap=500)
    assert mg.coarse_inv is None        # forced the splu path
    ref = _reference_solve(mesh, fixed, load)
    u, res = mg.solve(load)
    err = float(jnp.max(jnp.abs(u - ref.x))) / float(jnp.max(jnp.abs(ref.x)))
    assert err < 1e-8


def test_simulator_auto_picks_mg_on_grids():
    """ElasticitySimulator.solve(operator='auto') routes Kuhn grids to
    the MG path; non-grids fall back; operator='structured' on a
    non-grid raises."""
    from meshfem_tpu.physics import ElasticitySimulator, Material

    V, T = generators.grid_tet(8, 8, 8)
    mesh = FEMMesh(V, T, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(3, 200.0, 0.3))
    X = np.asarray(mesh.node_positions)
    sim.dirichlet_mask[X[:, 0] < 1e-9] = True
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > 1 - 1e-9, 1] = -0.01
    sim.neumann_load = jnp.asarray(load)
    u_mg, res_mg = sim.solve(tol=1e-10, operator="auto")
    u_ebe, res_ebe = sim.solve(tol=1e-12, operator="ebe")
    err = float(jnp.max(jnp.abs(u_mg - u_ebe))) \
        / float(jnp.max(jnp.abs(u_ebe)))
    assert err < 1e-8
    assert int(res_mg.iters) * 5 < int(res_ebe.iters)

    # a perturbed (non-grid) mesh: explicit structured raises; auto works
    V2 = V.copy()
    interior = ((V2 > 0.1) & (V2 < 0.9)).all(axis=1)
    V2[interior] += 0.01
    mesh2 = FEMMesh(V2, T, degree=2)
    sim2 = ElasticitySimulator(mesh2, Material.isotropic(3, 200.0, 0.3))
    sim2.dirichlet_mask[X[:, 0] < 1e-9] = True
    sim2.neumann_load = jnp.asarray(load)
    with pytest.raises(ValueError):
        sim2.solve(operator="structured")
    u2, _ = sim2.solve(tol=1e-10, operator="auto")
    assert np.isfinite(np.asarray(u2)).all()


def test_mg_dirichlet_values():
    """Inhomogeneous Dirichlet: stretched block reproduces the linear
    displacement field exactly (patch test)."""
    n = 6
    V, T = generators.grid_tet(n, n, n)
    mesh = FEMMesh(V, T, degree=2)
    X = np.asarray(mesh.node_positions)
    fixed = np.zeros((mesh.num_nodes, 3), bool)
    fixed[X[:, 0] < 1e-9] = True
    fixed[X[:, 0] > 1 - 1e-9] = True
    vals = np.zeros((mesh.num_nodes, 3))
    vals[:, 0] = 0.1 * X[:, 0]
    nu = 0.3
    vals[:, 1] = -nu * 0.1 * X[:, 1]
    vals[:, 2] = -nu * 0.1 * X[:, 2]
    mg = StructuredMG.build(mesh, D, fixed_mask=jnp.asarray(fixed))
    u, res = mg.solve(jnp.zeros((mesh.num_nodes, 3)),
                      fixed_values=jnp.asarray(vals))
    # uniaxial stretch of an isotropic block: u = (0.1x, -nu 0.1y, ...)
    np.testing.assert_allclose(np.asarray(u), vals, atol=5e-9)


def test_mg_pure_neumann_pinv_coarse():
    """No Dirichlet anywhere: the coarsest matrix is singular (rigid
    modes) and build falls to the pseudo-inverse; the V-cycle stays
    finite and SPD on rigid-mode-free residuals."""
    V, T = generators.grid_tet(6, 6, 6)
    mesh = FEMMesh(V, T, degree=2)
    mg = StructuredMG.build(mesh, D)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)))
    # remove translations (the dominant nullspace component)
    r = r - r.mean(axis=0, keepdims=True)
    rp = mg.fine.to_packed(r) * mg.free_packed
    Br = mg.precondition(rp)
    assert np.isfinite(np.asarray(Br)).all()
    assert float(jnp.vdot(rp, Br)) > 0


def test_simulator_structured_f32_refinement_branch():
    """The f32-MG + f64-refinement branch of _solve_structured (taken on
    TPU backends at tight tolerances) runs and matches the f64 answer —
    exercised here by injecting an f32-built MG into the cache."""
    from meshfem_tpu.physics import ElasticitySimulator, Material

    V, T = generators.grid_tet(8, 8, 8)
    mesh = FEMMesh(V, T, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(3, 200.0, 0.3))
    X = np.asarray(mesh.node_positions)
    sim.dirichlet_mask[X[:, 0] < 1e-9] = True
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > 1 - 1e-9, 1] = -0.01
    sim.neumann_load = jnp.asarray(load)
    mg32 = StructuredMG.build(mesh, D,
                              fixed_mask=jnp.asarray(sim.dirichlet_mask),
                              dtype=jnp.float32)
    sim._mg = (sim.dirichlet_mask.tobytes(), mg32)
    u32, res = sim._solve_structured(
        sim.neumann_load, jnp.asarray(sim.dirichlet_mask),
        jnp.asarray(sim.dirichlet_values), 1e-10, 500)
    u_ref, _ = sim.solve(tol=1e-12, operator="ebe")
    err = float(jnp.max(jnp.abs(u32 - u_ref))) \
        / float(jnp.max(jnp.abs(u_ref)))
    assert err < 1e-7
    assert float(res.resnorm) < 1e-9
