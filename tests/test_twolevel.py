"""P1-coarse two-level preconditioner (solvers/twolevel.py).

Unstructured / high-contrast iteration-count control — the role CHOLMOD's
factorize-once plays for the reference (``PeriodicHomogenization.hh:48``).
"""

import os

import numpy as np
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator
from meshfem_tpu.physics.materials import MaterialField as MF
from meshfem_tpu.solvers import cg as cg_mod
from meshfem_tpu.solvers.twolevel import TwoLevel, p2_vertex_endpoints
from meshfem_tpu.analysis import homogenization as hom
from meshfem_tpu.io import meshio

REF_MESHES = "/root/reference/examples/meshes"


def contrast_problem():
    V, F = generators.grid_tri(12, 12)
    mesh = FEMMesh(V, F, degree=2)
    c = V[F].mean(axis=1)
    stiff = ((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2) < 0.06
    E_field = np.where(stiff, 1000.0, 1.0)
    mats = MF.isotropic_field(2, jnp.asarray(E_field),
                              jnp.full(len(E_field), 0.3))
    sim = ElasticitySimulator(mesh, mats)
    fixed = np.zeros((mesh.num_nodes, 2), dtype=bool)
    fixed[mesh.nodes_in_box((0, 0), (0, 1))] = True
    free = jnp.asarray(~fixed, jnp.float64)
    load = np.zeros((mesh.num_nodes, 2))
    load[mesh.nodes_in_box((1, 0), (1, 1)), 1] = -1.0
    return sim, free, jnp.asarray(load)


def test_endpoints_interpolate_positions():
    """Every P2 node is the midpoint of its endpoint vertices — the fact
    the whole module rests on (exactness of P -> Galerkin == P1)."""
    V, T = generators.grid_tet(3, 3, 3)
    mesh = FEMMesh(V, T, degree=2, node_order="morton")
    ep = p2_vertex_endpoints(mesh)
    X = np.asarray(mesh.node_positions)
    mid = 0.5 * (np.asarray(mesh.V)[ep[:, 0]] + np.asarray(mesh.V)[ep[:, 1]])
    np.testing.assert_allclose(X, mid, atol=1e-12)


def test_twolevel_symmetric_and_faster_than_jacobi():
    sim, free, b = contrast_problem()
    project = lambda v: v * free
    dg = sim.K_diagonal()
    safe = jnp.where(dg > 0, dg, 1.0)
    res_j = cg_mod.cg(sim.apply_K, project(b), M_inv=lambda r: r / safe,
                      project=project, tol=1e-12, maxiter=50000)
    rng = np.random.default_rng(0)
    r1 = project(jnp.asarray(rng.standard_normal(b.shape)))
    r2 = project(jnp.asarray(rng.standard_normal(b.shape)))
    for mode in ("additive", "multiplicative"):
        tl = TwoLevel.from_simulator(sim, mode=mode, free_mask=free,
                                     project=project)
        s1 = float(jnp.vdot(tl.M_inv(r1), r2))
        s2 = float(jnp.vdot(r1, tl.M_inv(r2)))
        assert abs(s1 - s2) < 1e-9 * abs(s1)          # symmetric
        assert float(jnp.vdot(r1, tl.M_inv(r1))) > 0  # positive
        res = cg_mod.cg(sim.apply_K, project(b), M_inv=tl.M_inv,
                        project=project, tol=1e-12, maxiter=50000)
        err = float(jnp.max(jnp.abs(res.x - res_j.x))) \
            / float(jnp.max(jnp.abs(res_j.x)))
        assert err < 1e-9
        assert int(res.iters) * 3 <= int(res_j.iters), \
            f"{mode}: {int(res.iters)} vs jacobi {int(res_j.iters)}"


def test_simulator_solve_twolevel():
    sim, free, b = contrast_problem()
    fixed = ~np.asarray(free, bool)
    sim.dirichlet_mask[:] = fixed
    sim.neumann_load = b
    u_ref, _ = sim.solve(tol=1e-12, precond="jacobi", operator="ebe")
    u_tl, res = sim.solve(tol=1e-12, precond="twolevel", operator="ebe")
    err = float(jnp.max(jnp.abs(u_tl - u_ref))) \
        / float(jnp.max(jnp.abs(u_ref)))
    assert err < 1e-9


def test_high_contrast_microstructure_twolevel():
    """VERDICT round-2 item 3 acceptance: the reference's 2D
    microstructure cell (1e3:1 contrast, periodic) converging in <= 300
    outer iterations — measured 52 (additive) / 34 (multiplicative)."""
    V, F = meshio.load(os.path.join(REF_MESHES, "2D_microstructure.msh"))
    mesh = FEMMesh(V[:, :2], F, degree=2)
    c = np.asarray(mesh.V)[np.asarray(mesh.F)].mean(axis=1)
    E_field = np.where(c[:, 0] < 0.0, 1000.0, 1.0)
    mats = MF.isotropic_field(2, jnp.asarray(E_field),
                              jnp.full(len(E_field), 0.3))
    sim = hom.periodic_simulator(mesh, mats)
    w, iters = hom.solve_cell_problems(sim, tol=1e-12, maxiter=2000,
                                       precond="twolevel")
    assert max(iters) <= 300, iters
    vol = mesh.bbox().volume()
    Ch = np.asarray(hom.homogenized_tensor_stress_form(sim, w, vol))
    w2, iters2 = hom.solve_cell_problems(sim, tol=1e-12, maxiter=2000,
                                         precond="twolevel-mult")
    assert max(iters2) <= 150, iters2
    Ch2 = np.asarray(hom.homogenized_tensor_stress_form(sim, w2, vol))
    np.testing.assert_allclose(Ch, Ch2, rtol=1e-8,
                               atol=1e-8 * np.abs(Ch).max())
