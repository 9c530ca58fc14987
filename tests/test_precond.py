"""Preconditioners + the high-contrast homogenization stress test
(VERDICT round-1: BASELINE config 4 — the reference's own 2D
microstructure cell with a 1e3:1 contrast material field, iteration
counts bounded and Ch cross-checked against a host direct solve)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material, MaterialField
from meshfem_tpu.physics.materials import MaterialField as MF
from meshfem_tpu.solvers import cg as cg_mod, precond
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


def test_block_jacobi_and_chebyshev_agree_and_converge_faster():
    sim, free, b = contrast_problem()
    project = cg_mod.mask_projector(free)

    diag = sim.K_diagonal()
    safe = jnp.where(diag > 0, diag, 1.0)
    r_pt = cg_mod.cg(sim.apply_K, project(b), M_inv=lambda r: r / safe,
                     project=project, tol=1e-10, maxiter=20000)

    blocks = precond.node_block_diagonal(sim.Ke, sim.elem_dofs,
                                         sim.num_dofs, 2)
    Mb = precond.block_jacobi_apply(precond.block_jacobi_inv(blocks, free))
    r_bj = cg_mod.cg(sim.apply_K, project(b), M_inv=Mb, project=project,
                     tol=1e-10, maxiter=20000)
    assert int(r_bj.iters) <= int(r_pt.iters)
    np.testing.assert_allclose(np.asarray(r_bj.x), np.asarray(r_pt.x),
                               atol=1e-6)

    Ap = lambda v: project(sim.apply_K(v))
    lmax = precond.estimate_lambda_max(Ap, lambda r: project(Mb(r)),
                                       (sim.num_dofs, 2))
    Mc = precond.chebyshev_preconditioner(Ap, Mb, lmax, degree=6,
                                          project=project)
    r_ch = cg_mod.cg(sim.apply_K, project(b), M_inv=Mc, project=project,
                     tol=1e-10, maxiter=20000)
    assert int(r_ch.iters) < 0.5 * int(r_pt.iters)
    np.testing.assert_allclose(np.asarray(r_ch.x), np.asarray(r_pt.x),
                               atol=1e-6)


def test_block_cg_matches_columnwise():
    sim, free, b = contrast_problem()
    project = cg_mod.mask_projector(free)
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.standard_normal((sim.num_dofs, 2, 3)))
    B = project(B)
    res = cg_mod.cg_block(sim.apply_K, B, project=project, tol=1e-11,
                          maxiter=20000)
    for j in range(3):
        rj = cg_mod.cg(sim.apply_K, B[..., j], project=project, tol=1e-12,
                       maxiter=20000)
        np.testing.assert_allclose(np.asarray(res.x[..., j]),
                                   np.asarray(rj.x), atol=1e-7)


@pytest.mark.skipif(not os.path.exists(REF_MESHES),
                    reason="reference meshes unavailable")
def test_high_contrast_microstructure_homogenization():
    """BASELINE config 4: the reference's 2D microstructure cell, P2, with a
    1e3:1 contrast material field.  The preconditioned cell-problem solve
    must stay within a bounded iteration budget and reproduce the host
    direct-solve homogenized tensor to 1e-8."""
    import scipy.sparse.linalg as spla

    V, F = meshio.load(os.path.join(REF_MESHES, "2D_microstructure.msh"))
    mesh = FEMMesh(V[:, :2], F, degree=2)
    c = np.asarray(mesh.V)[np.asarray(mesh.F)].mean(axis=1)
    E_field = np.where(c[:, 0] < 0.0, 1000.0, 1.0)
    mats = MF.isotropic_field(2, jnp.asarray(E_field),
                              jnp.full(len(E_field), 0.3))
    sim = hom.periodic_simulator(mesh, mats)

    w, iters = hom.solve_cell_problems(sim, tol=1e-12, maxiter=20000,
                                       precond="chebyshev")
    assert max(iters) < 3000, f"iteration budget blown: {iters}"
    vol_cell = mesh.bbox().volume()
    Ch = np.asarray(hom.homogenized_tensor_stress_form(sim, w, vol_cell))

    # Host direct solve: pin node 0 (translations), one solve per RHS.
    K = sim.to_scipy().tolil()
    pin = [0, 1]
    for i in pin:
        K.rows[i] = [i]
        K.data[i] = [1.0]
    K = K.tocsc()
    ws = []
    for i in range(3):
        rhs = np.asarray(sim.constant_strain_load(
            -hom.canonical_strain(2, i))).reshape(-1).copy()
        rhs[pin] = 0.0
        x = spla.spsolve(K, rhs).reshape(sim.num_dofs, 2)
        ws.append(x[np.asarray(sim.dof_map)])
    w_dir = jnp.asarray(np.stack(ws))
    Ch_dir = np.asarray(hom.homogenized_tensor_stress_form(sim, w_dir,
                                                           vol_cell))
    np.testing.assert_allclose(Ch, Ch_dir, rtol=1e-8, atol=1e-8
                               * np.abs(Ch_dir).max())


def test_simulator_precond_options():
    """ElasticitySimulator.solve(precond=...) agrees across preconditioners
    and Chebyshev converges in fewer outer iterations on high contrast."""
    sim, free, b = contrast_problem()
    fixed = ~np.asarray(free, bool)
    nodes = np.flatnonzero(fixed.any(axis=1))
    sim.fix_nodes(nodes, 0.0)
    u_j, r_j = sim.solve(extra_load=b, tol=1e-11, precond="jacobi")
    u_b, r_b = sim.solve(extra_load=b, tol=1e-11, precond="block")
    u_c, r_c = sim.solve(extra_load=b, tol=1e-11, precond="chebyshev")
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_j), atol=1e-7)
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_j), atol=1e-7)
    assert int(r_c.iters) < int(r_j.iters)
