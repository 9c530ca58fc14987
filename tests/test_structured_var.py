"""Variable-material structured path (ops/structured_var.py +
VarStructuredMG): per-element D on Kuhn grids — the grid topology
optimization / microstructure design workload (MaterialField.hh role).
"""

import numpy as np
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.ops import element_matrices as em
from meshfem_tpu.ops.structured_var import StructuredVarP2Elasticity
from meshfem_tpu.ops.structured_mg import VarStructuredMG
from meshfem_tpu.sparse.ebe import EBEKernel
from meshfem_tpu.solvers import cg as cg_mod


def _problem(n=6, hi=(1.0, 1.0, 1.0), contrast=1000.0, seed=0):
    V, T = generators.grid_tet(n, n, n, hi=hi)
    mesh = FEMMesh(V, T, degree=2)
    c = V[T].mean(axis=1)
    mid = np.asarray(hi) / 2
    stiff = ((c - mid) ** 2).sum(axis=1) < 0.08 * min(hi) ** 2
    E_field = np.where(stiff, contrast, 1.0)
    D_elems = np.stack([np.asarray(et.isotropic(3, e, 0.3))
                        for e in E_field])
    return mesh, D_elems


def test_var_operator_matches_ebe():
    """B-factored per-tet apply == assembled element matrices, on an
    anisotropic box with a random material field."""
    V, T = generators.grid_tet(4, 4, 4, hi=(1.3, 0.9, 1.1))
    mesh = FEMMesh(V, T, degree=2)
    rng = np.random.default_rng(0)
    E_field = np.exp(rng.standard_normal(mesh.num_elements))
    D_elems = np.stack([np.asarray(et.isotropic(3, e, 0.3))
                        for e in E_field])
    op = StructuredVarP2Elasticity.build(mesh, D_elems)
    g = mesh.geometry()
    Ke = em.element_elasticity(g.grad_lambda, g.volume,
                               jnp.asarray(D_elems), 2)
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)))
    err = float(jnp.max(jnp.abs(op(u) - kern(u)))) \
        / float(jnp.max(jnp.abs(kern(u))))
    assert err < 1e-13
    derr = float(jnp.max(jnp.abs(
        op.from_channels(op.diagonal_channels()) - kern.diagonal())))
    assert derr < 1e-12 * float(jnp.max(kern.diagonal()))


def test_var_mg_high_contrast():
    """1000:1 inclusion: variable-D V-cycle CG converges in tens of
    iterations (Jacobi needs ~900) and matches the EBE reference."""
    mesh, D_elems = _problem(8)
    X = np.asarray(mesh.node_positions)
    fixed = np.zeros((mesh.num_nodes, 3), bool)
    fixed[X[:, 0] < 1e-9] = True
    mg = VarStructuredMG.build(mesh, D_elems,
                               fixed_mask=jnp.asarray(fixed))
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > 1 - 1e-9, 1] = -0.01
    u, res = mg.solve(jnp.asarray(load))

    g = mesh.geometry()
    Ke = em.element_elasticity(g.grad_lambda, g.volume,
                               jnp.asarray(D_elems), 2)
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    free = jnp.asarray(~fixed, jnp.float64)
    dg = kern.diagonal()
    ref = cg_mod.cg(kern, jnp.asarray(load) * free,
                    M_inv=lambda r: r / jnp.where(dg > 0, dg, 1.0),
                    project=lambda v: v * free, tol=1e-12, maxiter=60000)
    err = float(jnp.max(jnp.abs(u - ref.x))) / float(jnp.max(jnp.abs(ref.x)))
    assert err < 1e-8
    assert int(res.iters) * 10 <= int(ref.iters)


def test_simulator_auto_var_mg():
    """MaterialField on a Kuhn grid routes through the variable-D MG."""
    from meshfem_tpu.physics import ElasticitySimulator
    from meshfem_tpu.physics.materials import MaterialField as MF

    mesh, D_elems = _problem(8)
    c = np.asarray(mesh.V)[np.asarray(mesh.F)].mean(axis=1)
    E_field = np.where(((c - 0.5) ** 2).sum(axis=1) < 0.08, 1000.0, 1.0)
    mats = MF.isotropic_field(3, jnp.asarray(E_field),
                              jnp.full(len(E_field), 0.3))
    sim = ElasticitySimulator(mesh, mats)
    X = np.asarray(mesh.node_positions)
    sim.dirichlet_mask[X[:, 0] < 1e-9] = True
    load = np.zeros((mesh.num_nodes, 3))
    load[X[:, 0] > 1 - 1e-9, 1] = -0.01
    sim.neumann_load = jnp.asarray(load)
    u_mg, r_mg = sim.solve(tol=1e-10, operator="auto")
    u_ref, r_ref = sim.solve(tol=1e-12, operator="ebe", precond="block")
    err = float(jnp.max(jnp.abs(u_mg - u_ref))) \
        / float(jnp.max(jnp.abs(u_ref)))
    assert err < 1e-8
    assert int(r_mg.iters) * 5 < int(r_ref.iters)
