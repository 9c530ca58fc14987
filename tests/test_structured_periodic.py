"""Periodic torus structured path (ops/structured_periodic.py):
homogenization cell problems on voxel/grid microstructures with
MG-bounded iteration counts (PeriodicHomogenization.hh:48-53 role).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.analysis import homogenization as hom
from meshfem_tpu.physics.materials import MaterialField as MF
from meshfem_tpu.ops.structured_periodic import (
    PeriodicVarP2Elasticity, torus_prolong_p2, torus_restrict_p2,
    torus_prolong_h, torus_restrict_h)


def _grid_cell(n=4, contrast=1000.0):
    V, T = generators.grid_tet(n, n, n)
    mesh = FEMMesh(V, T, degree=2)
    c = V[T].mean(axis=1)
    E_field = np.where(((c - 0.5) ** 2).sum(axis=1) < 0.08, contrast, 1.0)
    mats = MF.isotropic_field(3, jnp.asarray(E_field),
                              jnp.full(len(E_field), 0.3))
    return mesh, mats


def test_torus_transfers_adjoint():
    rng = np.random.default_rng(0)
    n = 4
    v = jnp.asarray(rng.standard_normal((n, n, n, 3)))
    u = jnp.asarray(rng.standard_normal((n, n, n, 8, 3)))
    assert abs(float(jnp.vdot(torus_prolong_p2(v), u)
                     - jnp.vdot(v, torus_restrict_p2(u)))) < 1e-10
    vc = jnp.asarray(rng.standard_normal((n // 2,) * 3 + (3,)))
    uf = jnp.asarray(rng.standard_normal((n,) * 3 + (3,)))
    assert abs(float(jnp.vdot(torus_prolong_h(vc), uf)
                     - jnp.vdot(vc, torus_restrict_h(uf)))) < 1e-10


def test_periodic_operator_matches_ebe():
    """Torus channel operator == the periodic-dof EBE apply."""
    mesh, mats = _grid_cell(4)
    sim = hom.periodic_simulator(mesh, mats)
    op = PeriodicVarP2Elasticity.build(mesh, np.asarray(mats.D),
                                       sim.dof_map)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((sim.num_dofs, 3)))
    err = float(jnp.max(jnp.abs(op(u) - sim.apply_K(u)))) \
        / float(jnp.max(jnp.abs(sim.apply_K(u))))
    assert err < 1e-13
    derr = float(jnp.max(jnp.abs(
        op.from_channels(op.diagonal_channels()) - sim.K_diagonal())))
    assert derr < 1e-12 * float(jnp.max(sim.K_diagonal()))


def test_grid_cell_problems_multigrid():
    """homogenize(precond='multigrid'): torus V-cycle cell problems
    reproduce the block-CG tensor with far fewer iterations."""
    mesh, mats = _grid_cell(4)
    res_mg = hom.homogenize(mesh, mats, tol=1e-9, precond="multigrid")
    res_ref = hom.homogenize(mesh, mats, tol=1e-11, precond="block")
    d = np.abs(np.asarray(res_mg.Ch) - np.asarray(res_ref.Ch)).max() \
        / np.abs(np.asarray(res_ref.Ch)).max()
    assert d < 1e-7
    assert max(res_mg.cg_iters) * 2 < res_ref.cg_iters[0]


def test_multigrid_raises_off_grid():
    V, T = generators.grid_tet(4, 4, 4)
    V2 = V.copy()
    interior = ((V2 > 0.1) & (V2 < 0.9)).all(axis=1)
    V2[interior] += 0.01
    mesh = FEMMesh(V2, T, degree=2)
    c = V2[T].mean(axis=1)
    mats = MF.isotropic_field(3, jnp.ones(len(T)),
                              jnp.full(len(T), 0.3))
    with pytest.raises(ValueError):
        hom.homogenize(mesh, mats, precond="multigrid")


def test_homogenize_voxels():
    """Voxel one-call entry point: cross lattice, 1e6 ersatz contrast —
    MG iteration counts stay bounded, tensor cubic-symmetric and SPD."""
    from meshfem_tpu.analysis.homogenization import homogenize_voxels

    occ = np.zeros((6, 6, 6), bool)
    occ[2:4, :, 2:4] = True
    occ[:, 2:4, 2:4] = True
    occ[2:4, 2:4, :] = True
    res = homogenize_voxels(occ, E_solid=1.0, nu=0.3)
    Ch = np.asarray(res.Ch)
    d = np.diag(Ch)
    assert max(res.cg_iters) < 60          # bounded despite 1e6 contrast
    assert np.linalg.eigvalsh(Ch).min() > 0
    assert d.max() < 1.0
    assert abs(d[:3] - d[:3].mean()).max() < 1e-6   # cubic symmetry


def test_orthotropic_grid_multigrid():
    """Ortho-cell probes on a grid with a material field: per-probe
    variable-D MG matches the Jacobi-CG tensor at far fewer iterations
    (a uniform material would be degenerate — w = 0 exactly)."""
    from meshfem_tpu.physics.materials import MaterialField as MFm

    n = 6
    V, T = generators.grid_tet(n, n, n, hi=(0.5, 0.5, 0.5))
    mesh = FEMMesh(V, T, degree=2)
    c = V[T].mean(axis=1)
    E_field = np.where(((c - 0.25) ** 2).sum(axis=1) < 0.02, 1000.0, 1.0)
    mats = MFm.isotropic_field(3, jnp.asarray(E_field),
                               jnp.full(len(E_field), 0.3))
    res_mg = hom.homogenize_orthotropic(mesh, mats, tol=1e-10,
                                        precond="multigrid")
    res_j = hom.homogenize_orthotropic(mesh, mats, tol=1e-11)
    d = np.abs(np.asarray(res_mg.Ch) - np.asarray(res_j.Ch)).max() \
        / np.abs(np.asarray(res_j.Ch)).max()
    assert d < 1e-7
    assert np.abs(np.asarray(res_mg.w)).max() > 0
    assert max(res_mg.cg_iters) * 3 < max(res_j.cg_iters)


def test_pixel_torus_2d():
    """2D pixel-cell torus: operator parity with the periodic EBE and
    MG-bounded cell problems (homogenize dispatches by dim)."""
    from meshfem_tpu.ops.structured_periodic2d import (
        PeriodicVarP2Elasticity2D, torus2d_prolong_p2, torus2d_restrict_p2,
        torus2d_prolong_h, torus2d_restrict_h)

    rng = np.random.default_rng(0)
    m = 4
    v = jnp.asarray(rng.standard_normal((m, m, 2)))
    u = jnp.asarray(rng.standard_normal((m, m, 4, 2)))
    assert abs(float(jnp.vdot(torus2d_prolong_p2(v), u)
                     - jnp.vdot(v, torus2d_restrict_p2(u)))) < 1e-10
    vc = jnp.asarray(rng.standard_normal((m // 2, m // 2, 2)))
    uf = jnp.asarray(rng.standard_normal((m, m, 2)))
    assert abs(float(jnp.vdot(torus2d_prolong_h(vc), uf)
                     - jnp.vdot(vc, torus2d_restrict_h(uf)))) < 1e-10

    n = 8
    V, F = generators.grid_tri(n, n, diagonal="right")
    mesh = FEMMesh(V, F, degree=2)
    c = V[F].mean(axis=1)
    E_field = np.where(((c - 0.5) ** 2).sum(axis=1) < 0.06, 1000.0, 1.0)
    mats = MF.isotropic_field(2, jnp.asarray(E_field),
                              jnp.full(len(E_field), 0.3))
    sim = hom.periodic_simulator(mesh, mats)
    op = PeriodicVarP2Elasticity2D.build(mesh, np.asarray(mats.D),
                                         sim.dof_map)
    x = jnp.asarray(rng.standard_normal((sim.num_dofs, 2)))
    err = float(jnp.max(jnp.abs(op(x) - sim.apply_K(x)))) \
        / float(jnp.max(jnp.abs(sim.apply_K(x))))
    assert err < 1e-13

    res_mg = hom.homogenize(mesh, mats, tol=1e-9, precond="multigrid")
    res_ref = hom.homogenize(mesh, mats, tol=1e-11, precond="block")
    d = np.abs(np.asarray(res_mg.Ch) - np.asarray(res_ref.Ch)).max() \
        / np.abs(np.asarray(res_ref.Ch)).max()
    assert d < 1e-7
    assert max(res_mg.cg_iters) * 3 < res_ref.cg_iters[0]


def test_homogenize_pixels_2d():
    from meshfem_tpu.analysis.homogenization import homogenize_voxels

    occ = np.zeros((8, 8), bool)
    occ[3:5, :] = True
    occ[:, 3:5] = True
    res = homogenize_voxels(occ, E_solid=1.0, nu=0.3)
    Ch = np.asarray(res.Ch)
    d = np.diag(Ch)
    assert max(res.cg_iters) < 60
    assert np.linalg.eigvalsh(Ch).min() > 0 and d.max() < 1.0
    assert abs(d[0] - d[1]) < 1e-8        # square symmetry


def test_rectangular_voxel_cells():
    """Non-cubic voxel arrays coarsen per-axis (the torus transfers use
    each axis's own extent)."""
    from meshfem_tpu.analysis.homogenization import homogenize_voxels

    occ = np.ones((4, 8, 8), bool)
    occ[1:3, 2:6, 2:6] = False
    res = homogenize_voxels(occ, E_solid=1.0, nu=0.3, tol=1e-8,
                            cell=(0.5, 1.0, 1.0))
    Ch = np.asarray(res.Ch)
    assert np.isfinite(Ch).all()
    assert np.linalg.eigvalsh(Ch).min() > 0


def test_reordered_grid_rejected_for_var_paths():
    """A Kuhn grid with shuffled elements passes the geometric validation
    but must be rejected by the element-order check (the per-element
    material pairing depends on generator order)."""
    from meshfem_tpu.ops.structured_var import StructuredVarP2Elasticity
    from meshfem_tpu.fem import elasticity_tensor as et

    V, T = generators.grid_tet(3, 3, 3)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(T))
    mesh = FEMMesh(V, T[perm], degree=2)
    D = np.broadcast_to(np.asarray(et.isotropic(3, 1.0, 0.3)),
                        (len(T), 6, 6))
    with pytest.raises(ValueError, match="order"):
        StructuredVarP2Elasticity.build(mesh, D)
