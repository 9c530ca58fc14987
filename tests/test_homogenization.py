"""Periodic homogenization tests (parity with the reference's
Homogenization.ipynb validation: homogeneous cells, laminate closed forms,
orthotropic-cell vs full-cell consistency, stress vs displacement forms)."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.mesh.periodic import match_periodic_nodes, cell_face_boundary_elements
from meshfem_tpu.physics import Material, MaterialField
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.analysis import homogenization as hom


def test_periodic_node_matching():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=2)
    dof_map, num_dofs, fm = match_periodic_nodes(mesh.node_positions)
    # 4x4 grid P2: (nodes) minus identified: left/right edges merge, top/bottom
    # merge, 4 corners -> 1.  vertices 25 -> 25-9+... easier: count directly.
    # Opposite-edge nodes (excluding corners) pair up; corners all merge.
    n_nodes = mesh.num_nodes
    p = mesh.node_positions
    on_left = np.isclose(p[:, 0], 0) & ~np.isclose(p[:, 1], 0) & ~np.isclose(p[:, 1], 1)
    on_bottom = np.isclose(p[:, 1], 0) & ~np.isclose(p[:, 0], 0) & ~np.isclose(p[:, 0], 1)
    corners = (np.isclose(p[:, 0], 0) | np.isclose(p[:, 0], 1)) & \
              (np.isclose(p[:, 1], 0) | np.isclose(p[:, 1], 1))
    expect = n_nodes - on_left.sum() - on_bottom.sum() - (corners.sum() - 1)
    assert num_dofs == expect
    # Identified nodes share dofs.
    for y in (0.25, 0.5):
        a = np.flatnonzero(np.isclose(p[:, 0], 0) & np.isclose(p[:, 1], y))
        b = np.flatnonzero(np.isclose(p[:, 0], 1) & np.isclose(p[:, 1], y))
        assert dof_map[a[0]] == dof_map[b[0]]


def test_periodic_mismatch_detection():
    V, F = generators.grid_tri(3, 3)
    V = V.copy()
    # Shift one boundary vertex off its partner.
    idx = np.flatnonzero(np.isclose(V[:, 0], 1.0) & np.isclose(V[:, 1], 1/3))
    V[idx, 1] += 0.01
    mesh = FEMMesh(V, F, degree=1)
    with pytest.raises(ValueError, match="mismatch"):
        match_periodic_nodes(mesh.node_positions)
    match_periodic_nodes(mesh.node_positions, permit_mismatch=True)


def test_cell_face_boundary_elements():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    internal = cell_face_boundary_elements(mesh)
    assert internal.all()  # full square: every boundary edge is on the cell


@pytest.mark.parametrize("K,deg", [(2, 1), (2, 2), (3, 1)])
def test_homogeneous_cell_identity(K, deg):
    """Uniform material: fluctuations vanish, Ch == C exactly."""
    if K == 2:
        V, F = generators.grid_tri(4, 4)
    else:
        V, F = generators.grid_tet(2, 2, 2)
    mesh = FEMMesh(V, F, degree=deg)
    mat = Material.isotropic(K, 5.0, 0.3)
    res = hom.homogenize(mesh, mat, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.Ch), np.asarray(mat.D),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.w), 0.0, atol=1e-9)


def test_homogeneous_orthotropic_cell_identity():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    mat = Material.isotropic(2, 5.0, 0.3)
    res = hom.homogenize(mesh, mat, orthotropic_cell=True, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.Ch), np.asarray(mat.D),
                               atol=1e-9)


def laminate_mesh(n=8):
    """Unit cell, layers normal to x: phase A for x < 0.5, B for x >= 0.5."""
    V, F = generators.grid_tri(n, n)
    mesh = FEMMesh(V, F, degree=1)
    cx = mesh.barycenters()[:, 0]
    return mesh, cx < 0.5


def test_laminate_closed_form():
    """Backus average for a 2-phase laminate (layers normal to x):
    C11* = <1/C11>^-1, C12* = C11* <C12/C11>,
    C22* = <C22 - C12^2/C11> + C12*^2/C11*, C33* = <1/C33>^-1."""
    mesh, in_a = laminate_mesh(8)
    Da = np.asarray(et.isotropic(2, 1.0, 0.3))
    Db = np.asarray(et.isotropic(2, 10.0, 0.2))
    D = np.where(in_a[:, None, None], Da[None], Db[None])
    mf = MaterialField(2, jnp.asarray(D))
    res = hom.homogenize(mesh, mf, tol=1e-12)
    Ch = np.asarray(res.Ch)

    def avg(f):
        return 0.5 * (f(Da) + f(Db))

    C11 = 1.0 / avg(lambda C: 1.0 / C[0, 0])
    C12 = C11 * avg(lambda C: C[0, 1] / C[0, 0])
    C22 = avg(lambda C: C[1, 1] - C[0, 1] ** 2 / C[0, 0]) + C12 ** 2 / C11
    C33 = 1.0 / avg(lambda C: 1.0 / C[2, 2])
    np.testing.assert_allclose(Ch[0, 0], C11, rtol=1e-8)
    np.testing.assert_allclose(Ch[0, 1], C12, rtol=1e-8)
    np.testing.assert_allclose(Ch[1, 1], C22, rtol=1e-8)
    np.testing.assert_allclose(Ch[2, 2], C33, rtol=1e-8)
    np.testing.assert_allclose(Ch[0, 2], 0.0, atol=1e-9)
    np.testing.assert_allclose(Ch[1, 2], 0.0, atol=1e-9)


def hole_mesh(n=8, lo=0.375, hi=0.625, box=None):
    V, F = generators.grid_tri(n, n) if box is None else \
        generators.grid_tri(n, n, hi=box)
    c = V[F].mean(axis=1)
    keep = ~((c[:, 0] > lo) & (c[:, 0] < hi) & (c[:, 1] > lo) & (c[:, 1] < hi))
    F2 = F[keep]
    used = np.unique(F2)
    remap = -np.ones(len(V), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return FEMMesh(V[used], remap[F2].astype(np.int32), degree=1)


def test_hole_softens_and_forms_agree():
    mesh = hole_mesh(8)
    mat = Material.isotropic(2, 5.0, 0.3)
    sim = hom.periodic_simulator(mesh, mat)
    w, _ = hom.solve_cell_problems(sim, tol=1e-12)
    Ch_stress = np.asarray(hom.homogenized_tensor_stress_form(
        sim, w, base_cell_volume=1.0))
    Ch_disp = np.asarray(hom.homogenized_tensor_displacement_form(
        sim, w, base_cell_volume=1.0))
    np.testing.assert_allclose(Ch_stress, Ch_disp, atol=1e-8)
    # Symmetric, softer than base, positive definite.
    np.testing.assert_allclose(Ch_stress, Ch_stress.T, atol=1e-9)
    base = np.asarray(mat.D)
    assert Ch_stress[0, 0] < base[0, 0]
    assert np.linalg.eigvalsh(
        np.asarray(et.to_full(jnp.asarray(Ch_stress))).reshape(4, 4)
    ).min() > -1e-10


def test_orthotropic_cell_vs_full_cell():
    """Quarter-cell homogenization of a symmetric microstructure agrees with
    full-cell (the reference notebook's final validation)."""
    mat = Material.isotropic(2, 5.0, 0.3)
    full = hole_mesh(16)                         # hole [.375,.625]^2 centered
    res_full = hom.homogenize(full, mat, tol=1e-12)
    # Quarter cell [0,0.5]^2: hole quarter at the (0.5, 0.5) corner.
    V, F = generators.grid_tri(8, 8, hi=(0.5, 0.5))
    c = V[F].mean(axis=1)
    keep = ~((c[:, 0] > 0.375) & (c[:, 1] > 0.375))
    F2 = F[keep]
    used = np.unique(F2)
    remap = -np.ones(len(V), dtype=np.int64)
    remap[used] = np.arange(len(used))
    quarter = FEMMesh(V[used], remap[F2].astype(np.int32), degree=1)
    res_q = hom.homogenize(quarter, mat, orthotropic_cell=True, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res_q.Ch), np.asarray(res_full.Ch),
                               rtol=2e-2, atol=1e-3)


def test_probe_consistency():
    """probe under macro strain e^0 reproduces Ch row 0 as average stress."""
    mesh = hole_mesh(8)
    mat = Material.isotropic(2, 5.0, 0.3)
    sim = hom.periodic_simulator(mesh, mat)
    w, _ = hom.solve_cell_problems(sim, tol=1e-12)
    Ch = hom.homogenized_tensor_stress_form(sim, w, base_cell_volume=1.0)
    e0 = hom.canonical_strain(2, 0)
    u, strain = hom.probe(sim, w, e0)
    vol = sim.geom.volume
    stress = et.double_contract(sim.D, strain)
    avg_stress = np.asarray(jnp.einsum("e,ea->a", vol, stress))
    np.testing.assert_allclose(avg_stress, np.asarray(Ch)[0], atol=1e-9)


def test_routed_block_cell_problems_match_jacobi():
    """operator='routed' (block plans: all fl columns through one index
    stream) reproduces the default path's homogenized tensor."""
    from meshfem_tpu.analysis import homogenization as hom2

    V, T = generators.grid_tet(3, 3, 3)
    # soft inclusion so fluctuations are nonzero
    mesh = FEMMesh(V, T, degree=1)
    cent = np.asarray(mesh.V)[np.asarray(mesh.F)].mean(axis=1)
    soft = ((cent - 0.5) ** 2).sum(axis=1) < 0.09
    E = np.where(soft, 0.2, 2.0)
    from meshfem_tpu.physics.materials import MaterialField

    mat = MaterialField.isotropic_field(3, E, np.full(len(E), 0.3))
    sim_a = hom2.periodic_simulator(mesh, mat)
    w_a, _ = hom2.solve_cell_problems(sim_a, tol=1e-10, precond="jacobi",
                                      operator="ebe")
    Ch_a = hom2.homogenized_tensor_stress_form(sim_a, w_a)
    sim_b = hom2.periodic_simulator(mesh, mat)
    w_b, _ = hom2.solve_cell_problems(sim_b, tol=1e-10, precond="jacobi",
                                      operator="routed")
    assert sim_b._routed is not None
    Ch_b = hom2.homogenized_tensor_stress_form(sim_b, w_b)
    scale = float(np.abs(np.asarray(Ch_a)).max())
    assert np.abs(np.asarray(Ch_b) - np.asarray(Ch_a)).max() < 2e-5 * scale
