"""DeformedCells + homogenized-tensor shape derivatives."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import Material
from meshfem_tpu.analysis import homogenization as hom
from meshfem_tpu.analysis import deformed_cells as dc


def hole_mesh(n=8):
    V, F = generators.grid_tri(n, n)
    c = V[F].mean(axis=1)
    keep = ~((c[:, 0] > 0.375) & (c[:, 0] < 0.625)
             & (c[:, 1] > 0.375) & (c[:, 1] < 0.625))
    F2 = F[keep]
    used = np.unique(F2)
    remap = -np.ones(len(V), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return FEMMesh(V[used], remap[F2].astype(np.int32), degree=1)


def test_identity_jacobian_matches_plain():
    mesh = hole_mesh(8)
    mat = Material.isotropic(2, 5.0, 0.3)
    plain = hom.homogenize(mesh, mat, tol=1e-12)
    warped = dc.homogenize_deformed(mesh, mat, np.eye(2), tol=1e-12)
    np.testing.assert_allclose(np.asarray(warped.Ch), np.asarray(plain.Ch),
                               atol=1e-9)


def test_rotation_jacobian_transforms_tensor():
    """Rotating the cell rotates the effective tensor."""
    from meshfem_tpu.fem import elasticity_tensor as et

    mesh = hole_mesh(8)
    mat = Material.isotropic(2, 5.0, 0.3)
    plain = hom.homogenize(mesh, mat, tol=1e-12)
    th = np.pi / 2  # square symmetry: 90-degree rotation is exact
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    warped = dc.homogenize_deformed(mesh, mat, R, tol=1e-12)
    expect = et.transform(plain.Ch, jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(warped.Ch), np.asarray(expect),
                               atol=1e-7)


def test_energy_form_matches_stress_form():
    mesh = hole_mesh(8)
    mat = Material.isotropic(2, 5.0, 0.3)
    sim = hom.periodic_simulator(mesh, mat)
    w, _ = hom.solve_cell_problems(sim, tol=1e-12)
    Ch_stress = hom.homogenized_tensor_stress_form(sim, w,
                                                   base_cell_volume=1.0)
    Ch_energy = dc.homogenized_tensor_at(sim, w)
    np.testing.assert_allclose(np.asarray(Ch_energy),
                               np.asarray(Ch_stress), atol=1e-8)


def test_shape_gradient_total_derivative():
    """Frozen-w energy-form gradient == FD of the FULL pipeline (re-solving
    the cell problems) — the stationarity property the reference's
    hand-derived shape derivatives rely on."""
    mesh = hole_mesh(8)
    mat = Material.isotropic(2, 5.0, 0.3)
    sim = hom.periodic_simulator(mesh, mat)
    w, _ = hom.solve_cell_problems(sim, tol=1e-13)
    W = np.zeros((3, 3))
    W[0, 0] = 1.0  # functional J = Eh_xxxx
    g = np.asarray(dc.homogenized_tensor_shape_gradient(sim, w, W))

    # FD: move one interior (hole-boundary) vertex, re-homogenize.
    interior = np.flatnonzero(
        (mesh.V[:, 0] > 0.2) & (mesh.V[:, 0] < 0.8)
        & (mesh.V[:, 1] > 0.2) & (mesh.V[:, 1] < 0.8))
    vidx = int(interior[0])
    eps = 1e-6
    for comp in range(2):
        def full_J(delta):
            V2 = mesh.V.copy()
            V2[vidx, comp] += delta
            m2 = FEMMesh(V2, mesh.F, degree=1)
            r = hom.homogenize(m2, mat, tol=1e-13)
            return float(r.Ch[0, 0])

        fd = (full_J(eps) - full_J(-eps)) / (2 * eps)
        assert g[vidx, comp] == pytest.approx(fd, rel=2e-4, abs=1e-8)


def test_shear_jacobian_homogeneous_material():
    """A sheared homogeneous cell still homogenizes to the base tensor
    (w = 0 solves the cell problems for ANY jacobian) — exercises general
    non-axis-aligned jacobians, which must reuse the ORIGINAL cell's
    periodic matching and |det F| volume normalization."""
    V, F = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, F, degree=1)
    mat = Material.isotropic(2, 5.0, 0.3)
    Fjac = np.array([[1.0, 0.35], [0.0, 1.2]])
    r = dc.homogenize_deformed(mesh, mat, Fjac, tol=1e-12)
    np.testing.assert_allclose(np.asarray(r.Ch), np.asarray(mat.D),
                               rtol=1e-8, atol=1e-8)
