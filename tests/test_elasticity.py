"""Linear elasticity end-to-end tests (parity with reference Simulate_cli
behavior: patch tests, BC semantics, direct-solver cross-check)."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import (
    ElasticitySimulator, Material, parse_bc, von_mises)
from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.fem.flattening import sym_to_flat, flat_to_sym


def make_sim(K=2, deg=1, E=10.0, nu=0.3, n=3):
    if K == 2:
        V, F = generators.grid_tri(n, n)
    else:
        V, F = generators.grid_tet(2, 2, 2)
    mesh = FEMMesh(V, F, degree=deg)
    return ElasticitySimulator(mesh, Material.isotropic(K, E, nu))


@pytest.mark.parametrize("K,deg", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_constant_strain_patch(K, deg):
    """Dirichlet u = eps0 x on the whole boundary reproduces the uniform
    strain state exactly (linear displacement is in every FE space)."""
    sim = make_sim(K, deg)
    mesh = sim.mesh
    eps_full = np.asarray([[0.1, 0.03], [0.03, -0.05]] if K == 2 else
                          [[0.1, 0.03, 0.01], [0.03, -0.05, 0.02],
                           [0.01, 0.02, 0.04]])
    exact = mesh.node_positions @ eps_full.T
    sim.fix_nodes(mesh.bdry_nodes, exact[mesh.bdry_nodes])
    u, res = sim.solve(tol=1e-13)
    np.testing.assert_allclose(np.asarray(u), exact, atol=1e-9)
    # Strain/stress fields are the uniform state.
    e_flat = sym_to_flat(eps_full)
    es = np.asarray(sim.average_strain(u))
    np.testing.assert_allclose(es, e_flat, atol=1e-9)
    s_exact = np.asarray(et.double_contract(sim.D, jnp.asarray(e_flat)))
    np.testing.assert_allclose(np.asarray(sim.average_stress_field(u)),
                               np.tile(s_exact, (mesh.num_elements, 1)),
                               atol=1e-8)


def test_uniaxial_tension_bc_json():
    """2D bar under uniaxial traction: sigma_xx = t, eps from compliance.
    Exercises the .bc JSON pipeline (dirichlet + traction regions)."""
    E, nu, t = 10.0, 0.3, 0.5
    V, F = generators.grid_tri(8, 4, hi=(2.0, 1.0))
    mesh = FEMMesh(V, F, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, E, nu))
    bc = parse_bc(json.dumps({
        "regions": [
            {"type": "dirichletx", "value": [0, 0],
             "box%": {"minCorner": [-0.001, -0.001],
                      "maxCorner": [0.001, 1.001]}},
            {"type": "dirichlety", "value": [0, 0],
             "box%": {"minCorner": [-0.001, -0.001],
                      "maxCorner": [1.001, 0.001]}},
            {"type": "traction", "value": [t, 0],
             "box%": {"minCorner": [0.999, -0.001],
                      "maxCorner": [1.001, 1.001]}},
        ]}), dim=2)
    sim.apply_boundary_conditions(bc)
    u, res = sim.solve(tol=1e-13)
    # Plane stress: eps_xx = t/E, eps_yy = -nu t/E.
    X = mesh.node_positions
    expect = np.stack([(t / E) * X[:, 0], (-nu * t / E) * X[:, 1]], axis=1)
    np.testing.assert_allclose(np.asarray(u), expect, atol=1e-9)
    vm = np.asarray(sim.von_mises_field(u))
    np.testing.assert_allclose(vm, t, atol=1e-9)


def test_force_vs_traction_equivalence():
    """'force' distributes total force / area as uniform traction."""
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    mat = Material.isotropic(2, 5.0, 0.25)
    box = {"minCorner": [0.999, -0.001], "maxCorner": [1.001, 1.001]}
    fix = {"type": "dirichlet", "value": [0, 0],
           "box%": {"minCorner": [-0.001, -0.001],
                    "maxCorner": [0.001, 1.001]}}
    s1 = ElasticitySimulator(mesh, mat)
    s1.apply_boundary_conditions(parse_bc(json.dumps(
        {"regions": [fix, {"type": "force", "value": [2.0, 0],
                           "box%": box}]}), dim=2))
    s2 = ElasticitySimulator(mesh, mat)
    s2.apply_boundary_conditions(parse_bc(json.dumps(
        {"regions": [fix, {"type": "traction", "value": [2.0, 0],
                           "box%": box}]}), dim=2))
    # Right edge has length 1 -> identical loads.
    np.testing.assert_allclose(np.asarray(s1.neumann_load),
                               np.asarray(s2.neumann_load), atol=1e-12)
    assert np.asarray(s1.neumann_load)[:, 0].sum() == pytest.approx(2.0)


def test_pressure_points_inward():
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 5.0, 0.25))
    bc = parse_bc(json.dumps({"regions": [
        {"type": "pressure", "value": [3.0],
         "box%": {"minCorner": [0.999, -0.001],
                  "maxCorner": [1.001, 1.001]}}]}), dim=2)
    sim.apply_boundary_conditions(bc)
    # Outward normal on x=1 is +x; pressure load = -p n -> negative x.
    fx = np.asarray(sim.neumann_load)[:, 0].sum()
    assert fx == pytest.approx(-3.0, rel=1e-12)


def test_cantilever_matches_direct_solve():
    """CG solution matches scipy direct solve of the assembled matrix."""
    import scipy.sparse.linalg as spla

    V, F = generators.grid_tri(6, 3, hi=(2.0, 1.0))
    mesh = FEMMesh(V, F, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 100.0, 0.3))
    left = mesh.nodes_in_box((0, 0), (0, 1))
    sim.fix_nodes(left, 0.0)
    bc = parse_bc(json.dumps({"regions": [
        {"type": "force", "value": [0, -1.0],
         "box%": {"minCorner": [0.999, -0.001],
                  "maxCorner": [1.001, 1.001]}}]}), dim=2)
    sim.apply_boundary_conditions(bc)
    u, res = sim.solve(tol=1e-13)

    A = sim.to_scipy().tolil()
    b = np.array(sim.neumann_load).ravel()
    fixed = np.asarray(sim.dirichlet_mask).ravel()
    for i in np.flatnonzero(fixed):
        A[i, :] = 0.0
        A[i, i] = 1.0
        b[i] = 0.0
    u_direct = spla.spsolve(A.tocsc(), b).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(u), u_direct, atol=1e-8)
    # Tip deflects downward, more than Euler-Bernoulli-ish small number.
    tip = mesh.nodes_in_box((2, 0), (2, 1))
    assert np.asarray(u)[tip, 1].mean() < -0.01


def test_no_rigid_motion_traction_only():
    """Pure traction problem (equilibrated) solved via rigid-mode projection
    (reference no_rigid_motion / setConstrained path)."""
    V, F = generators.grid_tri(6, 6, lo=(-1, -1), hi=(1, 1))
    mesh = FEMMesh(V, F, degree=1)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 10.0, 0.3))
    bc = parse_bc(json.dumps({
        "no_rigid_motion": True,
        "regions": [
            {"type": "traction", "value": [0, 0.3],
             "box": {"minCorner": [-1.05, -1.05],
                     "maxCorner": [1.05, -0.95]}},
            {"type": "traction", "value": [0, -0.3],
             "box": {"minCorner": [-1.05, 0.95],
                     "maxCorner": [1.05, 1.05]}},
        ]}), dim=2)
    sim.apply_boundary_conditions(bc)
    u, res = sim.solve(tol=1e-11)
    u = np.asarray(u)
    assert np.isfinite(u).all()
    # Rigid components projected out: mean displacement ~ 0.
    np.testing.assert_allclose(u.mean(axis=0), 0.0, atol=1e-8)
    # Compression in y: top moves down, bottom up.
    top = mesh.nodes_in_box((-1, 1), (1, 1))
    bot = mesh.nodes_in_box((-1, -1), (1, -1))
    assert u[top, 1].mean() < -1e-3
    assert u[bot, 1].mean() > 1e-3


def test_von_mises_values():
    s2 = jnp.asarray([2.0, 0.0, 0.0])  # uniaxial 2D
    assert float(von_mises(s2, 2)) == pytest.approx(2.0)
    s3 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 1.0])  # pure shear 3D
    assert float(von_mises(s3, 3)) == pytest.approx(np.sqrt(3.0))


def test_constant_strain_load_consistency():
    """constant_strain_load(e0) == K @ (e0 x) for linear displacement field
    (both equal int strain(phi) : C : e0)."""
    sim = make_sim(2, 2, n=3)
    mesh = sim.mesh
    e0 = jnp.asarray([0.2, -0.1, 0.05])
    l1 = np.asarray(sim.constant_strain_load(e0))
    eps_full = np.asarray(flat_to_sym(e0))
    u_lin = jnp.asarray(mesh.node_positions @ eps_full.T)
    l2 = np.asarray(sim.apply_K(u_lin))
    np.testing.assert_allclose(l1, l2, atol=1e-10)


def test_expression_bc():
    """Expression-valued Dirichlet (sin_top.bc style)."""
    V, F = generators.grid_tri(4, 4)
    mesh = FEMMesh(V, F, degree=1)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 5.0, 0.25))
    bc = parse_bc(json.dumps({"regions": [
        {"type": "dirichlet", "value": ["sin(pi * x)", 0],
         "box%": {"minCorner": [-0.001, 0.999],
                  "maxCorner": [1.001, 1.001]}},
        {"type": "dirichlet", "value": [0, 0],
         "box%": {"minCorner": [-0.001, -0.001],
                  "maxCorner": [1.001, 0.001]}}]}), dim=2)
    sim.apply_boundary_conditions(bc)
    top = mesh.nodes_in_box((0, 1), (1, 1))
    vals = np.asarray(sim.dirichlet_values)[sim.dof_map[top], 0]
    np.testing.assert_allclose(
        vals, np.sin(np.pi * mesh.node_positions[top, 0]), atol=1e-12)
