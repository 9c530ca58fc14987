"""Indexed / polygon boundary conditions, region surface-force reports and
Dirichlet posedness analysis (BoundaryConditions.hh:263,346,358;
LinearElasticity.hh:1169,1251-1270)."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.physics import boundary_conditions as bc


def cantilever(degree=1):
    V, F = generators.grid_tri(6, 3, hi=(2.0, 1.0))
    mesh = FEMMesh(V, F, degree=degree)
    sim = ElasticitySimulator(mesh, Material.isotropic(2, 100.0, 0.3))
    return mesh, sim


def test_dirichlet_nodes_condition():
    mesh, sim = cantilever()
    left = np.asarray(mesh.nodes_in_box((0, 0), (0, 1)))
    conds = bc.parse_bc({
        "regions": [{"type": "dirichlet nodes",
                     "values": [[[0.0, 0.0, 0.0], left.tolist()]]}]}, dim=2)
    sim.apply_boundary_conditions(conds)
    assert sim.dirichlet_mask[sim.dof_map[left]].all()

    # non-boundary node -> error (reference throws too)
    interior = [int(n) for n in range(mesh.num_nodes)
                if n not in set(np.asarray(mesh.bdry_nodes).tolist())][:1]
    bad = bc.parse_bc({
        "regions": [{"type": "dirichlet nodes",
                     "values": [[[0, 0, 0], interior]]}]}, dim=2)
    mesh2, sim2 = cantilever()
    with pytest.raises(ValueError, match="non-boundary"):
        sim2.apply_boundary_conditions(bad)


def test_neumann_elements_and_force_normalization():
    mesh, sim = cantilever()
    # right-edge boundary elements by vertex-id pairs
    right = bc.match_boundary_elements(
        mesh, bc.BCRegion("traction", [], np.asarray([2.0, 0.0]),
                          np.asarray([2.0, 1.0]), False))
    corners = [[int(v) for v in mesh.bdry_elems[b]] for b in right]
    total_force = [0.0, -3.0, 0.0]
    conds = bc.parse_bc({
        "regions": [{"type": "force elements",
                     "values": [[total_force, corners]]}]}, dim=2)
    sim.apply_boundary_conditions(conds)
    # consistent load sums to the requested total force
    np.testing.assert_allclose(np.asarray(sim.neumann_load).sum(axis=0),
                               [0.0, -3.0], atol=1e-12)

    # unmatched element set -> error
    mesh3, sim3 = cantilever()
    badset = [[0, int(np.asarray(mesh.F).max())]]
    bad = bc.parse_bc({
        "regions": [{"type": "traction elements",
                     "values": [[[1, 0, 0], badset]]}]}, dim=2)
    with pytest.raises(ValueError, match="matched"):
        sim3.apply_boundary_conditions(bad)


def test_dirichlet_elements_condition():
    mesh, sim = cantilever(degree=2)
    left = bc.match_boundary_elements(
        mesh, bc.BCRegion("dirichlet", [], np.asarray([0.0, 0.0]),
                          np.asarray([0.0, 1.0]), False))
    corners = [[int(v) for v in mesh.bdry_elems[b]] for b in left]
    conds = bc.parse_bc({
        "regions": [{"type": "dirichlet", "value": [0, 0, 0],
                     "element vertices": corners}]}, dim=2)
    sim.apply_boundary_conditions(conds)
    # ALL nodes of the elements (incl. P2 edge nodes) constrained
    nodes = np.unique(mesh.bdry_elem_nodes[left])
    assert sim.dirichlet_mask[sim.dof_map[nodes]].all()


def test_polygon_region():
    mesh, sim = cantilever()
    poly = [[-0.1, -0.1], [0.4, -0.1], [0.4, 1.1], [-0.1, 1.1]]
    conds = bc.parse_bc({
        "regions": [{"type": "dirichlet", "value": [0, 0, 0],
                     "polygon": poly}]}, dim=2)
    sim.apply_boundary_conditions(conds)
    fixed_nodes = np.flatnonzero(sim.dirichlet_mask.any(axis=1))
    pos = np.asarray(mesh.node_positions)[fixed_nodes]
    assert len(fixed_nodes) > 0 and pos[:, 0].max() < 0.4


def test_region_surface_forces_balance():
    """Clamp left, pull right with a known force: the region surface-force
    report recovers the reaction -F."""
    mesh, sim = cantilever()
    conds = bc.parse_bc({
        "regions": [
            {"type": "dirichlet", "value": [0, 0, 0],
             "box": {"minCorner": [0, 0, 0], "maxCorner": [0, 1, 0]}},
            {"type": "force", "value": [0, -2.0, 0],
             "box": {"minCorner": [2, 0, 0], "maxCorner": [2, 1, 0]}},
        ]}, dim=2)
    sim.apply_boundary_conditions(conds)
    u, _ = sim.solve(tol=1e-13)
    forces = sim.report_region_surface_forces(u)
    assert forces.shape == (1, 2)
    np.testing.assert_allclose(forces[0], [0.0, 2.0], atol=1e-8)


def test_posedness_analysis():
    mesh, sim = cantilever()
    t, r = sim.analyze_dirichlet_posedness()
    assert t.all() and r            # nothing constrained

    # x-components of the whole left edge: kills x-translation AND the
    # rotation (the rotation's x-field -y is nonzero along the edge, and
    # no rotation+translation combo vanishes on all of it) — the
    # reference's approximate analysis can only warn here; ours is exact
    left = np.asarray(mesh.nodes_in_box((0, 0), (0, 1)))
    sim.fix_nodes(left, 0.0, components=[0])
    t, r = sim.analyze_dirichlet_posedness()
    assert not t[0] and t[1] and not r

    sim.fix_nodes(left, 0.0)
    t, r = sim.analyze_dirichlet_posedness()
    assert not t.any() and not r


def test_posedness_partial_rotation_combo():
    """A single constrained x-dof at (0, y0 != 0) suppresses pure
    x-translation but NOT the combined mode rot_z + y0 * t_x (which
    vanishes at that dof) — exactly the partial case the reference
    declares unimplemented (LinearElasticity.hh:1185)."""
    mesh, sim = cantilever()
    X = np.asarray(mesh.node_positions)
    node = int(np.argmin(np.abs(X[:, 0] - 0.0) + np.abs(X[:, 1] - 1.0)))
    sim.fix_nodes([node], 0.0, components=[0])
    t, r = sim.analyze_dirichlet_posedness()
    assert not t[0] and t[1]
    assert r                        # a rotational combination survives


def test_invalid_indexed_type_combinations_rejected():
    """'dirichlet elements' / 'force nodes' are not reference condition
    types; the parser must reject them instead of crashing in apply."""
    with pytest.raises(ValueError, match="element vertices"):
        bc.parse_bc({"regions": [{"type": "dirichlet elements",
                                  "values": [[[0, 0, 0], [[0, 1]]]]}]},
                    dim=2)
    with pytest.raises(ValueError, match="not a condition type"):
        bc.parse_bc({"regions": [{"type": "force nodes",
                                  "values": [[[0, 0, 0], [0]]]}]}, dim=2)
