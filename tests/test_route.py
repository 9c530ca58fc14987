"""Lane-routing kernel plans (sparse/route.py) and the routed EBE operator.

Runs on CPU in pallas interpret mode; the kernels themselves are exercised
on real hardware by bench.py.  Reference semantics:

  plan_copy(src_ids, n)(x)[i]  == x[src_ids[i]]        (0.0 where id < 0)
  plan_reduce(dst, n, S)(x)[d] == sum_{i: dst[i]==d} x[i]

against plain numpy, including the paging (multi-block sources), chain
bucketing, budget-overflow spill, and fix-up paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshfem_tpu.sparse import route


def _copy_ref(sid, src):
    return np.where(sid >= 0, src[np.maximum(sid, 0)], 0.0).astype(np.float32)


@pytest.mark.parametrize("blk_rows", [128, 1024])
def test_plan_copy_random_local(rng, blk_rows):
    n_src, n_out = 60000, 9000
    base = np.repeat(rng.integers(0, n_src - 700, n_out // 100), 100)
    sid = np.minimum(base + rng.integers(0, 700, n_out), n_src - 1)
    sid[rng.integers(0, n_out, 40)] = rng.integers(0, n_src, 40)  # far
    sid[rng.integers(0, n_out, 25)] = -1
    src = rng.standard_normal(n_src).astype(np.float32)
    plan = route.plan_copy(sid, n_src, blk_rows=blk_rows)
    out = np.asarray(plan(jnp.asarray(src), interpret=True))
    np.testing.assert_array_equal(out, _copy_ref(sid, src))


def test_plan_copy_tiny(rng):
    sid = np.array([3, 1, -1, 0, 2, 2])
    src = np.arange(5, dtype=np.float32) * 10
    plan = route.plan_copy(sid, 5)
    out = np.asarray(plan(jnp.asarray(src), interpret=True))
    np.testing.assert_array_equal(out, [30, 10, 0, 0, 20, 20])


def test_plan_reduce_matches_numpy(rng):
    n_out, S = 5000, 40000
    dst = rng.integers(0, n_out, S)
    hot = rng.integers(0, n_out, 60)
    dst[:3000] = hot[rng.integers(0, 60, 3000)]   # degrees up to ~60
    dst[rng.integers(0, S, 30)] = -1
    order = np.argsort(dst + rng.integers(0, 40, S))
    dst = dst[order]
    src = rng.standard_normal(S).astype(np.float32)
    plan = route.plan_reduce(dst, n_out, S, blk_rows=256)
    out = np.asarray(plan(jnp.asarray(src), interpret=True))
    ref = np.zeros(n_out)
    np.add.at(ref, dst[dst >= 0], src[dst >= 0].astype(np.float64))
    np.testing.assert_allclose(out, ref, atol=5e-5)


@pytest.mark.parametrize("planes", [2, 3, 6])
def test_plan_copy_planes_matches_single(rng, planes):
    """Planes-mode copy == per-plane legacy copy (shared index stream)."""
    n_src, n_out = 30000, 7000
    base = np.repeat(rng.integers(0, n_src - 700, n_out // 100), 100)
    sid = np.minimum(base + rng.integers(0, 700, n_out), n_src - 1)
    sid[rng.integers(0, n_out, 40)] = rng.integers(0, n_src, 40)  # far
    sid[rng.integers(0, n_out, 25)] = -1
    src = rng.standard_normal((planes, n_src)).astype(np.float32)
    plan = route.plan_copy(sid, n_src, planes=planes)
    assert plan.planes == planes
    out = np.asarray(plan(jnp.asarray(src), interpret=True))
    assert out.shape == (planes, n_out)
    for p in range(planes):
        np.testing.assert_array_equal(out[p], _copy_ref(sid, src[p]))


@pytest.mark.parametrize("planes", [3])
def test_plan_reduce_planes_matches_numpy(rng, planes):
    n_out, S = 5000, 40000
    dst = rng.integers(0, n_out, S)
    hot = rng.integers(0, n_out, 60)
    dst[:3000] = hot[rng.integers(0, 60, 3000)]
    dst[rng.integers(0, S, 30)] = -1
    dst = dst[np.argsort(dst + rng.integers(0, 40, S))]
    src = rng.standard_normal((planes, S)).astype(np.float32)
    plan = route.plan_reduce(dst, n_out, S, blk_rows=256, planes=planes)
    out = np.asarray(plan(jnp.asarray(src), interpret=True))
    assert out.shape == (planes, n_out)
    for p in range(planes):
        ref = np.zeros(n_out)
        np.add.at(ref, dst[dst >= 0], src[p][dst >= 0].astype(np.float64))
        np.testing.assert_allclose(out[p], ref, atol=5e-5)


@pytest.mark.parametrize("tiles", ["0", "1"])
def test_routed_ebe_scatter_variants_match(rng, tiles, monkeypatch):
    """Slab rungs (default) and tile-chain rungs (MESHFEM_TILE_RUNGS=1)
    produce identical applies."""
    monkeypatch.setenv("MESHFEM_TILE_RUNGS", tiles)
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.physics import ElasticitySimulator, Material
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE, _PLAN_CACHE

    _PLAN_CACHE.clear()
    V, T = generators.grid_tet(4, 4, 4)
    mesh = FEMMesh(V, T, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(3, 2.3, 0.31))
    rk = RoutedEBE.build(jnp.asarray(sim.Ke, jnp.float32),
                         np.asarray(sim.elem_dofs), sim.num_dofs, 3,
                         coords=np.asarray(mesh.node_positions),
                         two_level=True)
    u = rng.standard_normal((sim.num_dofs, 3)).astype(np.float32)
    y = rk.permute_out(rk(rk.permute_in(jnp.asarray(u))))
    y64 = sim.apply_K(jnp.asarray(u, jnp.float64))
    err = float(jnp.abs(y - jnp.asarray(y64, jnp.float32)).max()
                / jnp.abs(y64).max())
    assert err < 5e-5
    _PLAN_CACHE.clear()


@pytest.mark.parametrize("m", [3, 5])
def test_routed_ebe_block_planes_matches_columns(rng, m, monkeypatch):
    """apply_block with block plans (one index stream per column group)
    == column-by-column applies, dense and factored backends; m=5
    exercises the VMEM-capped group loop with a padded tail.  (Block
    plans are experimental/env-gated: measured slower at bench scale —
    see RoutedEBE.build.)"""
    monkeypatch.setenv("MESHFEM_BLOCK_PLANES", "1")
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.physics import ElasticitySimulator, Material
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE
    from meshfem_tpu.fem import elasticity_tensor as et

    V, T = generators.grid_tet(4, 4, 4)
    mesh = FEMMesh(V, T, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(3, 2.3, 0.31))
    rkb = RoutedEBE.build(jnp.asarray(sim.Ke, jnp.float32),
                          np.asarray(sim.elem_dofs), sim.num_dofs, 3,
                          coords=np.asarray(mesh.node_positions),
                          block_rhs=m)
    assert rkb.bm == m and rkb.bgather is not None
    assert rkb.bgather.planes == 3 * min(m, 3)
    U = jnp.asarray(rng.standard_normal((sim.num_dofs, 3, m)),
                    jnp.float32)
    Ui = rkb.permute_in(U)
    yb = np.asarray(rkb.apply_block(Ui))
    yc = np.stack([np.asarray(rkb(Ui[..., j])) for j in range(m)],
                  axis=-1)
    scale = np.abs(yc).max()
    assert np.abs(yb - yc).max() < 1e-5 * scale

    # factored backend through the same block plans
    lam, mu = et.lame_parameters(sim.D)
    rkf = RoutedEBE.build(None, np.asarray(sim.elem_dofs), sim.num_dofs,
                          3, coords=np.asarray(mesh.node_positions),
                          block_rhs=m,
                          factor=(sim.geom.grad_lambda, sim.geom.volume,
                                  lam, mu, 2))
    ybf = np.asarray(rkf.apply_block(Ui))
    assert np.abs(ybf - yc).max() < 5e-5 * scale


def test_plan_reduce_deterministic(rng):
    n_out, S = 700, 6000
    dst = np.sort(rng.integers(0, n_out, S))
    src = rng.standard_normal(S).astype(np.float32)
    plan = route.plan_reduce(dst, n_out, S)
    a = np.asarray(plan(jnp.asarray(src), interpret=True))
    b = np.asarray(plan(jnp.asarray(src), interpret=True))
    np.testing.assert_array_equal(a, b)


def test_routed_ebe_matches_gather_pyramid(rng):
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.ebe import EBEKernel
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE

    V, T = generators.grid_tet(5, 4, 3)
    mesh = FEMMesh(V, T, degree=2, node_order="morton")
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, jnp.float32)
    Ke = em.element_elasticity_fused_apply(
        jnp.asarray(gl, jnp.float32), jnp.asarray(vol, jnp.float32), M, 10)
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), jnp.float32)
    y0 = np.asarray(kern(u))
    y1 = np.asarray(rk(u))
    scale = np.abs(y0).max()
    np.testing.assert_allclose(y1 / scale, y0 / scale, atol=5e-6)
    d0 = np.asarray(kern.diagonal())
    d1 = np.asarray(rk.diagonal())
    np.testing.assert_allclose(d1, d0, rtol=2e-5)


def test_routed_ebe_two_level_matches(rng):
    """Forced two-level scatter == one-level scatter == gather pyramid."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE

    V, T = generators.grid_tet(6, 5, 4)
    mesh = FEMMesh(V, T, degree=2, node_order="morton")
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, jnp.float32)
    Ke = em.element_elasticity_fused_apply(
        jnp.asarray(gl, jnp.float32), jnp.asarray(vol, jnp.float32), M, 10)
    r1 = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3,
                         two_level=False)
    r2 = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3,
                         two_level=True)
    assert len(r2.scatter_rest) >= 1
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), jnp.float32)
    y1 = np.asarray(r1(u))
    y2 = np.asarray(r2(u))
    scale = np.abs(y1).max()
    np.testing.assert_allclose(y2 / scale, y1 / scale, atol=5e-6)
    np.testing.assert_allclose(np.asarray(r2.diagonal()),
                               np.asarray(r1.diagonal()), rtol=2e-5)


def test_routed_ebe_scalar_p1_tri(rng):
    """Scalar Laplace on P1 triangles exercises d == 1 and small nd."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.sparse.ebe import EBEKernel
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE

    V, T = generators.grid_tri(7, 6)
    mesh = FEMMesh(V, T, degree=1, node_order="morton")
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 2)
    Ke = jnp.einsum("eid,ejd,e->eij", gl, gl, jnp.abs(vol))
    Ke = jnp.asarray(Ke, jnp.float32)
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 1)
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 1)
    u = jnp.asarray(rng.standard_normal(mesh.num_nodes), jnp.float32)
    y0 = np.asarray(kern(u))
    y1 = np.asarray(rk(u))
    np.testing.assert_allclose(y1, y0, atol=np.abs(y0).max() * 1e-5)


def test_geometry_invariant_under_node_order():
    """geometry() must not depend on the node numbering (regression: _embed
    indexed permuted node_positions with unpermuted vertex ids)."""
    from meshfem_tpu.mesh import FEMMesh, generators

    V, T = generators.grid_tet(3, 3, 3)
    ref = FEMMesh(V, T, degree=2)
    g0 = ref.geometry()
    for order in ("morton", "rcb", "firsttouch"):
        g = FEMMesh(V, T, degree=2, node_order=order).geometry()
        np.testing.assert_allclose(np.asarray(g.volume),
                                   np.asarray(g0.volume), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g.grad_lambda),
                                   np.asarray(g0.grad_lambda), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g.bdry_volume),
                                   np.asarray(g0.bdry_volume), rtol=1e-12)


def test_morton_node_order_consistency():
    from meshfem_tpu.mesh import FEMMesh, generators

    V, T = generators.grid_tet(4, 4, 4)
    ref = FEMMesh(V, T, degree=2)
    mor = FEMMesh(V, T, degree=2, node_order="morton")
    assert mor.num_nodes == ref.num_nodes
    # the permutation maps reference numbering onto morton numbering
    perm = mor.node_perm
    np.testing.assert_array_equal(perm[ref.elem_nodes], mor.elem_nodes)
    np.testing.assert_array_equal(ref.node_positions[ref.elem_nodes],
                                  mor.node_positions[mor.elem_nodes])
    np.testing.assert_array_equal(np.sort(perm[ref.bdry_nodes]),
                                  mor.bdry_nodes)
    np.testing.assert_array_equal(mor.node_positions[mor.vertex_nodes], V)


def test_routed_ebe_internal_reorder(rng):
    """coords= triggers internal RCB/first-touch reordering; permute_in/out
    round-trips to user ordering and matches the gather-pyramid EBE."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.ebe import EBEKernel
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE

    V, T = generators.grid_tet(6, 5, 4)
    mesh = FEMMesh(V, T, degree=2)           # reference (unordered) numbering
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, jnp.float32)
    Ke = em.element_elasticity_fused_apply(
        jnp.asarray(gl, jnp.float32), jnp.asarray(vol, jnp.float32), M, 10)
    kern = EBEKernel.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3,
                         coords=mesh.node_positions)
    assert rk.order is not None
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), jnp.float32)
    y0 = np.asarray(kern(u))
    y1 = np.asarray(rk.permute_out(rk(rk.permute_in(u))))
    scale = np.abs(y0).max()
    np.testing.assert_allclose(y1 / scale, y0 / scale, atol=5e-6)
    d0 = np.asarray(kern.diagonal())
    d1 = np.asarray(rk.permute_out(rk.diagonal()))
    np.testing.assert_allclose(d1, d0, rtol=2e-5)


def test_routed_ebe_plan_cache(rng):
    """Same connectivity, new Ke values: plans are reused (cache hit)."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.sparse import routed_ebe
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE
    from meshfem_tpu.mesh.geometry import simplex_geometry

    V, T = generators.grid_tri(7, 6)
    mesh = FEMMesh(V, T, degree=1, node_order="morton")
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 2)
    Ke = jnp.asarray(jnp.einsum("eid,ejd,e->eij", gl, gl, jnp.abs(vol)),
                     jnp.float32)
    r1 = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 1)
    r2 = RoutedEBE.build(2.0 * Ke, mesh.elem_nodes, mesh.num_nodes, 1)
    assert r2.gather is r1.gather and r2.scatter is r1.scatter
    u = jnp.asarray(rng.standard_normal(mesh.num_nodes), jnp.float32)
    np.testing.assert_allclose(np.asarray(r2(u)), 2.0 * np.asarray(r1(u)),
                               rtol=1e-5)


def test_simulator_routed_solve_matches_ebe(rng):
    """operator='routed' (f32 CG + f64 refinement) reproduces the EBE f64
    solve through the simulator's public surface."""
    import json
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.physics import ElasticitySimulator, Material, parse_bc

    V, F = generators.grid_tri(8, 4, hi=(2.0, 1.0))
    mesh = FEMMesh(V, F, degree=2)
    bc = parse_bc(json.dumps({"regions": [
        {"type": "dirichlet", "value": [0, 0],
         "box%": {"minCorner": [-0.001, -0.001],
                  "maxCorner": [0.001, 1.001]}},
        {"type": "force", "value": [0, -1.0],
         "box%": {"minCorner": [0.999, -0.001],
                  "maxCorner": [1.001, 1.001]}}]}), dim=2)

    sim = ElasticitySimulator(mesh, Material.isotropic(2, 200.0, 0.3))
    sim.apply_boundary_conditions(bc)
    u0, _ = sim.solve(tol=1e-12, operator="ebe")
    u1, res1 = sim.solve(tol=1e-10, operator="routed")
    scale = np.abs(np.asarray(u0)).max()
    np.testing.assert_allclose(np.asarray(u1) / scale,
                               np.asarray(u0) / scale, atol=1e-8)
    assert res1.resnorm <= 1e-10

    # block preconditioner through the routed path
    u2, _ = sim.solve(tol=1e-10, operator="routed", precond="block")
    np.testing.assert_allclose(np.asarray(u2) / scale,
                               np.asarray(u0) / scale, atol=1e-8)


def test_plans_handle_all_padding_maps():
    """Zero-bucket plans (every id negative) return zeros instead of
    crashing in jnp.concatenate."""
    import jax.numpy as jnp

    from meshfem_tpu.sparse.route import plan_copy, plan_reduce

    p = plan_copy(np.full(2048, -1, np.int64), 128)
    out = p(jnp.arange(128, dtype=jnp.float32), interpret=True)
    assert out.shape == (2048,) and float(abs(out).max()) == 0.0
    r = plan_reduce(np.full(2048, -1, np.int64), 256, 128)
    out2 = r(jnp.arange(128, dtype=jnp.float32), interpret=True)
    assert out2.shape == (256,) and float(abs(out2).max()) == 0.0


def test_routed_ebe_apply_block_matches_single(rng):
    """Multi-RHS apply_block == column-by-column single applies (the
    routing plan is RHS-independent; vmapped pallas kernels)."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE

    V, T = generators.grid_tet(5, 4, 3)
    mesh = FEMMesh(V, T, degree=2)
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, jnp.float32)
    Ke = em.element_elasticity_fused_apply(
        jnp.asarray(gl, jnp.float32), jnp.asarray(vol, jnp.float32), M, 10)
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3,
                         coords=mesh.node_positions)
    U = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3, 6)), jnp.float32)
    Ui = rk.permute_in(U)
    Y = np.asarray(rk.apply_block(Ui))
    assert Y.shape == Ui.shape
    for j in range(6):
        yj = np.asarray(rk(Ui[:, :, j]))
        scale = np.abs(yj).max()
        np.testing.assert_allclose(Y[:, :, j] / scale, yj / scale,
                                   atol=5e-6)


def test_routed_ebe_apply_block_scalar(rng):
    """d == 1 block apply ([N, m])."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE

    V, T = generators.grid_tri(7, 6)
    mesh = FEMMesh(V, T, degree=1, node_order="morton")
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 2)
    Ke = jnp.asarray(jnp.einsum("eid,ejd,e->eij", gl, gl, jnp.abs(vol)),
                     jnp.float32)
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 1)
    U = jnp.asarray(rng.standard_normal((mesh.num_nodes, 4)), jnp.float32)
    Y = np.asarray(rk.apply_block(U))
    for j in range(4):
        yj = np.asarray(rk(U[:, j]))
        np.testing.assert_allclose(Y[:, j], yj,
                                   atol=np.abs(yj).max() * 1e-5)


def test_homogenize_routed_cell_problems(rng):
    """operator='routed' cell problems reproduce the EBE block-CG
    homogenized tensor (f32 block CG + f64 refinement path)."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.physics import Material
    from meshfem_tpu.analysis import homogenization as hom

    V, T = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, T, degree=2)
    mat = Material.isotropic(2, 1.0, 0.3)
    sim = hom.periodic_simulator(mesh, mat)
    w0, _ = hom.solve_cell_problems(sim, tol=1e-11, precond="block",
                                    operator="ebe")
    w1, _ = hom.solve_cell_problems(sim, tol=1e-10, precond="block",
                                    operator="routed")
    Ch0 = hom.homogenized_tensor_stress_form(sim, w0)
    Ch1 = hom.homogenized_tensor_stress_form(sim, w1)
    np.testing.assert_allclose(np.asarray(Ch1), np.asarray(Ch0),
                               rtol=1e-7, atol=1e-9)


def test_routed_ebe_planes_apply_matches_call(rng):
    """apply_planes/PlanesOp ([d, N] plane layout) is the same operator
    as __call__ ([N, d]) — including diagonal_planes and a plane-native
    CG solve reaching the same iterate."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.mesh.geometry import simplex_geometry
    from meshfem_tpu.ops import element_matrices as em
    from meshfem_tpu.fem import elasticity_tensor as et
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE, PlanesOp
    from meshfem_tpu.solvers import cg as cg_mod

    V, T = generators.grid_tet(4, 4, 3)
    mesh = FEMMesh(V, T, degree=2, node_order="morton")
    gl, vol = simplex_geometry(jnp.asarray(V)[jnp.asarray(T)], 3)
    D = et.isotropic(3, 200.0, 0.3)
    M = em.fused_matrix_for(D, 3, 2, jnp.float32)
    Ke = em.element_elasticity_fused_apply(
        jnp.asarray(gl, jnp.float32), jnp.asarray(vol, jnp.float32), M, 10)
    rk = RoutedEBE.build(Ke, mesh.elem_nodes, mesh.num_nodes, 3)
    u = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), jnp.float32)
    y_call = np.asarray(rk(u))
    y_planes = np.asarray(PlanesOp(rk)(u.T)).T
    np.testing.assert_allclose(y_planes, y_call, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rk.diagonal_planes()).T,
                               np.asarray(rk.diagonal()), rtol=1e-6)
    b = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3)), jnp.float32)
    free = jnp.ones_like(b)
    r_row = cg_mod.cg_operator_fixed(rk, b, rk.diagonal(), free, iters=12)
    r_pl = cg_mod.cg_operator_fixed(PlanesOp(rk), b.T, rk.diagonal_planes(),
                                    free.T, iters=12)
    np.testing.assert_allclose(np.asarray(r_pl.x).T, np.asarray(r_row.x),
                               rtol=2e-4, atol=2e-6)
