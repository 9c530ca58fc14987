"""Multi-chip SPMD tests on the virtual 8-device CPU mesh:
partition invariance (1 vs N shards), psum-reduced SpMV, 2D mesh
(elements x RHS blocks), and the driver's dryrun entry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.parallel.sharded import (
    ShardedEBE, pad_elements, sharded_elasticity_solve)


@pytest.fixture(scope="module")
def sim():
    V, T = generators.grid_tet(3, 3, 3)
    mesh = FEMMesh(V, T, degree=2)
    return ElasticitySimulator(mesh, Material.isotropic(3, 200.0, 0.3))


def test_sharded_apply_matches_single(sim):
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, axis_names=("e",))
    op = ShardedEBE.build(mesh, "e", sim.Ke, sim.elem_dofs, sim.num_dofs, 3)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((sim.num_dofs, 3)))
    out_sharded = np.asarray(op(u))
    out_single = np.asarray(sim.apply_K(u))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-12,
                               atol=1e-12)


def test_partition_invariance(sim):
    """Solution identical for 1, 2, 4, 8 shards (SURVEY §4 requirement)."""
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((sim.num_dofs, 3)))
    # project out rigid modes for a consistent singular system? use fixed
    # iterations of plain CG on SPD-projected... simpler: compare raw CG
    # iterates of the same operator.
    results = []
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:n]), axis_names=("e",))
        x = sharded_elasticity_solve(mesh, sim, b, iters=10)
        results.append(np.asarray(x))
    for r in results[1:]:
        np.testing.assert_allclose(r, results[0], rtol=1e-9, atol=1e-10)


def test_multichip_solve_matches_host_direct(sim):
    """The production 2D-mesh entry (domain x rhs sharding, Jacobi PCG,
    Dirichlet mask) converges to the host f64 direct solution."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from meshfem_tpu.parallel.sharded import (
        sharded_elasticity_solve_multichip)
    from meshfem_tpu.sparse.assembly import assemble_scipy

    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                 axis_names=("e", "b"))
    pos = np.asarray(sim.mesh.node_positions)
    free = np.ones((sim.num_dofs, 3))
    free[pos[:, 0] < 1e-9, :] = 0.0

    rng = np.random.default_rng(2)
    B = jnp.asarray(rng.standard_normal((sim.num_dofs, 3, 3)))
    B = B * jnp.asarray(free)[..., None]

    U, res2 = sharded_elasticity_solve_multichip(
        mesh2, sim, B, free_mask=jnp.asarray(free), iters=400)
    assert np.asarray(res2).max() < 1e-16

    K = assemble_scipy(np.asarray(sim.Ke), np.asarray(sim.elem_dofs),
                       sim.num_dofs, 3).tocsr()
    fidx = np.flatnonzero(free.reshape(-1))
    Kff = K[fidx][:, fidx]
    for j in range(3):
        x = spla.spsolve(Kff.tocsc(), np.asarray(B[..., j]).reshape(-1)[fidx])
        full = np.zeros(sim.num_dofs * 3)
        full[fidx] = x
        np.testing.assert_allclose(np.asarray(U[..., j]).reshape(-1), full,
                                   rtol=1e-6, atol=1e-9)


def test_element_padding():
    Ke = jnp.ones((10, 6, 6))
    ed = jnp.ones((10, 2), dtype=jnp.int64)
    Ke2, ed2 = pad_elements(Ke, ed, 4)
    assert Ke2.shape[0] == 12
    assert float(jnp.abs(Ke2[10:]).max()) == 0.0


def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)

    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
