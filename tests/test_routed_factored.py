"""Factored isotropic routed apply == dense-Ke routed apply == f64 EBE.

The factored contraction (``sparse.routed_ebe`` class docstring) replaces
the dense per-element stiffness read with grad_lambda + volume and the
constant gradgrad table — exact same arithmetic, 69x less element data.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshfem_tpu.mesh import FEMMesh, generators
from meshfem_tpu.physics import ElasticitySimulator, Material
from meshfem_tpu.sparse.routed_ebe import RoutedEBE
from meshfem_tpu.fem import elasticity_tensor as et


def test_lame_parameters_detection():
    D3 = et.isotropic(3, 200.0, 0.3)
    lm = et.lame_parameters(D3)
    assert lm is not None
    assert np.allclose(np.asarray(et.isotropic_lame(3, *lm)),
                       np.asarray(D3))
    # plane stress (2D) uses the effective lambda — still Lame-structured
    assert et.lame_parameters(et.isotropic(2, 1.0, 0.3)) is not None
    # orthotropic is NOT
    D_ortho = et.orthotropic(2, [1.0, 2.0, 0.3, 0.7])
    assert et.lame_parameters(D_ortho) is None
    # per-element batch is NOT (needs the dense path)
    assert et.lame_parameters(jnp.stack([D3, D3])) is None


@pytest.mark.parametrize("dim,deg", [(3, 2), (2, 2), (3, 1)])
def test_factored_matches_dense_and_f64(dim, deg, monkeypatch):
    monkeypatch.setenv("MESHFEM_FACTORED", "1")   # opt-in (see routed_kernel)
    if dim == 3:
        V, T = generators.grid_tet(4, 4, 4)
    else:
        V, T = generators.grid_tri(6, 6)
    mesh = FEMMesh(V, T, degree=deg)
    sim = ElasticitySimulator(mesh, Material.isotropic(dim, 2.3, 0.31))
    rk = sim.routed_kernel()
    assert rk.KeB is None, "isotropic material must take the factored path"
    rkd = RoutedEBE.build(sim.Ke, np.asarray(sim.elem_dofs), sim.num_dofs,
                          sim.dim, coords=np.asarray(mesh.node_positions))
    rng = np.random.default_rng(0)
    u = rng.standard_normal((sim.num_dofs, dim)).astype(np.float32)
    y1 = rk.permute_out(rk(rk.permute_in(jnp.asarray(u))))
    y2 = rkd.permute_out(rkd(rkd.permute_in(jnp.asarray(u))))
    y3 = sim.apply_K(jnp.asarray(u, jnp.float64))
    scale = float(jnp.abs(y3).max())
    assert float(jnp.abs(y1 - y2).max()) / scale < 5e-6
    assert float(jnp.abs(y1 - jnp.asarray(y3, jnp.float32)).max()) \
        / scale < 5e-5
    # diagonal
    d1 = rk.permute_out(rk.diagonal())
    d2 = rkd.permute_out(rkd.diagonal())
    assert float(jnp.abs(d1 - d2).max() / jnp.abs(d2).max()) < 5e-6
    # multi-RHS block apply consistency
    U = rng.standard_normal((sim.num_dofs, dim, 2)).astype(np.float32)
    yb = rk.permute_out(rk.apply_block(rk.permute_in(jnp.asarray(U))))
    yc = jnp.stack([rk.permute_out(rk(rk.permute_in(jnp.asarray(U[..., j]))))
                    for j in range(2)], axis=-1)
    assert float(jnp.abs(yb - yc).max()) < 1e-6


def test_anisotropic_material_keeps_dense_path():
    V, T = generators.grid_tri(5, 5)
    mesh = FEMMesh(V, T, degree=2)
    mat = Material.orthotropic(2, [1.0, 2.0, 0.3, 0.7])
    sim = ElasticitySimulator(mesh, mat)
    rk = sim.routed_kernel()
    assert rk.KeB is not None
    u = np.random.default_rng(0).standard_normal(
        (sim.num_dofs, 2)).astype(np.float32)
    y1 = rk.permute_out(rk(rk.permute_in(jnp.asarray(u))))
    y3 = sim.apply_K(jnp.asarray(u, jnp.float64))
    assert float(jnp.abs(y1 - jnp.asarray(y3, jnp.float32)).max()
                 / jnp.abs(y3).max()) < 5e-5


@pytest.mark.parametrize("dim,deg,n_el", [(3, 2, 10), (2, 2, 6), (3, 1, 4),
                                          (2, 1, 3)])
def test_fused_contract_kernel_matches_einsum(dim, deg, n_el):
    """The Pallas fused contraction (sparse/contract.py) reproduces the
    einsum reference bit-for-bit-close, including the ragged grid tail."""
    import jax
    from meshfem_tpu.sparse.contract import factored_contract
    from meshfem_tpu.ops.element_matrices import gradgrad_table

    rng = np.random.default_rng(1)
    K1 = dim + 1
    Eb = 3                                   # not a multiple of B=2
    g = rng.standard_normal((Eb, K1, dim)).astype(np.float32)
    GB = jnp.asarray(np.broadcast_to(g[:, :, :, None],
                                     (Eb, K1, dim, 128)).copy())
    volB = jnp.asarray(rng.random((Eb, 128)).astype(np.float32) + 0.5)
    ue = jnp.asarray(rng.standard_normal(
        (dim, Eb, n_el, 128)).astype(np.float32))
    lam, mu = 1.7, 0.9

    hp = jax.lax.Precision.HIGHEST
    T = jnp.asarray(gradgrad_table(dim, deg), jnp.float32)
    d1 = jnp.einsum("ekcl,cenl->eknl", GB, ue, precision=hp)
    G2 = jnp.einsum("ekcl,emcl->ekml", GB, GB, precision=hp)
    Le = jnp.einsum("kmij,ekml->eijl", T, G2, precision=hp)
    f1 = mu * jnp.einsum("eijl,cejl->ceil", Le, ue, precision=hp)
    m1 = jnp.einsum("klij,eljL->ekiL", T, d1, precision=hp)
    m2 = jnp.einsum("klij,ekjL->eliL", T, d1, precision=hp)
    f2 = lam * jnp.einsum("ekcL,ekiL->ceiL", GB, m1, precision=hp)
    f3 = mu * jnp.einsum("elcL,eliL->ceiL", GB, m2, precision=hp)
    ref = np.asarray(volB[None, :, None, :] * (f1 + f2 + f3))

    GB2 = GB.reshape(Eb, K1 * dim, 128)
    out = np.asarray(factored_contract(GB2, volB, ue, lam, mu, dim, deg,
                                       interpret=True, B=2))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5


@pytest.mark.parametrize("dim,deg,n_el", [(3, 2, 10), (2, 2, 6), (3, 1, 4)])
def test_qp_contract_kernel_matches_einsum(dim, deg, n_el):
    """The superblock quadrature-point stress kernel (qp_contract)
    reproduces the einsum reference, including superblock padding."""
    import jax
    from meshfem_tpu.sparse.contract import qp_contract
    from meshfem_tpu.ops.element_matrices import gradgrad_table

    rng = np.random.default_rng(2)
    K1 = dim + 1
    E8 = 2
    g = rng.standard_normal((E8, K1, dim)).astype(np.float32)
    GB = jnp.asarray(np.broadcast_to(g[:, :, :, None],
                                     (E8, K1, dim, 1024)).copy())
    volB = jnp.asarray(rng.random((E8, 1024)).astype(np.float32) + 0.5)
    # zero the tail of the last superblock (simulates element padding)
    volB = volB.at[-1, 700:].set(0.0)
    ue = jnp.asarray(rng.standard_normal(
        (dim, E8, n_el, 1024)).astype(np.float32))
    lam, mu = 1.7, 0.9

    hp = jax.lax.Precision.HIGHEST
    T = jnp.asarray(gradgrad_table(dim, deg), jnp.float32)
    d1 = jnp.einsum("ekcl,cenl->eknl", GB, ue, precision=hp)
    G2 = jnp.einsum("ekcl,emcl->ekml", GB, GB, precision=hp)
    Le = jnp.einsum("kmij,ekml->eijl", T, G2, precision=hp)
    f1 = mu * jnp.einsum("eijl,cejl->ceil", Le, ue, precision=hp)
    m1 = jnp.einsum("klij,eljL->ekiL", T, d1, precision=hp)
    m2 = jnp.einsum("klij,ekjL->eliL", T, d1, precision=hp)
    f2 = lam * jnp.einsum("ekcL,ekiL->ceiL", GB, m1, precision=hp)
    f3 = mu * jnp.einsum("elcL,eliL->ceiL", GB, m2, precision=hp)
    ref = np.asarray(volB[None, :, None, :] * (f1 + f2 + f3))

    GB2 = GB.reshape(E8, K1 * dim, 8, 128)
    out = np.asarray(qp_contract(GB2, volB.reshape(E8, 8, 128),
                                 ue.reshape(dim, E8, n_el, 8, 128),
                                 lam, mu, dim, deg, interpret=True))
    out = out.reshape(dim, E8, n_el, 1024)
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5
