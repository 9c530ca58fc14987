"""Hardware-gated kernel checks (run only when a real TPU is attached).

The CPU suite exercises every routing/contraction kernel in pallas
interpret mode; these tests assert the MOSAIC LOWERING itself on the
attached chip — the gap BENCH_r04 flagged (the fused contract kernel was
interpret-verified only).  Skipped wholesale off-TPU, so the normal
8-device-CPU suite is unaffected.

Run: MESHFEM_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
(the env gate keeps relay-tunnel flakes out of the default suite).
"""

import os

import numpy as np
import pytest

if not os.environ.get("MESHFEM_TPU_TESTS"):
    pytest.skip("TPU hardware tests are opt-in (MESHFEM_TPU_TESTS=1)",
                allow_module_level=True)

import jax  # noqa: E402

# tests/conftest.py forces the CPU platform for the normal suite; undo
# that here (works as long as the backend is not initialized yet)
try:
    jax.config.update("jax_platforms",
                      os.environ.get("JAX_PLATFORMS", "axon") or None)
except Exception:  # pragma: no cover
    pass

import jax.numpy as jnp  # noqa: E402

try:
    _plat = jax.devices()[0].platform
except Exception:
    _plat = "none"
if _plat not in ("tpu", "axon"):
    pytest.skip(f"no TPU attached (platform {_plat})",
                allow_module_level=True)


def test_fused_contract_kernel_mosaic_matches_einsum():
    """factored_contract(interpret=False) on the chip == HIGHEST einsum."""
    from meshfem_tpu.sparse.contract import factored_contract
    from meshfem_tpu.ops.element_matrices import gradgrad_table

    dim, deg, n, Eb = 3, 2, 10, 37          # Eb not divisible by B=8
    K1 = dim + 1
    rng = np.random.default_rng(1)
    GB = jnp.asarray(rng.standard_normal((Eb, K1, dim, 128))
                     .astype(np.float32))
    volB = jnp.asarray(rng.random((Eb, 128)).astype(np.float32) + 0.5)
    ue = jnp.asarray(rng.standard_normal((dim, Eb, n, 128))
                     .astype(np.float32))
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
                                       interpret=False))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_routed_apply_mosaic_matches_f64_ebe():
    """Full routed apply (planes-mode Mosaic kernels) on the chip == f64
    gather-pyramid EBE, both dense-KeB and factored backends."""
    from meshfem_tpu.mesh import FEMMesh, generators
    from meshfem_tpu.physics import ElasticitySimulator, Material
    from meshfem_tpu.sparse.routed_ebe import RoutedEBE
    from meshfem_tpu.fem import elasticity_tensor as et

    V, T = generators.grid_tet(10, 10, 10)
    mesh = FEMMesh(V, T, degree=2)
    sim = ElasticitySimulator(mesh, Material.isotropic(3, 200.0, 0.3))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((sim.num_dofs, 3)), jnp.float32)
    y64 = np.asarray(sim.apply_K(jnp.asarray(u, jnp.float64)))
    scale = np.abs(y64).max()

    rkd = RoutedEBE.build(jnp.asarray(sim.Ke, jnp.float32),
                          np.asarray(sim.elem_dofs), sim.num_dofs, 3,
                          coords=np.asarray(mesh.node_positions),
                          interpret=False)
    yd = np.asarray(rkd.permute_out(rkd(rkd.permute_in(u))))
    assert np.abs(yd - y64).max() / scale < 5e-6

    lam, mu = et.lame_parameters(sim.D)
    rkf = RoutedEBE.build(None, np.asarray(sim.elem_dofs), sim.num_dofs, 3,
                          coords=np.asarray(mesh.node_positions),
                          interpret=False,
                          factor=(sim.geom.grad_lambda, sim.geom.volume,
                                  lam, mu, 2))
    yf = np.asarray(rkf.permute_out(rkf(rkf.permute_in(u))))
    assert np.abs(yf - y64).max() / scale < 5e-6

    # multi-RHS block apply consistency on hardware
    U = jnp.asarray(rng.standard_normal((sim.num_dofs, 3, 2)), jnp.float32)
    Ui = rkd.permute_in(U)
    yb = np.asarray(rkd.permute_out(rkd.apply_block(Ui)))
    yc = np.stack([np.asarray(rkd.permute_out(rkd(Ui[..., j])))
                   for j in range(2)], axis=-1)
    assert np.abs(yb - yc).max() < 1e-5 * scale
