"""ElasticityTensor algebra identities (parity with reference
``tests/test_tensors.cc``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from meshfem_tpu.fem import elasticity_tensor as et
from meshfem_tpu.fem import flattening as fl
from meshfem_tpu.fem.elasticity_tensor import ElasticityTensor


def rand_sym_flat(dim, rng):
    m = rng.standard_normal((dim, dim))
    m = 0.5 * (m + m.T)
    return jnp.asarray(fl.sym_to_flat(m)), m


@pytest.mark.parametrize("dim", [2, 3])
def test_identity_tensor(dim, rng):
    I = et.identity(dim)
    s, m = rand_sym_flat(dim, rng)
    out = et.double_contract(I, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(s), atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_isotropic_lame_contraction(dim, rng):
    lam, mu = 1.7, 0.9
    D = et.isotropic_lame(dim, lam, mu)
    s, m = rand_sym_flat(dim, rng)
    stress_full = lam * np.trace(m) * np.eye(dim) + 2 * mu * m
    out = fl.flat_to_sym(et.double_contract(D, s))
    np.testing.assert_allclose(np.asarray(out), stress_full, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_inverse_roundtrip(dim, rng):
    D = et.isotropic(dim, 200.0, 0.35)
    Dinv = et.inverse(D)
    s, _ = rand_sym_flat(dim, rng)
    rt = et.double_contract(Dinv, et.double_contract(D, s))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(s), atol=1e-10)
    # A : A^-1 as tensors equals the rank-4 identity.
    prod = et.double_contract_tensor(D, Dinv)
    np.testing.assert_allclose(
        np.asarray(prod), np.asarray(et.identity(dim)), atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_isotropic_transform_invariance(dim, rng):
    """Isotropic tensors are invariant under rotations."""
    D = et.isotropic(dim, 5.0, 0.3)
    theta = 0.7
    if dim == 2:
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
    else:
        from scipy.spatial.transform import Rotation

        R = Rotation.from_rotvec([0.3, -0.5, 0.7]).as_matrix()
    D2 = et.transform(D, jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(D2), np.asarray(D), atol=1e-10)


def test_orthotropic_parameters_roundtrip():
    moduli3 = (10.0, 20.0, 30.0, 0.2, 0.1, 0.15, 4.0, 5.0, 6.0)
    T = ElasticityTensor.orthotropic(3, *moduli3)
    rec = [float(x) for x in T.get_orthotropic_parameters()]
    np.testing.assert_allclose(rec, moduli3, rtol=1e-10)

    moduli2 = (10.0, 20.0, 0.22, 4.0)
    T2 = ElasticityTensor.orthotropic(2, *moduli2)
    rec2 = [float(x) for x in T2.get_orthotropic_parameters()]
    np.testing.assert_allclose(rec2, moduli2, rtol=1e-10)


def test_orthotropic_reduces_to_isotropic():
    E, nu = 7.0, 0.28
    mu = E / (2 * (1 + nu))
    iso2 = et.isotropic(2, E, nu)
    orth2 = et.orthotropic_2d(E, E, nu, mu)
    np.testing.assert_allclose(np.asarray(orth2), np.asarray(iso2), atol=1e-10)

    iso3 = et.isotropic(3, E, nu)
    orth3 = et.orthotropic_3d(E, E, E, nu, nu, nu, mu, mu, mu)
    np.testing.assert_allclose(np.asarray(orth3), np.asarray(iso3), atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_eigenstrains(dim):
    D = et.isotropic(dim, 3.0, 0.3)
    strains, lams = et.eigenstrains(D)
    for n in range(strains.shape[-1]):
        s = strains[..., n]
        out = et.double_contract(D, s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(lams[n] * s), atol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_quadruple_contract_full(dim, rng):
    A = rng.standard_normal((fl.flat_len(dim), fl.flat_len(dim)))
    A = jnp.asarray(0.5 * (A + A.T))
    B = rng.standard_normal((fl.flat_len(dim), fl.flat_len(dim)))
    B = jnp.asarray(0.5 * (B + B.T))
    CA, CB = et.to_full(A), et.to_full(B)
    expect = float(jnp.einsum("ijkl,ijkl->", CA, CB))
    assert float(et.quadruple_contract(A, B)) == pytest.approx(expect, rel=1e-12)


def test_batched_constructors(rng):
    E = jnp.asarray(rng.uniform(1.0, 10.0, size=(7,)))
    nu = jnp.asarray(rng.uniform(0.1, 0.4, size=(7,)))
    D = et.isotropic(3, E, nu)
    assert D.shape == (7, 6, 6)
    for i in range(7):
        Di = et.isotropic(3, float(E[i]), float(nu[i]))
        np.testing.assert_allclose(np.asarray(D[i]), np.asarray(Di), atol=1e-12)


def test_full_roundtrip(rng):
    for dim in (2, 3):
        A = rng.standard_normal((fl.flat_len(dim), fl.flat_len(dim)))
        A = jnp.asarray(0.5 * (A + A.T))
        np.testing.assert_allclose(
            np.asarray(et.from_full(et.to_full(A))), np.asarray(A), atol=1e-13)
