"""Quadrature exactness: every rule integrates the complete monomial basis of
its degree exactly (parity with reference ``tests/test_quadrature.cc:26-50``,
tol 1e-15 relative)."""

import math
import itertools

import numpy as np
import pytest

from meshfem_tpu.fem import quadrature


def exact_monomial_integral(K, alpha):
    """Integral of prod(lambda_i^alpha_i) over a unit-volume K-simplex."""
    num = math.factorial(K) * np.prod([math.factorial(a) for a in alpha])
    return num / math.factorial(sum(alpha) + K)


def monomials_up_to(K, degree):
    nv = K + 1
    for total in range(degree + 1):
        for alpha in itertools.product(range(total + 1), repeat=nv):
            if sum(alpha) == total:
                yield alpha


@pytest.mark.parametrize("K", [1, 2, 3])
def test_exactness(K):
    for degree in range(1, quadrature.MAX_DEGREE[K] + 1):
        P, W = quadrature.rule_np(K, degree)
        for alpha in monomials_up_to(K, degree):
            val = float(np.sum(W * np.prod(P ** np.array(alpha), axis=1)))
            exact = exact_monomial_integral(K, alpha)
            assert val == pytest.approx(exact, rel=2e-14, abs=2e-15), (
                K, degree, alpha)


@pytest.mark.parametrize("K", [1, 2, 3])
def test_weights_sum_to_one(K):
    for degree in range(1, quadrature.MAX_DEGREE[K] + 1):
        _, W = quadrature.rule_np(K, degree)
        assert float(W.sum()) == pytest.approx(1.0, abs=1e-14)


def test_barycentric_points_valid():
    for K in (1, 2, 3):
        for degree in range(1, quadrature.MAX_DEGREE[K] + 1):
            P, _ = quadrature.rule_np(K, degree)
            np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-14)


def test_integrate_function():
    # integral of x over the unit triangle (area 1/2): 1/6.
    import jax.numpy as jnp

    val = quadrature.integrate(2, 1, lambda lam: lam[1], volume=0.5)
    assert float(val) == pytest.approx(1.0 / 6.0, rel=1e-14)
