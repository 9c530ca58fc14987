"""Shape function identities (parity with reference tests
``test_shape_functions.cc`` and ``test_interpolant.cc`` algebraic checks)."""

import numpy as np
import pytest

from meshfem_tpu.fem import shape_functions as sf
from meshfem_tpu.fem import simplex, quadrature


CASES = [(K, d) for K in (1, 2, 3) for d in (1, 2, 3, 4)]


@pytest.mark.parametrize("K,deg", CASES)
def test_kronecker_delta(K, deg):
    nodes = sf.node_positions_barycentric(K, deg)
    vals = sf.eval_shape_np(K, deg, nodes)
    np.testing.assert_allclose(vals, np.eye(len(nodes)), atol=1e-12)


@pytest.mark.parametrize("K,deg", CASES)
def test_partition_of_unity(K, deg, rng):
    lam = rng.dirichlet(np.ones(K + 1), size=32)
    vals = sf.eval_shape_np(K, deg, lam)
    np.testing.assert_allclose(vals.sum(axis=-1), 1.0, atol=1e-12)
    # Homogeneous representation: sum_i phi_i = (sum_v lambda_v)^deg, so the
    # barycentric gradient of the partition of unity is `deg` in every
    # component (spatial gradients still vanish since sum_v grad(lambda_v)=0).
    grads = sf.grad_shape_np(K, deg, lam)
    np.testing.assert_allclose(grads.sum(axis=-2), float(deg), atol=1e-11)


@pytest.mark.parametrize("K,deg", CASES)
def test_gradients_fd(K, deg, rng):
    lam = rng.dirichlet(np.ones(K + 1), size=4)
    g = sf.grad_shape_np(K, deg, lam)
    eps = 1e-6
    for v in range(K + 1):
        lp, lm = lam.copy(), lam.copy()
        lp[:, v] += eps
        lm[:, v] -= eps
        fd = (sf.eval_shape_np(K, deg, lp) - sf.eval_shape_np(K, deg, lm)) / (2 * eps)
        np.testing.assert_allclose(g[..., v], fd, atol=1e-6)


def test_p2_closed_forms(rng):
    """P2 matches the reference closed forms (``Functions.hh:98-102``):
    vertex 2*lam*(lam-1/2), edge 4*lam_a*lam_b, GMSH edge ordering."""
    for K in (1, 2, 3):
        lam = rng.dirichlet(np.ones(K + 1), size=16)
        vals = sf.eval_shape_np(K, 2, lam)
        nv = K + 1
        for i in range(nv):
            np.testing.assert_allclose(
                vals[:, i], 2.0 * lam[:, i] * (lam[:, i] - 0.5), atol=1e-12)
        for e, (a, b) in enumerate(simplex.simplex_edges(K)):
            np.testing.assert_allclose(
                vals[:, nv + e], 4.0 * lam[:, a] * lam[:, b], atol=1e-12)


@pytest.mark.parametrize("K,deg", CASES)
def test_integrated_shape_functions(K, deg):
    """Closed-form integrals agree with quadrature of the shape functions."""
    qdeg = min(deg, quadrature.MAX_DEGREE[K])
    if deg > quadrature.MAX_DEGREE[K]:
        pytest.skip("no rule of sufficient degree")
    P, W = quadrature.rule_np(K, qdeg)
    quad = np.einsum("q,qn->n", W, sf.eval_shape_np(K, deg, P))
    exact = sf.integrated_shape_np(K, deg)
    np.testing.assert_allclose(quad, exact, atol=1e-14)


def test_jax_matches_numpy(rng):
    import jax.numpy as jnp

    lam = rng.dirichlet(np.ones(3), size=8)
    v_np = sf.eval_shape_np(2, 2, lam)
    v_jax = np.asarray(sf.eval_shape(2, 2, jnp.asarray(lam)))
    np.testing.assert_allclose(v_np, v_jax, atol=1e-12)
