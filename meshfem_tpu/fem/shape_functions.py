"""Lagrange shape functions on K-simplices (K = 1, 2, 3; degree 0..4).

Parity with reference ``Functions.hh:59-154`` (P1 barycentric, P2
``lambda (2 lambda - 1)`` / ``4 lambda_a lambda_b``, cubic/quartic triangle
tables), but constructed generically: the degree-``deg`` Lagrange basis on the
barycentric lattice ``alpha / deg`` is obtained by inverting the Vandermonde
matrix of homogeneous degree-``deg`` barycentric monomials.  This one
mechanism covers every (K, deg) pair, yields exact closed-form integration
(monomial integrals over a simplex are rational), and produces constant
coefficient tables that JAX constant-folds into jitted kernels.

Node ordering is GMSH-consistent (``Simplex.hh:31-46``): vertices first, then
edge nodes in edge order (multiple nodes per edge ordered start -> end), then
face nodes (tets), then interior nodes.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp

from . import simplex

# Faces of the tetrahedron (for deg >= 3 interior-face nodes).
_TET_FACES = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))


@functools.lru_cache(maxsize=None)
def node_multi_indices(K: int, deg: int) -> tuple[tuple[int, ...], ...]:
    """Barycentric multi-indices (|alpha| = deg) of the element's nodes,
    in GMSH-consistent order.  Node position = alpha / deg."""
    nv = K + 1
    if deg == 0:
        # Single node at the centroid (piecewise-constant interpolant);
        # position handled specially in node_positions_barycentric.
        return (tuple([0] * nv),)
    nodes: list[tuple[int, ...]] = []
    # Vertices.
    for v in range(nv):
        a = [0] * nv
        a[v] = deg
        nodes.append(tuple(a))
    # Edge nodes (deg - 1 per edge), ordered from start vertex to end vertex.
    for s, e in simplex.simplex_edges(K):
        for t in range(1, deg):
            a = [0] * nv
            a[s] = deg - t
            a[e] = t
            nodes.append(tuple(a))
    # Face-interior nodes (tets, deg >= 3) and triangle-interior nodes.
    def interior(mi_vertices):
        """All multi-indices strictly positive on the given vertex set."""
        k = len(mi_vertices)
        out = []
        def rec(prefix, remaining, slots):
            if slots == 1:
                out.append(prefix + [remaining])
                return
            for v in range(1, remaining - (slots - 1) + 1):
                rec(prefix + [v], remaining - v, slots - 1)
        if deg >= k:
            rec([], deg, k)
        res = []
        for combo in out:
            a = [0] * nv
            for v, c in zip(mi_vertices, combo):
                a[v] = c
            res.append(tuple(a))
        return res

    if K == 2 and deg >= 3:
        nodes.extend(interior((0, 1, 2)))
    if K == 3:
        if deg >= 3:
            for f in _TET_FACES:
                nodes.extend(interior(f))
        if deg >= 4:
            nodes.extend(interior((0, 1, 2, 3)))
    assert len(nodes) == simplex.num_nodes(K, deg), (K, deg, len(nodes))
    return tuple(nodes)


@functools.lru_cache(maxsize=None)
def _monomial_exponents(K: int, deg: int) -> np.ndarray:
    """All multi-indices with |alpha| = deg over K+1 variables, lexicographic."""
    nv = K + 1
    exps: list[tuple[int, ...]] = []

    def rec(prefix, remaining, slots):
        if slots == 1:
            exps.append(tuple(prefix + [remaining]))
            return
        for v in range(remaining + 1):
            rec(prefix + [v], remaining - v, slots - 1)

    rec([], deg, nv)
    return np.array(exps, dtype=np.int64)


def _eval_monomials(exps: np.ndarray, lambdas: np.ndarray) -> np.ndarray:
    """[..., nv] barycentric coords -> [..., M] monomial values (0^0 = 1)."""
    lam = np.asarray(lambdas, dtype=np.float64)
    M, nv = exps.shape
    out = np.ones(lam.shape[:-1] + (M,), dtype=np.float64)
    for m in range(M):
        for v in range(nv):
            e = exps[m, v]
            if e > 0:
                out[..., m] *= lam[..., v] ** e
    return out


@functools.lru_cache(maxsize=None)
def _lagrange_tables(K: int, deg: int):
    """Return (exps [M, nv], coeffs [M, n]) with phi_j = sum_m coeffs[m, j] mono_m."""
    if deg == 0:
        # Constant basis: single node, phi = 1.
        exps = np.zeros((1, K + 1), dtype=np.int64)
        return exps, np.ones((1, 1))
    exps = _monomial_exponents(K, deg)
    nodes = np.array(node_multi_indices(K, deg), dtype=np.float64) / deg
    V = _eval_monomials(exps, nodes)  # [n, M]
    coeffs = np.linalg.inv(V)         # [M, n]: phi_j(node_i) = delta_ij
    coeffs[np.abs(coeffs) < 1e-12] = 0.0
    return exps, coeffs


def eval_shape_np(K: int, deg: int, lambdas) -> np.ndarray:
    """Shape function values: [..., nv] barycentric -> [..., n_nodes] (numpy)."""
    exps, coeffs = _lagrange_tables(K, deg)
    return _eval_monomials(exps, np.asarray(lambdas, dtype=np.float64)) @ coeffs


def grad_shape_np(K: int, deg: int, lambdas) -> np.ndarray:
    """d phi / d lambda: [..., nv] -> [..., n_nodes, nv] (numpy).

    These are gradients w.r.t. barycentric coordinates; spatial gradients
    follow by chaining with grad(lambda) (``EmbeddedElement.hh``)."""
    exps, coeffs = _lagrange_tables(K, deg)
    lam = np.asarray(lambdas, dtype=np.float64)
    nv = K + 1
    M = exps.shape[0]
    grads = np.zeros(lam.shape[:-1] + (coeffs.shape[1], nv), dtype=np.float64)
    for v in range(nv):
        dmono = np.zeros(lam.shape[:-1] + (M,), dtype=np.float64)
        for m in range(M):
            e = exps[m].copy()
            if e[v] == 0:
                continue
            c = float(e[v])
            e[v] -= 1
            term = np.full(lam.shape[:-1], c, dtype=np.float64)
            for w in range(nv):
                if e[w] > 0:
                    term = term * lam[..., w] ** e[w]
            dmono[..., m] = term
        grads[..., v] = dmono @ coeffs
    return grads


def eval_shape(K: int, deg: int, lambdas):
    """JAX version of eval_shape_np (constant tables, differentiable in lambdas)."""
    exps, coeffs = _lagrange_tables(K, deg)
    lam = jnp.asarray(lambdas)
    monos = jnp.stack(
        [jnp.prod(lam ** jnp.asarray(e, dtype=lam.dtype), axis=-1) for e in exps],
        axis=-1,
    )
    return monos @ jnp.asarray(coeffs, dtype=lam.dtype)


@functools.lru_cache(maxsize=None)
def integrated_shape_np(K: int, deg: int) -> np.ndarray:
    """Exact integrals of each shape function over a unit-volume simplex.

    Uses int_simplex prod lambda_i^{a_i} dV = V * K! * prod(a_i!) / (|a|+K)!
    (the reference derives per-degree closed forms, ``Functions.hh:239-318``)."""
    exps, coeffs = _lagrange_tables(K, deg)
    factors = np.array(
        [
            math.factorial(K)
            * np.prod([math.factorial(int(a)) for a in e])
            / math.factorial(int(e.sum()) + K)
            for e in exps
        ]
    )
    return factors @ coeffs


def node_positions_barycentric(K: int, deg: int) -> np.ndarray:
    """[n_nodes, K+1] barycentric coordinates of the element nodes."""
    if deg == 0:
        return np.full((1, K + 1), 1.0 / (K + 1))
    return np.array(node_multi_indices(K, deg), dtype=np.float64) / deg
