"""Eigensolvers: generalized LOBPCG for (K, M) pencils.

TPU-native replacement for the reference's Spectra-based solvers
(``Eigensolver.hh:8-26``: largest-magnitude eigenvalue, n-th largest
generalized pair, smallest nonzero generalized pairs of a PSD matrix with a
known kernel) and the python layer's shift-invert ``eigsh``
(``python/compute_vibrational_modes.py:41-54``).

LOBPCG with M-orthonormalization: big operator applies are batched
matrix-free EBE products (multi-RHS — nearly free on TPU, see
sparse/scatter.py).  Every [N, k]-sized computation stays on DEVICE; only
[3k, 3k] Gram matrices and residual norms cross to host (a few KB per
iteration — round-1 transferred the full subspace blocks every iteration,
a dispatch-bound disaster at 1M DOF).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _rayleigh_ritz(S, KS, MS):
    """Solve the projected pencil (S'KS, S'MS) -> ascending eigenpairs.
    The [3k, 3k] Gram matrices are formed on DEVICE; only they cross to
    host for the tiny dense generalized eigensolve."""
    A = np.asarray(S.T @ KS)
    B = np.asarray(S.T @ MS)
    A = 0.5 * (A + A.T)
    B = 0.5 * (B + B.T)
    import scipy.linalg as sla

    w, v = sla.eigh(A, B)
    return w, v


def lobpcg_generalized(K_apply, M_apply, X0, *, B_orth=None, maxiter: int = 200,
                       tol: float = 1e-8, deflate=None):
    """Smallest `m` eigenpairs of K x = lambda M x.

    K_apply / M_apply: matrix-free multi-RHS operators on [N, m] blocks.
    X0: [N, m] initial block.  ``deflate``: optional [N, k] basis to project
    out (e.g. rigid modes — the 'known kernel Z' of ``Eigensolver.hh:25``).
    Returns (lambdas [m], X [N, m], residual history)."""
    X = jnp.asarray(X0)
    N, m = X.shape

    if deflate is not None:
        # M-orthogonal deflation: restrict to the M-orthogonal complement of
        # span(Z).  (A Euclidean projector would change the pencil and yield
        # wrong eigenvalues for modes not Euclidean-orthogonal to Z.)
        Z = jnp.asarray(np.asarray(deflate, dtype=np.float64))
        MZ = M_apply(Z)
        G = np.asarray(Z.T @ MZ)
        w_g, Q_g = np.linalg.eigh(0.5 * (G + G.T))
        R = Q_g / np.sqrt(np.maximum(w_g, 1e-300))[None, :]
        Zt = Z @ jnp.asarray(R)          # M-orthonormal kernel basis
        MZt = M_apply(Zt)

        def project(V):
            return V - Zt @ (MZt.T @ V)
    else:
        def project(V):
            return V

    def m_orthonormalize(V):
        """Rank-revealing M-orthonormalization: drops near-dependent columns
        instead of amplifying them (amplification resurrects deflated kernel
        components from roundoff)."""
        MV = M_apply(V)
        G = np.asarray(V.T @ MV)
        G = 0.5 * (G + G.T)
        w, Q = np.linalg.eigh(G)
        keep = w > 1e-10 * max(w.max(), 1e-300)
        R = Q[:, keep] / np.sqrt(w[keep])[None, :]
        return V @ jnp.asarray(R)

    X = m_orthonormalize(project(X))
    X_prev = None
    history = []
    lam = None
    for it in range(maxiter):
        KX = K_apply(X)
        MX = M_apply(X)
        G_k = np.asarray(X.T @ KX)
        G_m = np.asarray(X.T @ MX)
        theta = np.diag(G_k) / np.diag(G_m)
        R = KX - MX * jnp.asarray(theta)[None, :]
        rn = np.asarray(jnp.linalg.norm(R, axis=0)) / np.maximum(
            np.abs(theta), 1e-30)
        history.append(rn.copy())
        lam = theta
        if np.all(rn < tol):
            break
        blocks = [X, project(R)] + ([X_prev] if X_prev is not None else [])
        S = jnp.concatenate(blocks, axis=1)
        # Project LAST so kernel components cannot survive the
        # orthonormalization's column mixing.
        S = project(m_orthonormalize(project(S)))
        KS = K_apply(S)
        MS = M_apply(S)
        w, v = _rayleigh_ritz(S, KS, MS)
        k = min(m, v.shape[1])
        X_prev = X
        X = project(S @ jnp.asarray(v[:, :k]))
        lam = w[:k]
    # Final Rayleigh quotients for the returned block (consistent pairing).
    KX = K_apply(X)
    MX = M_apply(X)
    theta = np.diag(np.asarray(X.T @ KX)) / np.diag(np.asarray(X.T @ MX))
    order = np.argsort(theta)
    return theta[order], X[:, jnp.asarray(order)], history


def largest_magnitude_eigenvalue(A_apply, n: int, iters: int = 200,
                                 tol: float = 1e-8, seed: int = 0):
    """Power iteration (``largestMagnitudeEigenvalue``, ``Eigensolver.hh:9``)."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal(n))
    v = v / jnp.linalg.norm(v)
    lam = 0.0
    for _ in range(iters):
        w = A_apply(v)
        lam_new = float(v @ w)
        nw = jnp.linalg.norm(w)
        v = w / nw
        if abs(lam_new - lam) < tol * abs(lam_new):
            lam = lam_new
            break
        lam = lam_new
    return lam, v


def nth_largest_generalized(K_apply, M_apply, n_vec: int, nth: int = 1,
                            N: int | None = None, seed: int = 0, **kw):
    """n-th largest generalized eigenpair of (K, M)
    (``Eigensolver.hh:14-16``): LOBPCG on the negated pencil."""
    rng = np.random.default_rng(seed)
    m = max(nth, n_vec)
    X0 = jnp.asarray(rng.standard_normal((N, m)))
    lam, X, hist = lobpcg_generalized(
        lambda V: -K_apply(V), M_apply, X0, **kw)
    order = np.argsort(lam)  # ascending of -K => largest of K first
    return -lam[order[nth - 1]], X[:, int(order[nth - 1])]


def negative_curvature_direction(H_apply, N: int, tol: float = 1e-6,
                                 maxiter: int = 200, seed: int = 0):
    """Most-negative-eigenvalue direction of a symmetric operator
    (``Eigensolver.hh`` negativeCurvatureDirection): returns
    (lambda_min, v) via LOBPCG with identity metric."""
    rng = np.random.default_rng(seed)
    X0 = jnp.asarray(rng.standard_normal((N, 2)))
    lam, X, _ = lobpcg_generalized(H_apply, lambda V: V, X0, tol=tol,
                                   maxiter=maxiter)
    return float(lam[0]), X[:, 0]
