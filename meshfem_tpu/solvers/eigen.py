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

import functools

import numpy as np
import jax.numpy as jnp


def _proj(Zt, MZt, V):
    """M-orthogonal deflation projector (no-op for 0-column bases)."""
    return V - Zt @ (MZt.T @ V)


def _ops_are_pytrees(*ops):
    """True when every operator flattens to array leaves (registered
    pytree callables like EBEKernel) — safe to pass as jit arguments."""
    import jax

    for op in ops:
        leaves = jax.tree_util.tree_leaves(op)
        if any(not hasattr(l, "shape") for l in leaves):
            return False
    return True


def _impl_ortho_gram(M_op, V):
    MV = M_op(V)
    G = V.T @ MV
    return 0.5 * (G + G.T)


def _impl_apply_gram(K_op, M_op, Zt, MZt, S, Ror):
    S2 = _proj(Zt, MZt, S @ Ror)
    KS = K_op(S2)
    MS = M_op(S2)
    A = S2.T @ KS
    B = S2.T @ MS
    return S2, 0.5 * (A + A.T), 0.5 * (B + B.T)


def _impl_residuals(K_op, M_op, Zt, MZt, X):
    KX = K_op(X)
    MX = M_op(X)
    gk = jnp.einsum("nm,nm->m", X, KX)
    gm = jnp.einsum("nm,nm->m", X, MX)
    theta = gk / gm
    R = KX - MX * theta[None, :]
    rn = jnp.linalg.norm(R, axis=0)
    return theta, rn, _proj(Zt, MZt, R)


def _jit(f):
    import jax

    return jax.jit(f)


_stage_ortho_gram = _jit(_impl_ortho_gram)
_stage_apply_gram = _jit(_impl_apply_gram)
_stage_residuals = _jit(_impl_residuals)
_stage_update = _jit(lambda Zt, MZt, S2, v: _proj(Zt, MZt, S2 @ v))


def _device_lobpcg_chunk_impl(K_op, M_op, Zt, MZt, X, Xp, chunk):
    """``chunk`` LOBPCG iterations entirely on device: the [3m, 3m] Ritz
    pencil is solved by the parallel-Jacobi generalized eigensolver
    (``utils.linalg.generalized_eigh``) inside the loop — ZERO host
    round trips per iteration (the host version pays two [3m, 3m] host
    eigensolves + their transfers every iteration, 2 relay RTTs).

    Conditioning: the trial block S = [X, R, X_prev] is column-scaled by
    1/sqrt(diag(B)) before the Ritz solve (near convergence the residual
    columns shrink like rn^2 in B, and an unscaled rcond cut would drop
    them while they still carry the correction)."""
    import jax

    from ..utils import linalg as la

    m = X.shape[1]

    def proj(V):
        return V - Zt @ (MZt.T @ V)

    def rayleigh(X):
        KX = K_op(X)
        MX = M_op(X)
        gk = jnp.einsum("nm,nm->m", X, KX)
        gm = jnp.einsum("nm,nm->m", X, MX)
        theta = gk / jnp.where(gm == 0, 1.0, gm)
        R = proj(KX - MX * theta[None, :])
        return KX, MX, theta, R

    def one(carry, _):
        X, Xp = carry
        KX, MX, theta, R = rayleigh(X)
        KR = K_op(R)
        MR = M_op(R)
        KP = K_op(Xp)
        MP = M_op(Xp)
        S = jnp.concatenate([X, R, Xp], axis=1)
        KS = jnp.concatenate([KX, KR, KP], axis=1)
        MS = jnp.concatenate([MX, MR, MP], axis=1)
        A = S.T @ KS
        B = S.T @ MS
        A = 0.5 * (A + A.T)
        B = 0.5 * (B + B.T)
        d = jnp.sqrt(jnp.abs(jnp.diagonal(B)))
        dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
        As = A * dinv[:, None] * dinv[None, :]
        Bs = B * dinv[:, None] * dinv[None, :]
        w, v = la.generalized_eigh(As, Bs)
        C = dinv[:, None] * v[:, :m]
        Xn = proj(S @ C)
        return (Xn, X), None

    (X, Xp), _ = jax.lax.scan(one, (X, Xp), None, length=chunk)
    _, _, theta, R = rayleigh(X)
    rn = jnp.linalg.norm(R, axis=0)
    return X, Xp, theta, rn


_device_lobpcg_chunk = None


def _get_device_chunk():
    global _device_lobpcg_chunk
    if _device_lobpcg_chunk is None:
        import jax

        _device_lobpcg_chunk = jax.jit(_device_lobpcg_chunk_impl,
                                       static_argnames=("chunk",))
    return _device_lobpcg_chunk


def lobpcg_generalized(K_apply, M_apply, X0, *, B_orth=None, maxiter: int = 200,
                       tol: float = 1e-8, deflate=None,
                       device_loop: bool | None = None, chunk: int = 10):
    """Smallest `m` eigenpairs of K x = lambda M x.

    K_apply / M_apply: matrix-free multi-RHS operators on [N, m] blocks.
    X0: [N, m] initial block.  ``deflate``: optional [N, k] basis to project
    out (e.g. rigid modes — the 'known kernel Z' of ``Eigensolver.hh:25``).
    Returns (lambdas [m], X [N, m], residual history).

    Dispatch economy on relayed backends: each iteration's device work is
    FUSED into four jitted calls (with the operators and deflation basis
    as pytree arguments, so nothing is baked into the executables) — the
    eager version issued ~15-20 individual device ops per iteration, each
    paying a multi-ms relay round trip.  Only [3m, 3m] Grams and [m]
    residual norms cross to the host, which does the tiny eigensolves.

    ``device_loop`` (default: on for pytree operators): run ``chunk``
    iterations per dispatch ENTIRELY on device — the Ritz pencil is
    solved by the parallel-Jacobi generalized eigensolver, so no host
    eigensolves at all; one [m] residual readback per chunk decides
    convergence."""
    import jax

    X = jnp.asarray(X0)
    N, m = X.shape
    if device_loop is None:
        device_loop = _ops_are_pytrees(K_apply, M_apply)

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
    else:
        Zt = jnp.zeros((N, 0), X.dtype)
        MZt = jnp.zeros((N, 0), X.dtype)

    def project(V):
        return _proj(Zt, MZt, V)

    if device_loop and _ops_are_pytrees(K_apply, M_apply):
        run = _get_device_chunk()
        Xp = jnp.zeros_like(X)
        X = _proj(Zt, MZt, X)
        history = []
        theta = None
        it = 0
        while it < maxiter:
            n_it = min(chunk, maxiter - it)
            X, Xp, theta_d, rn_d = run(K_apply, M_apply, Zt, MZt, X, Xp,
                                       chunk=n_it)
            it += n_it
            theta = np.asarray(theta_d)
            rn = np.asarray(rn_d) / np.maximum(np.abs(theta), 1e-30)
            history.append(rn.copy())
            if np.all(rn < tol):
                break
        order = np.argsort(theta)
        return theta[order], X[:, jnp.asarray(order)], history

    if _ops_are_pytrees(K_apply, M_apply):
        # module-level jitted stages, operators as pytree ARGUMENTS:
        # the executables carry no baked operator arrays and are reused
        # across lobpcg calls
        sog = lambda V: _stage_ortho_gram(M_apply, V)
        sag = lambda S, R: _stage_apply_gram(K_apply, M_apply, Zt, MZt,
                                             S, R)
        sres = lambda X: _stage_residuals(K_apply, M_apply, Zt, MZt, X)
        supd = lambda S2, v: _stage_update(Zt, MZt, S2, v)
    else:
        # generic closures: jit per lobpcg call (operators captured)
        sog = jax.jit(lambda V: _impl_ortho_gram(M_apply, V))
        sag = jax.jit(lambda S, R: _impl_apply_gram(K_apply, M_apply, Zt,
                                                    MZt, S, R))
        sres = jax.jit(lambda X: _impl_residuals(K_apply, M_apply, Zt,
                                                 MZt, X))
        supd = jax.jit(lambda S2, v: _proj(Zt, MZt, S2 @ v))

    def m_orthonormalize_factor(V):
        """Host factor of the rank-revealing M-orthonormalization: returns
        the [k, k'] mixing matrix (dropping near-dependent columns instead
        of amplifying them — amplification resurrects deflated kernel
        components from roundoff)."""
        G = np.asarray(sog(V))
        w, Q = np.linalg.eigh(G)
        keep = w > 1e-10 * max(w.max(), 1e-300)
        return jnp.asarray(Q[:, keep] / np.sqrt(w[keep])[None, :])

    import scipy.linalg as sla

    Xp = project(X)
    X = supd(Xp, m_orthonormalize_factor(Xp))
    X_prev = None
    history = []
    lam = None
    for it in range(maxiter):
        theta_d, rn_d, Rp = sres(X)
        theta = np.asarray(theta_d)
        rn = np.asarray(rn_d) / np.maximum(np.abs(theta), 1e-30)
        history.append(rn.copy())
        lam = theta
        if np.all(rn < tol):
            break
        blocks = [X, Rp] + ([X_prev] if X_prev is not None else [])
        S = jnp.concatenate(blocks, axis=1)
        Ror = m_orthonormalize_factor(S)
        S2, A, B = sag(S, Ror)
        w, v = sla.eigh(np.asarray(A), np.asarray(B))
        k = min(m, v.shape[1])
        X_prev = X
        X = supd(S2, jnp.asarray(v[:, :k]))
        lam = w[:k]
    # Final Rayleigh quotients for the returned block (consistent pairing).
    theta = np.asarray(sres(X)[0])
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
