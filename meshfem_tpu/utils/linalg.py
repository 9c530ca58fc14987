"""Small dense linear algebra that runs in float64 on TPU.

XLA:TPU only implements LuDecomposition / Eigh expanders for f32, so
``jnp.linalg.inv``/``solve``/``eigh`` fail for f64 inputs on device.  FEM needs
tiny (<= 6x6 Voigt, <= 30x30 element) f64 inverses on the hot path, so we
provide unrolled Gauss-Jordan elimination with partial pivoting — pure
jnp ops (where/argmax/outer) that compile for any backend and batch over
leading axes — plus a Jacobi eigensolver for small symmetric matrices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def det(A):
    """Closed-form determinant for [..., n, n], n <= 3 (f64-safe on TPU,
    where jnp.linalg.det lowers to an unsupported LU for f64)."""
    n = A.shape[-1]
    if n == 1:
        return A[..., 0, 0]
    if n == 2:
        return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    if n == 3:
        return (
            A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
        )
    raise ValueError("closed-form det only for n <= 3")


def inv(A):
    """Batched inverse of small matrices [..., n, n] via Gauss-Jordan with
    partial pivoting.  Unrolled over n (use only for n <~ 32)."""
    n = A.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = jnp.concatenate([A, I], axis=-1)  # [..., n, 2n]

    for k in range(n):
        # Partial pivot: find the largest |entry| in column k, rows k..n-1.
        col = jnp.abs(M[..., :, k])
        mask = jnp.arange(n) >= k
        piv = jnp.argmax(jnp.where(mask, col, -1.0), axis=-1)  # [...]
        # Swap rows k and piv.
        rows = jnp.arange(n)
        perm = jnp.where(rows[..., None, :] == k, piv[..., None, None],
                         jnp.where(rows[..., None, :] == piv[..., None, None],
                                   k, rows[..., None, :]))  # [..., 1, n]
        M = jnp.take_along_axis(M, jnp.swapaxes(perm, -1, -2), axis=-2)
        # Eliminate column k from all other rows.
        pivot_row = M[..., k, :] / M[..., k, k][..., None]       # [..., 2n]
        factors = M[..., :, k]                                    # [..., n]
        update = factors[..., :, None] * pivot_row[..., None, :]
        keep = (rows != k)[..., :, None]
        M = jnp.where(keep, M - update, pivot_row[..., None, :])
    return M[..., :, n:]


def solve(A, b):
    """Solve A x = b for small A [..., n, n], b [..., n] or [..., n, m]."""
    Ainv = inv(A)
    if b.ndim == A.ndim - 1:
        return jnp.einsum("...ij,...j->...i", Ainv, b)
    return jnp.einsum("...ij,...jm->...im", Ainv, b)


def eigh_jacobi(A, sweeps: int = 12):
    """Batched symmetric eigendecomposition via cyclic Jacobi rotations.

    Works in f64 on TPU (jnp.linalg.eigh does not).  Returns (w, V) with
    columns of V the eigenvectors, eigenvalues ascending.  `sweeps` full
    cyclic sweeps give ~quadratic convergence; 12 is ample for n <= 12."""
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = A

    def rotate(M, V, p, q):
        app = M[..., p, p]
        aqq = M[..., q, q]
        apq = M[..., p, q]
        # Jacobi rotation angle (stable formulation).
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
        # sign(0) = 0 would kill the 45-degree rotation needed when the
        # diagonal entries coincide; treat tau >= 0 as positive instead.
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # Apply rotation G(p, q, theta) on both sides: M = G^T M G, V = V G.
        rows = jnp.arange(n)
        ep = (rows == p).astype(M.dtype)
        eq = (rows == q).astype(M.dtype)
        # G = I + (c-1)(ep ep^T + eq eq^T) + s(ep eq^T) - s(eq ep^T)
        Mp = M[..., :, p]
        Mq = M[..., :, q]
        new_p = c[..., None] * Mp - s[..., None] * Mq
        new_q = s[..., None] * Mp + c[..., None] * Mq
        M = M + (new_p - Mp)[..., :, None] * ep + (new_q - Mq)[..., :, None] * eq
        Mp = M[..., p, :]
        Mq = M[..., q, :]
        new_p = c[..., None] * Mp - s[..., None] * Mq
        new_q = s[..., None] * Mp + c[..., None] * Mq
        M = M + ep[:, None] * (new_p - Mp)[..., None, :] + eq[:, None] * (new_q - Mq)[..., None, :]
        Vp = V[..., :, p]
        Vq = V[..., :, q]
        new_p = c[..., None] * Vp - s[..., None] * Vq
        new_q = s[..., None] * Vp + c[..., None] * Vq
        V = V + (new_p - Vp)[..., :, None] * ep + (new_q - Vq)[..., :, None] * eq
        return M, V

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                M, V = rotate(M, V, p, q)

    w = jnp.diagonal(M, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def orthonormalize(Z, passes: int = 2):
    """Column-orthonormalize Z [n, k] by modified Gram-Schmidt with
    re-orthogonalization — pure einsum/vector ops, so it stays genuinely
    f64 on TPU (jnp.linalg.qr silently degrades there, which is fatal for
    nullspace projectors of singular CG systems).  k is small (<= 6)."""
    Z = jnp.asarray(Z)
    k = Z.shape[1]
    cols = [Z[:, j] for j in range(k)]
    for _ in range(passes):
        out = []
        for j in range(k):
            v = cols[j]
            for q in out:
                v = v - q * jnp.vdot(q, v)
            out.append(v / jnp.sqrt(jnp.vdot(v, v)))
        cols = out
    return jnp.stack(cols, axis=1)


def _round_robin_schedule(n: int) -> np.ndarray:
    """[n-1, n/2, 2] disjoint-pair rotation schedule (circle method; n
    even — callers pad odd sizes with a dummy index n-1)."""
    assert n % 2 == 0
    ring = list(range(1, n))
    rounds = []
    for _ in range(n - 1):
        idx = [0] + ring
        pairs = [(idx[i], idx[n - 1 - i]) for i in range(n // 2)]
        rounds.append(pairs)
        ring = [ring[-1]] + ring[:-1]
    return np.asarray(rounds, np.int32)


def eigh_jacobi_par(A, sweeps: int = 14):
    """Batched symmetric eigendecomposition via PARALLEL-ORDER cyclic
    Jacobi: each round applies n/2 disjoint rotations at once, and the
    sweep loop is a ``lax.fori_loop`` over a static round-robin schedule
    — O(n) graph size instead of the O(n^2 * sweeps) unrolled
    :func:`eigh_jacobi`, so it stays compile-cheap for the n ~ 16-64
    Gram pencils of the device LOBPCG loop.  f64-safe on TPU."""
    A = jnp.asarray(A)
    n0 = A.shape[-1]
    n = n0 + (n0 % 2)
    if n != n0:  # pad with an isolated unit diagonal (dummy index)
        pad = [(0, 0)] * (A.ndim - 2) + [(0, 1), (0, 1)]
        A = jnp.pad(A, pad) + jnp.pad(
            jnp.zeros(A.shape[:-2] + (n0, n0), A.dtype), pad,
            constant_values=0).at[..., n0, n0].set(0)
        A = A.at[..., n0, n0].set(1.0)
    sched = jnp.asarray(_round_robin_schedule(n))      # [n-1, n/2, 2]
    V0 = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)

    def round_step(r, MV):
        M, V = MV
        P = sched[r, :, 0]
        Q = sched[r, :, 1]
        app = M[..., P, P]
        aqq = M[..., Q, Q]
        apq = M[..., P, Q]
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # columns
        Mp = jnp.take(M, P, axis=-1)
        Mq = jnp.take(M, Q, axis=-1)
        M = M.at[..., :, P].set(c[..., None, :] * Mp
                                - s[..., None, :] * Mq)
        M = M.at[..., :, Q].set(s[..., None, :] * Mp
                                + c[..., None, :] * Mq)
        # rows
        Mp = jnp.take(M, P, axis=-2)
        Mq = jnp.take(M, Q, axis=-2)
        M = M.at[..., P, :].set(c[..., :, None] * Mp
                                - s[..., :, None] * Mq)
        M = M.at[..., Q, :].set(s[..., :, None] * Mp
                                + c[..., :, None] * Mq)
        Vp = jnp.take(V, P, axis=-1)
        Vq = jnp.take(V, Q, axis=-1)
        V = V.at[..., :, P].set(c[..., None, :] * Vp
                                - s[..., None, :] * Vq)
        V = V.at[..., :, Q].set(s[..., None, :] * Vp
                                + c[..., None, :] * Vq)
        return (M, V)

    def sweep(_, MV):
        return jax.lax.fori_loop(0, n - 1, round_step, MV)

    M, V = jax.lax.fori_loop(0, sweeps, sweep, (A, V0))
    w = jnp.diagonal(M, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    if n != n0:  # drop the dummy: its eigenpair is (1, e_n) — locate by
        # the dummy coordinate and remove that column
        dummy_coord = jnp.abs(V[..., n0, :])
        keep = jnp.argsort(dummy_coord, axis=-1)[..., :n0]
        keep = jnp.sort(keep, axis=-1)
        w = jnp.take_along_axis(w, keep, axis=-1)
        V = jnp.take_along_axis(V[..., :n0, :], keep[..., None, :],
                                axis=-1)
    return w, V


def generalized_eigh(A, B, sweeps: int = 14, rcond: float = 1e-10):
    """Device generalized symmetric eigensolve ``A v = w B v`` with B PSD
    (possibly rank-deficient — zero/near-dependent directions are
    zero-weighted rather than amplified, and their spurious eigenvalues
    are pushed to +inf-like values so 'smallest-k' selections skip them).

    Returns (w ascending, V) with ``V^T B V = I`` on the kept subspace.
    All work on device (parallel Jacobi x2) — the building block that
    removes the per-iteration host eigensolves from LOBPCG."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    wB, QB = eigh_jacobi_par(B, sweeps=sweeps)
    good = wB > rcond * jnp.max(wB, axis=-1, keepdims=True)
    inv_sqrt = jnp.where(good, 1.0 / jnp.sqrt(jnp.where(good, wB, 1.0)),
                         0.0)
    T = QB * inv_sqrt[..., None, :]
    At = jnp.einsum("...ki,...kl,...lj->...ij", T, A, T)
    At = 0.5 * (At + jnp.swapaxes(At, -1, -2))
    big = 2.0 * jnp.sum(jnp.abs(jnp.diagonal(At, axis1=-2, axis2=-1)),
                        axis=-1) + 1.0
    At = At + (jnp.eye(At.shape[-1], dtype=At.dtype)
               * (big[..., None, None]
                  * (~good).astype(At.dtype)[..., None, :]
                  * jnp.eye(At.shape[-1], dtype=At.dtype)))
    wA, QA = eigh_jacobi_par(At, sweeps=sweeps)
    V = jnp.einsum("...ik,...kj->...ij", T, QA)
    return wA, V
