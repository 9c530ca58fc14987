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
