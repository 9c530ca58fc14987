"""SPSDSystem facade — API parity with the reference's constrained-solve
orchestrator (``SparseMatrices.hh:2298-2718``: ``setConstrained``,
``fixVariables``, ``solve``) on top of projection-PCG (and an optional host
direct solve for small systems / verification).

The reference builds a Lagrange system [K C'; C 0] and/or eliminates fixed
variables; here constraints become projections so the operator stays SPD:

* ``fix_variables(vars, values)``  — Dirichlet elimination (mask projection);
* ``set_constrained(C, rhs)``      — affine constraints C u = c enforced by
  projecting onto null(C) (+ a particular solution);
* factorization caching maps to jitted-solver reuse: one system solves many
  right-hand sides (``SPSDSystem`` keeps its factorization, used by the
  homogenization cell problems).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import cg as cg_mod


class SPSDSystem:
    """Constrained SPSD solver over a matrix-free operator (or scipy CSR)."""

    def __init__(self, A, n: int | None = None, M_inv=None):
        """A: callable [n]->[n] (flat DOF vectors) or a scipy sparse matrix."""
        if callable(A):
            if n is None:
                raise ValueError("matrix-free SPSDSystem needs n")
            self._apply = A
            self.n = n
            self._scipy = None
        else:
            self._scipy = A.tocsr()
            self.n = A.shape[0]
            self._apply = self._scipy_apply
        self._M_inv = M_inv
        self._fixed = np.zeros(self.n, dtype=bool)
        self._fixed_values = np.zeros(self.n)
        self._C = None          # [k, n] constraint matrix
        self._c_rhs = None
        self._null_proj = None

    def _scipy_apply(self, u):
        # host matvec usable under jit/while_loop tracing (pure_callback;
        # a plain np.asarray on a tracer raises TracerArrayConversionError)
        import jax

        shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
        return jax.pure_callback(
            lambda x: np.asarray(self._scipy @ np.asarray(x),
                                 dtype=x.dtype), shape, u)

    # -- constraint API (reference names) --------------------------------
    def fix_variables(self, vars, values) -> None:
        vars = np.asarray(vars)
        self._fixed[vars] = True
        self._fixed_values[vars] = np.broadcast_to(values, vars.shape)

    def set_constrained(self, C, rhs=None) -> None:
        """Add affine constraints C u = rhs (default 0).  Homogeneous
        constraints become a nullspace projection; inhomogeneous add a
        particular solution via least squares."""
        C = np.atleast_2d(np.asarray(C))
        self._C = C if self._C is None else np.vstack([self._C, C])
        r = np.zeros(C.shape[0]) if rhs is None else np.asarray(rhs)
        self._c_rhs = r if self._c_rhs is None else \
            np.concatenate([self._c_rhs, r])
        self._null_proj = None

    # -- solve ------------------------------------------------------------
    def _projector(self):
        free = jnp.asarray(~self._fixed, dtype=jnp.float64)
        mask_p = cg_mod.mask_projector(free)
        if self._C is None:
            return mask_p, None
        if self._null_proj is None:
            Q, _ = np.linalg.qr(self._C.T)
            self._null_proj = jnp.asarray(Q)
        Q = self._null_proj

        def project(v):
            v = mask_p(v)
            v = v - Q @ (Q.T @ v)
            return mask_p(v)

        return project, Q

    def particular_solution(self):
        u = jnp.asarray(np.where(self._fixed, self._fixed_values, 0.0))
        if self._C is not None and np.any(self._c_rhs != 0):
            up, *_ = np.linalg.lstsq(self._C, self._c_rhs, rcond=None)
            u = u + jnp.asarray(up)
        return u

    def solve(self, b, tol: float = 1e-12, maxiter: int = 100000,
              direct: bool = False):
        """Solve the constrained system for RHS b [n] (or [n, m] multi-RHS)."""
        b = jnp.asarray(b)
        if direct or (self._scipy is not None and self.n <= 20000):
            return self._solve_direct(b)
        multi = b.ndim == 2
        free = jnp.asarray(~self._fixed, dtype=jnp.float64)
        mask = free[:, None] if multi else free
        _, Q = self._projector()

        def proj(v):
            v = v * mask.astype(v.dtype)
            if Q is not None:
                v = v - Q @ (Q.T @ v)   # [n,k]@[k,(m)] — multi-RHS native
                v = v * mask.astype(v.dtype)
            return v

        u_p = self.particular_solution()
        if not multi:
            Ap = self._apply
            rhs = b - Ap(u_p)
        elif self._scipy is not None:
            Ap = self._scipy_apply
            rhs = b - Ap(jnp.broadcast_to(u_p[:, None], b.shape))
        else:
            # Batch the matrix-free operator over RHS columns as ONE fused
            # vmapped op (the scatter-plan kernels handle block RHS natively
            # under vmap) instead of a per-column Python loop.
            import jax

            Ap = jax.vmap(self._apply, in_axes=1, out_axes=1)
            rhs = b - jnp.broadcast_to(self._apply(u_p)[:, None], b.shape)
        res = cg_mod.cg(Ap, rhs, M_inv=self._M_inv, project=proj,
                        tol=tol, maxiter=maxiter)
        return res.x + (u_p[:, None] if multi else u_p)

    def _solve_direct(self, b):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        A = self._scipy
        if A is None:
            raise ValueError("direct solve requires an assembled matrix")
        n = self.n
        fixed = self._fixed
        if self._C is not None:
            # KKT system [A C'; C 0] like the reference's Lagrange path.
            C = sp.csr_matrix(self._C)
            k = C.shape[0]
            K = sp.bmat([[A, C.T], [C, None]], format="csr").tolil()
            bfull = np.concatenate([np.asarray(b), self._c_rhs])
        else:
            K = A.tolil()
            bfull = np.asarray(b).copy()
        for i in np.flatnonzero(fixed):
            K.rows[i] = [i]
            K.data[i] = [1.0]
            bfull[i] = self._fixed_values[i]
        x = spla.spsolve(K.tocsc(), bfull)
        return jnp.asarray(x[:n])
