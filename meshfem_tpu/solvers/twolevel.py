"""P1-coarse two-level preconditioner for unstructured P2 meshes.

The reference sidesteps ill-conditioning entirely by factorizing with
CHOLMOD (one factorization, many back-substitutions —
``PeriodicHomogenization.hh:48-53``, ``SparseMatrices.hh:1984-2296``); our
matrix-free CG instead pays O(sqrt(kappa)) iterations, which explodes on
high-contrast material fields.  This module restores bounded iteration
counts with the textbook two-level method, built on a fact special to
degree-2 spaces: **P1 on the same mesh is exactly nested in P2** (every P2
edge node is its edge's midpoint, so linear interpolation is exact and the
Galerkin coarse operator equals the rediscretized P1 stiffness — verified
to 1e-13 in ``tests/test_structured_mg.py``).

* transfers: prolongation ``u2[dof] = (u1[cA] + u1[cB]) / 2`` where
  cA/cB are the endpoint vertices of the dof's node (a vertex node is its
  own both endpoints) — one 2-row gather per dof; restriction is the
  adjoint segment_sum.  Multi-RHS blocks ride along free.
* coarse matrix: host-side Galerkin triple product ``P^T A P`` on the
  scipy-assembled fine operator (exact for any material field, periodic
  dof identification included), Dirichlet-masked, factorized once with
  SuperLU and applied through ``jax.pure_callback`` (f64 on host).
* smoother: exact per-node d x d block Jacobi.
* modes: ``additive`` (B = S + P Ac^-1 R — no extra operator applies per
  application; the default for the gather-bound EBE path) and
  ``multiplicative`` (pre/post-smoothed symmetric cycle — 2 extra fine
  applies per application; stronger, for cheap operators).

Both variants are fixed linear SPD maps, hence valid plain-CG
preconditioners.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def p2_vertex_endpoints(mesh):
    """[N, 2] endpoint VERTEX ids for every P2 node (vertex nodes repeat
    themselves), valid for any ``node_order``."""
    if mesh.degree != 2:
        raise ValueError("two-level preconditioner requires a P2 mesh")
    return mesh.node_endpoint_vertices()


class TwoLevel:
    """Two-level preconditioner; use :meth:`M_inv` inside ``cg``/``cg_block``.

    Not a pytree on purpose — the coarse factorization lives on the host
    and is reached through ``pure_callback``; the device-side pieces
    (index arrays, block inverses) are small closures."""

    def __init__(self, cA, cB, n_coarse, lu_solve, smoother, mode,
                 apply_A=None, project=None):
        self.cA = jnp.asarray(cA)
        self.cB = jnp.asarray(cB)
        self.n_coarse = int(n_coarse)
        self._lu_solve = lu_solve
        self.smoother = smoother
        self.mode = mode
        self.apply_A = apply_A
        self.project = project or (lambda v: v)

    # -- build ----------------------------------------------------------
    @classmethod
    def from_simulator(cls, sim, mode: str = "additive",
                       free_mask=None, project=None,
                       node_order=None, apply_A=None) -> "TwoLevel":
        """sim: ElasticitySimulator (any dof_map, incl. periodic).

        free_mask [num_dofs, d] (True = free) masks the coarse matrix to
        the Dirichlet-free subspace; without one (periodic / pure-Neumann
        problems) the coarse matrix is regularized by a relative 1e-10
        diagonal shift (the outer CG's projector owns the nullspace).

        node_order [num_dofs]: when the outer solve runs in a PERMUTED
        dof ordering (the routed SpMV's internal RCB/first-touch order,
        ``RoutedEBE.order``), pass it so the fine-side transfer indices
        and smoother blocks follow; the coarse side is order-free.
        ``apply_A`` overrides the fine operator used by the
        multiplicative cycle (e.g. the routed kernel in its own order)."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from . import precond as pc

        mesh = sim.mesh
        d = sim.dim
        ND = sim.num_dofs
        dof_map = np.asarray(sim.dof_map)

        # endpoint vertices per node -> per dof (via a representative node;
        # periodic identification maps edges consistently so any
        # representative gives the same coarse couple)
        ep = p2_vertex_endpoints(mesh)
        first = np.zeros(ND, np.int64)
        uniq_dofs, firsts = np.unique(dof_map, return_index=True)
        first[uniq_dofs] = firsts
        epd = ep[first]                                  # [ND, 2] vertices
        # coarse space: unique dofs carried by vertices
        vdofs = dof_map[np.asarray(mesh.vertex_nodes)]
        cuniq, cidx = np.unique(vdofs, return_inverse=True)
        NC = len(cuniq)
        cA = cidx[epd[:, 0]]
        cB = cidx[epd[:, 1]]

        # Galerkin coarse matrix on the host (exact, material-agnostic)
        A2 = sim.to_scipy().tocsr()
        rows = np.repeat(np.arange(ND * d), 2)
        cols = np.stack([cA[:, None] * d + np.arange(d),
                         cB[:, None] * d + np.arange(d)],
                        axis=-1).reshape(-1)
        vals = np.full(2 * ND * d, 0.5)
        P = sp.coo_matrix((vals, (rows, cols)),
                          shape=(ND * d, NC * d)).tocsr()
        Ac = (P.T @ A2 @ P).tocsc()
        if free_mask is not None:
            m = np.asarray(free_mask, np.float64).reshape(ND, d)[
                cuniq].reshape(-1)
            M = sp.diags(m)
            Ac = (M @ Ac @ M + sp.diags(1.0 - m)).tocsc()
        else:
            shift = 1e-10 * float(Ac.diagonal().mean())
            Ac = (Ac + shift * sp.eye(NC * d)).tocsc()
        lu = spla.splu(Ac)

        def lu_solve(r):
            shp = np.asarray(r).shape
            flat = np.asarray(r, np.float64).reshape(NC * d, -1)
            out = lu.solve(flat)
            return out.reshape(shp).astype(np.asarray(r).dtype)

        blocks = pc.node_block_diagonal(sim.Ke, sim.elem_dofs, ND, d)
        fm = None if free_mask is None else jnp.asarray(free_mask)
        if node_order is not None:
            order = np.asarray(node_order)
            cA = cA[order]
            cB = cB[order]
            blocks = blocks[jnp.asarray(order)]
            if fm is not None:
                fm = fm[jnp.asarray(order)]
        smoother = pc.block_jacobi_apply(pc.block_jacobi_inv(blocks, fm))
        if mode != "multiplicative":
            apply_A = None
        elif apply_A is None:
            if node_order is not None:
                raise ValueError(
                    "multiplicative + node_order needs an apply_A in the "
                    "permuted ordering")
            apply_A = sim.apply_K
        if mode == "multiplicative":
            # the multiplicative cycle needs a CONTRACTIVE smoother
            # (rho(I - S A) < 1); damp block Jacobi by 1/lam_max(S A)
            proj = project or (lambda v: v)
            Ap = lambda v: proj(apply_A(v))
            Sp = lambda r: proj(smoother(r))
            # estimate in the operator's own dtype (the routed kernel is
            # f32; probing it with f64 vectors skews the bound)
            est_dt = sim.Ke.dtype if node_order is None else jnp.float32
            lam = pc.estimate_lambda_max(Ap, Sp, (ND, d),
                                         dtype=est_dt, iters=25)
            base = smoother
            smoother = lambda r: base(r) * (1.0 / lam)
        return cls(cA, cB, NC, lu_solve, smoother, mode, apply_A, project)

    # -- device-side pieces ---------------------------------------------
    def prolong(self, uc):
        """[NC, d(, m)] -> [ND, d(, m)]."""
        return 0.5 * (uc[self.cA] + uc[self.cB])

    def restrict(self, r):
        """Adjoint of :meth:`prolong`."""
        half = 0.5 * r
        return (jax.ops.segment_sum(half, self.cA,
                                    num_segments=self.n_coarse)
                + jax.ops.segment_sum(half, self.cB,
                                      num_segments=self.n_coarse))

    def coarse_solve(self, rc):
        return jax.pure_callback(
            self._lu_solve, jax.ShapeDtypeStruct(rc.shape, rc.dtype), rc,
            vmap_method="sequential")

    def M_inv(self, r):
        """The preconditioner application (linear, symmetric)."""
        proj = self.project
        if self.mode == "additive":
            xc = self.coarse_solve(self.restrict(r))
            return proj(self.smoother(r) + self.prolong(xc))
        x = proj(self.smoother(r))
        res = r - proj(self.apply_A(x))
        xc = self.coarse_solve(self.restrict(res))
        x = x + proj(self.prolong(xc))
        return x + proj(self.smoother(r - proj(self.apply_A(x))))
