"""Field sampling at arbitrary points — closest-element queries.

Parity with reference ``FieldSampler.hh`` (libigl AABB-backed closest
element + barycentric evaluation) and ``FieldSamplerMatrix.hh`` (sampling as
a sparse operator).  The acceleration structure is a host-side uniform
bucket grid (the reference's ``CollisionGrid`` idea) over element bounding
boxes; evaluation is a vectorized gather + shape-function contraction on
device."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..fem import shape_functions as sf


class FieldSampler:
    def __init__(self, mesh: FEMMesh, grid_res: int | None = None):
        self.mesh = mesh
        V, F = mesh.V, mesh.F
        self.K = mesh.K
        E = len(F)
        if grid_res is None:
            grid_res = max(1, int(np.ceil(E ** (1.0 / mesh.dim))))
        bb = mesh.bbox()
        self.lo = bb.min - 1e-12
        self.h = (bb.dimensions + 2e-12) / grid_res
        self.res = grid_res
        # Bucket elements by the cells their bbox overlaps.
        Xe = V[F]
        lo_cell = np.floor((Xe.min(axis=1) - self.lo) / self.h).astype(int)
        hi_cell = np.floor((Xe.max(axis=1) - self.lo) / self.h).astype(int)
        lo_cell = np.clip(lo_cell, 0, grid_res - 1)
        hi_cell = np.clip(hi_cell, 0, grid_res - 1)
        from collections import defaultdict

        buckets = defaultdict(list)
        for e in range(E):
            rng = [range(lo_cell[e, d], hi_cell[e, d] + 1)
                   for d in range(mesh.dim)]
            import itertools

            for cell in itertools.product(*rng):
                buckets[cell].append(e)
        self.buckets = {k: np.asarray(v) for k, v in buckets.items()}

    def _candidates(self, p):
        cell = tuple(np.clip(np.floor((p - self.lo) / self.h).astype(int),
                             0, self.res - 1))
        cand = self.buckets.get(cell)
        if cand is None or len(cand) == 0:
            return np.arange(len(self.mesh.F))
        return cand

    def locate(self, points):
        """For each query point: (element index, barycentric coords [K+1]).
        Points outside the mesh snap to the closest candidate element
        (clamped barycentric coordinates)."""
        mesh = self.mesh
        V, F = mesh.V, mesh.F
        pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
        elems = np.empty(len(pts), dtype=np.int64)
        barys = np.empty((len(pts), mesh.K + 1))
        for i, p in enumerate(pts):
            cand = self._candidates(p)
            X = V[F[cand]]
            lam = self._barycentric(X, p)
            clamped = np.clip(lam, 0.0, None)
            clamped /= clamped.sum(axis=1, keepdims=True)
            proj = np.einsum("ek,ekd->ed", clamped, X)
            d2 = ((proj - p) ** 2).sum(axis=1)
            # prefer true containment
            inside = (lam >= -1e-10).all(axis=1)
            d2 = np.where(inside, -1.0, d2)
            best = int(np.argmin(d2))
            elems[i] = cand[best]
            barys[i] = clamped[best] if not inside[best] else lam[best]
        return elems, barys

    @staticmethod
    def _barycentric(X, p):
        """[e, K+1, dim] corners, point p -> [e, K+1] barycentric coords."""
        K = X.shape[1] - 1
        A = np.swapaxes(X[:, 1:] - X[:, :1], 1, 2)       # [e, dim, K]
        rhs = (p - X[:, 0])                              # [e, dim]
        AtA = np.einsum("edk,edl->ekl", A, A)
        Atb = np.einsum("edk,ed->ek", A, rhs)
        lam_rest = np.linalg.solve(AtA, Atb[..., None])[..., 0]
        lam0 = 1.0 - lam_rest.sum(axis=1, keepdims=True)
        return np.concatenate([lam0, lam_rest], axis=1)

    def sample_nodal(self, field, points):
        """Sample a nodal field [N(, c)] at query points."""
        elems, barys = self.locate(points)
        phi = sf.eval_shape_np(self.mesh.K, self.mesh.degree, barys)  # [q, n]
        vals = np.asarray(field)[self.mesh.elem_nodes[elems]]         # [q,n(,c)]
        return np.einsum("qn,qn...->q...", phi, vals)

    def sample_element(self, field, points):
        """Sample a per-element field at query points."""
        elems, _ = self.locate(points)
        return np.asarray(field)[elems]

    def sample_matrix(self, points):
        """Sampling as a scipy sparse matrix [n_pts, N]
        (``FieldSamplerMatrix.hh``)."""
        import scipy.sparse as sp

        elems, barys = self.locate(points)
        phi = sf.eval_shape_np(self.mesh.K, self.mesh.degree, barys)
        nodes = self.mesh.elem_nodes[elems]
        rows = np.repeat(np.arange(len(elems)), nodes.shape[1])
        return sp.coo_matrix(
            (phi.ravel(), (rows, nodes.ravel())),
            shape=(len(elems), self.mesh.num_nodes)).tocsr()
