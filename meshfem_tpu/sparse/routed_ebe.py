"""Routed element-by-element operator: the fast general-mesh SpMV.

``A u = scatter(Ke @ gather(u))`` with both irregular stages executed by
the in-register lane-routing kernels of :mod:`meshfem_tpu.sparse.route`
instead of XLA's row gathers, and the element contraction laid out
lane-major so no operand is ever relaid out on the hot path:

  * routing runs per vector COMPONENT in **node space** — source windows
    are 128 nodes, not 128 dofs, which cuts each route's window spread 3x
    (the binding constraint: kernel cost is linear in chain depth), and
    one routing plan serves all ``d`` components;
  * gather slots live in ``[Eb, n, 128]`` order (Eb = ceil(E/128) element
    blocks, n nodes per element, lane = element within block), so the
    per-element stiffness contraction is a pure VPU multiply-reduce over
    ``Ke`` stored ``[Eb, n*d, n*d, 128]`` — the element index rides the
    128 vector lanes and every array is lane-aligned;
  * the transpose scatter reads element-major slots (``[Ep * n]`` flat,
    elements Morton-sorted), so one 128-node output window's sources are
    the slots of its ~2-300 incident elements — a handful of source
    windows — and sums them in a layered, lane-packed deterministic
    reduction (fixed order, no scatter instruction).

Requires a locality-preserving node numbering
(``FEMMesh(..., node_order="morton")`` + Morton-sorted elements,
``mesh.reorder.reorder_mesh``): chain depth tracks the windowed spread of
each element block's node ids.

This replaces CHOLMOD's factorize/solve role for large general meshes
(reference ``SparseMatrices.hh:1984-2296``) with a matvec fast enough to
iterate, vs 55 ms/apply for the gather-pyramid EBE path and >= 12.5x
fill-in for any assembled block format (experiments/fill_probe.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .route import plan_copy, plan_reduce, CopyPlan, ReducePlan


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RoutedEBE:
    """Symmetric routed EBE operator for scalar or vector dofs.

    Same contract as :class:`meshfem_tpu.sparse.ebe.EBEKernel` for
    single-vector applies: u of shape [N] (d == 1) or [N, d].  f32 only —
    the routing kernels are f32; for f64 use EBEKernel."""

    KeB: jnp.ndarray            # [Eb, nd, nd, 128] f32
    gather: CopyPlan            # node plane [N] -> slots [Eb * n * 128]
    scatter: ReducePlan         # element-major slots [Ep * n] -> partials
    scatter2: ReducePlan | None  # block-compact partials -> [N]
    num_dofs: int               # nodes
    vector_dim: int
    interpret: bool

    @classmethod
    def build(cls, Ke, elem_dofs, num_dofs: int, vector_dim: int = 1,
              interpret: bool | None = None,
              two_level: bool | None = None) -> "RoutedEBE":
        """Ke: [E, nd, nd] (node-major dof order: a = node * d + comp);
        elem_dofs: [E, n] node ids; num_dofs = number of NODES.

        ``two_level`` (default: on for E >= 4096): scatter in two routed
        stages.  A one-stage reduce routes element-major slots straight to
        node windows — each 128-node window pulls from the ~n slot-windows
        of EVERY incident element block, so chains saturate the bucket
        ladder (measured: all buckets at chain 48 on the 257k-tet bench).
        Stage 1 instead pre-reduces each element block's slots onto its own
        sorted unique nodes (sources = the block's own n slot-windows:
        chain <= ~n, perfectly local); stage 2 reduces the block-compact
        partials onto global nodes (each node appears in the few blocks
        that touch it: chain ~ 2-4)."""
        Ke = np.asarray(Ke, np.float32)
        elem_dofs = np.asarray(elem_dofs)
        E, nd, _ = Ke.shape
        n = elem_dofs.shape[1]
        d = vector_dim
        assert nd == n * d
        Eb = -(-E // 128)
        Ep = Eb * 128
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if two_level is None:
            two_level = E >= 4096

        ed = np.full((Ep, n), -1, np.int64)
        ed[:E] = elem_dofs
        # gather: slot (b, a, l) <- node ed[128 b + l, a]   [Eb, n, 128]
        gsrc = ed.reshape(Eb, 128, n).transpose(0, 2, 1).reshape(-1)
        gather = plan_copy(gsrc, num_dofs)
        if two_level:
            # stage 1: element-major slot e*n + a -> block-compact node id
            # (block-major, node-sorted within block: stage-2 locality
            # follows the node ordering)
            flat = ed.reshape(-1)
            blk_of_slot = (np.arange(Ep * n) // (128 * n)).astype(np.int64)
            valid = flat >= 0
            key = np.where(valid, blk_of_slot * np.int64(num_dofs) + flat,
                           -1)
            uniq, inv = np.unique(key[valid], return_inverse=True)
            dst1 = np.full(Ep * n, -1, np.int64)
            dst1[valid] = inv
            scatter = plan_reduce(dst1, len(uniq), Ep * n)
            scatter2 = plan_reduce(uniq % np.int64(num_dofs), num_dofs,
                                   len(uniq))
        else:
            # scatter: element-major slot e * n + a -> node ed[e, a]
            scatter = plan_reduce(ed.reshape(-1), num_dofs, Ep * n)
            scatter2 = None

        KeB = np.zeros((Ep, nd, nd), np.float32)
        KeB[:E] = Ke
        KeB = np.ascontiguousarray(
            KeB.reshape(Eb, 128, nd, nd).transpose(0, 2, 3, 1))
        return cls(jnp.asarray(KeB), gather, scatter, scatter2, num_dofs,
                   d, interpret)

    def _contract(self, ue):
        """[Eb, nd, 128] element values -> element forces (VPU only)."""
        return jnp.sum(self.KeB * ue[:, None, :, :], axis=2)

    def _scatter(self, fl):
        y = self.scatter(fl, interpret=self.interpret)
        if self.scatter2 is not None:
            y = self.scatter2(y, interpret=self.interpret)
        return y

    def __call__(self, u):
        Eb, nd = self.KeB.shape[0], self.KeB.shape[1]
        d = self.vector_dim
        n = nd // d
        u = u.astype(jnp.float32)
        if d == 1:
            us = self.gather(u.reshape(-1), interpret=self.interpret)
            ue = us.reshape(Eb, n, 128)
            fe = self._contract(ue)
            fl = fe.reshape(Eb, n, 128).transpose(0, 2, 1).reshape(-1)
            return self._scatter(fl).reshape(u.shape)
        comps = [self.gather(u[:, c], interpret=self.interpret)
                 .reshape(Eb, n, 128) for c in range(d)]
        ue = jnp.stack(comps, axis=2).reshape(Eb, nd, 128)
        fe = self._contract(ue).reshape(Eb, n, d, 128)
        ys = [self._scatter(fe[:, :, c, :].transpose(0, 2, 1).reshape(-1))
              for c in range(d)]
        return jnp.stack(ys, axis=1).reshape(u.shape)

    def diagonal(self):
        """Assembled operator diagonal (Jacobi), via the scatter plan."""
        de = jnp.diagonal(self.KeB, axis1=1, axis2=2)     # [Eb, 128, nd]
        d = self.vector_dim
        n = de.shape[2] // d
        de = de.reshape(de.shape[0], 128, n, d)
        ys = [self._scatter(de[:, :, :, c].reshape(-1)) for c in range(d)]
        out = jnp.stack(ys, axis=1)
        if d == 1:
            return out.reshape(self.num_dofs)
        return out.reshape(self.num_dofs, d)

    def tree_flatten(self):
        return ((self.KeB, self.gather, self.scatter, self.scatter2),
                (self.num_dofs, self.vector_dim, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[2], ch[3], aux[0], aux[1], aux[2])
