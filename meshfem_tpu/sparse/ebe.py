"""Element-by-element operator with precomputed gather-pyramid scatter.

The production apply path: A u = pyramid_scatter(Ke @ gather(u)).  All
irregular memory traffic is flat gathers (measured ~2-4 ns/row on v5e,
width-independent), so multi-RHS applies amortize it — block solves are
nearly free relative to single vectors.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .scatter import ScatterPlan


@jax.jit
def _ebe_apply(kernel, u):
    """Jitted apply: eager per-op dispatch would materialize the fused
    multiply-reduce's [E, nd, nd] temp (1.9 GB f64 at bench scale); under
    jit XLA fuses it away.  Inside caller jits this inlines."""
    return kernel._apply_impl(u)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EBEKernel:
    """Symmetric EBE operator for scalar (d=1) or vector DOFs.

    Ke: [E, n*d, n*d]; elem_dofs: [E, n]; apply handles u of shape
    [Nd] / [Nd, d] / [Nd, d, m] (multi-RHS)."""

    Ke: jnp.ndarray
    elem_dofs: jnp.ndarray
    num_dofs: int
    vector_dim: int
    plan: ScatterPlan

    @classmethod
    def build(cls, Ke, elem_dofs, num_dofs: int, vector_dim: int = 1,
              precision=None) -> "EBEKernel":
        elem_dofs = jnp.asarray(elem_dofs)
        plan = ScatterPlan.build(np.asarray(elem_dofs).reshape(-1), num_dofs)
        k = cls(jnp.asarray(Ke), elem_dofs, num_dofs, vector_dim, plan)
        k.precision = precision
        return k

    def _contract(self, ue_flat):
        """fe[e, i] = Ke[e, i, j] ue[e, j].

        f64 goes through a fused multiply-reduce instead of einsum: the
        einsum lowers to a batched dot whose 30-wide contraction pads to
        128 lanes — on the f64-EMULATED TPU path that materializes ~4.3x
        the 1.9 GB Ke per operand copy (measured: 19.65 G HBM for one
        eager apply at 280k P2 tets — a guaranteed OOM).  The
        multiply-reduce fuses under jit (no [E, nd, nd] temp) and the
        f64 role is accuracy, not throughput."""
        if self.Ke.dtype == jnp.float64:
            return jnp.sum(self.Ke * ue_flat[:, None, :], axis=-1)
        return jnp.einsum("eij,ej->ei", self.Ke, ue_flat,
                          precision=getattr(self, "precision", None))

    def _contract_multi(self, ue, m):
        if self.Ke.dtype == jnp.float64 and m <= 8:
            return jnp.sum(self.Ke[:, :, :, None]
                           * ue[:, None, :, :], axis=2)
        return jnp.einsum("eij,ejm->eim", self.Ke, ue,
                          precision=getattr(self, "precision", None))

    def __call__(self, u):
        return _ebe_apply(self, u)

    def _apply_impl(self, u):
        E, nd, _ = self.Ke.shape
        n = self.elem_dofs.shape[1]
        d = self.vector_dim
        multi = u.ndim == (3 if d > 1 else 2)
        if d == 1:
            ue = u[self.elem_dofs]                      # [E, n] or [E, n, m]
            if not multi:
                fe = self._contract(ue)
                return self.plan(fe.reshape(E * n))
            m = u.shape[-1]
            fe = self._contract_multi(ue, m)
            return self.plan(fe.reshape(E * n, m))
        ue = u[self.elem_dofs]                          # [E, n, d(, m)]
        if not multi:
            fe = self._contract(ue.reshape(E, nd))
            return self.plan(fe.reshape(E * n, d))
        m = u.shape[-1]
        ue = ue.reshape(E, nd, m)
        fe = self._contract_multi(ue, m)
        return self.plan(
            fe.reshape(E, n, d, m).reshape(E * n, d * m)).reshape(
                self.num_dofs, d, m)

    def diagonal(self):
        E, nd, _ = self.Ke.shape
        n = self.elem_dofs.shape[1]
        d = self.vector_dim
        de = jnp.diagonal(self.Ke, axis1=1, axis2=2)
        if d == 1:
            return self.plan(de.reshape(E * n))
        return self.plan(de.reshape(E * n, d))

    def tree_flatten(self):
        return ((self.Ke, self.elem_dofs, self.plan),
                (self.num_dofs, self.vector_dim,
                 getattr(self, "precision", None)))

    @classmethod
    def tree_unflatten(cls, aux, children):
        k = cls(children[0], children[1], aux[0], aux[1], children[2])
        k.precision = aux[2]
        return k
