"""Deterministic scatter-add as a pyramid of flat gathers.

XLA:TPU scatter-add costs ~6 ns/row and gathers ~2 ns/row, both independent
of row width (measured on v5e).  ``segment_sum`` over element-node
contributions is therefore the bottleneck of every FEM apply.  This module
replaces it with a precomputed two-level reduction that uses only *flat*
gathers and aligned reshape-sums:

  1. contributions are permuted into node-sorted order, each node's run
     padded to a multiple of G1 (gather #1, ~1.2 R rows);
  2. groups of G1 are summed with a dense reshape-sum (VPU);
  3. each node's group-partials are padded to exactly G2 slots
     (gather #2, ~R/G1 rows) and reshape-summed to the final [N, w] result.

No scatter instruction is ever emitted; the result is bit-for-bit
deterministic (fixed summation order), replacing the reference's thread-local
accumulation (``ParallelAssembly.hh:42-100``).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ScatterPlan:
    """Precomputed plan to sum R contribution rows into N segment rows.

    Registered as a pytree (index arrays are leaves) so plans pass through
    jit boundaries as ARGUMENTS — closing over them would bake multi-MB
    constants into every compiled executable."""

    num_rows: int           # R: number of input contribution rows
    num_segments: int       # N
    g1: int
    g2: int
    gidx1: jnp.ndarray      # [P1] flat gather indices into [R (+1 dummy)]
    gidx2: jnp.ndarray      # [N * g2] flat gather indices into [P1/g1 (+1)]

    @classmethod
    def build(cls, ids, num_segments: int, g1: int = 8) -> "ScatterPlan":
        ids = np.asarray(ids).reshape(-1)
        R = len(ids)
        from ..native import build_scatter_plan as native_plan

        nat = native_plan(ids, num_segments, g1)
        if nat is not None:
            gidx1, gidx2, g2 = nat
            return cls(R, num_segments, g1, g2,
                       jnp.asarray(gidx1), jnp.asarray(gidx2))
        order = np.argsort(ids, kind="stable")
        counts = np.bincount(ids, minlength=num_segments)
        # Level 1: pad each segment's run to a multiple of g1.
        padded = ((counts + g1 - 1) // g1) * g1
        offs_p = np.concatenate([[0], np.cumsum(padded)])
        P1 = int(offs_p[-1])
        gidx1 = np.full(P1, R, dtype=np.int32)          # R = dummy zero row
        offs = np.concatenate([[0], np.cumsum(counts)])
        sorted_ids = ids[order]
        rank = np.arange(R) - offs[sorted_ids]
        gidx1[offs_p[sorted_ids] + rank] = order
        # Level 2: each segment occupies padded[v] / g1 groups, contiguous.
        ngroups = padded // g1
        g2 = max(int(ngroups.max()), 1)
        goffs = np.concatenate([[0], np.cumsum(ngroups)])
        NG = int(goffs[-1])
        gidx2 = np.full(num_segments * g2, NG, dtype=np.int32)  # NG = dummy
        for_rows = np.repeat(np.arange(num_segments), ngroups)
        within = np.arange(NG) - goffs[for_rows]
        gidx2[for_rows * g2 + within] = np.arange(NG)
        return cls(R, num_segments, g1, g2,
                   jnp.asarray(gidx1), jnp.asarray(gidx2))

    def __call__(self, rows):
        """rows: [R, w] (or [R]) -> [N, w] segment sums."""
        squeeze = rows.ndim == 1
        if squeeze:
            rows = rows[:, None]
        w = rows.shape[1]
        zero = jnp.zeros((1, w), dtype=rows.dtype)
        s = jnp.concatenate([rows, zero])[self.gidx1]        # [P1, w]
        partial = s.reshape(-1, self.g1, w).sum(axis=1)      # [NG, w]
        s2 = jnp.concatenate([partial, zero])[self.gidx2]    # [N*g2, w]
        out = s2.reshape(self.num_segments, self.g2, w).sum(axis=1)
        return out[:, 0] if squeeze else out

    def tree_flatten(self):
        return (self.gidx1, self.gidx2), (self.num_rows, self.num_segments,
                                          self.g1, self.g2)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], aux[3], children[0], children[1])


def plan_for(ids, num_segments: int, g1: int = 8) -> ScatterPlan:
    """Content-keyed cached ScatterPlan.  Keyed on a cryptographic digest of
    the id bytes (not Python's 64-bit hash): a hash collision between two
    different id arrays would silently reuse the wrong gather plan."""
    import hashlib

    ids = np.ascontiguousarray(np.asarray(ids).reshape(-1))
    key = (hashlib.sha1(ids.tobytes()).hexdigest(), ids.size, num_segments,
           g1)
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = ScatterPlan.build(ids, num_segments, g1)
        _PLAN_CACHE[key] = plan
    return plan


_PLAN_CACHE: dict = {}
