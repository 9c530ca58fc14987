"""Per-shard ROUTED SpMV for the domain-decomposed solve.

``parallel/domain.py``'s shard-local operator is gather -> einsum ->
segment_sum — the 18-it/s-class apply the single-device path left behind.
This module puts the routed in-register kernels INSIDE the shard_map
shards: every shard gets the same plan STRUCTURE (bucket chains, step
counts, fix-up lengths — forced via ``plan_copy(force_structure=...)``),
so the stacked plans are one SPMD program and shard_map just slices the
per-shard index leaves.

Pipeline per shard (local vector x [Nl + H] rows per component plane):
  gather (planes-mode routed copy) -> lane-major dense-KeB contraction ->
  slab rung (routed copy + sublane fold) -> final segment_sum to local
  rows.  The final rung is ~1/4 of the slot volume; its XLA scatter-add
  is retained for now (unbounded fan-in needs the reduce kernel, whose
  forced-structure variant is future work).

Reference analog: none — the reference is single-process
(``Parallelism.hh``); this is the TPU-native scale-out of its TBB
assembly loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..sparse.route import plan_copy, copy_plan_structure
from ..sparse.routed_ebe import (_scatter_ladder, _stage_gather_ids,
                                 _sum_plan, SumPlan)


def _shard_plans(eds, NlH, d, cap=4):
    """Per-shard routed plans with UNION-forced structure.

    eds: list of [Ep_s, n] local element->row maps (-1 padding rows),
    all padded to the same Ep; NlH = local rows per shard (owned + halo).
    Returns (gathers, rung_gs, rung_srcs, last_ids, n1, sizes) with every
    per-shard plan structurally identical."""
    S = len(eds)
    Ep, n = eds[0].shape
    Eb = Ep // 128
    assert all(e.shape == (Ep, n) for e in eds)

    # pass 1: natural plans per shard
    g_plans, ladders = [], []
    for ed in eds:
        ed_bal = ed.reshape(Eb, 128, n).transpose(0, 2, 1)
        g_plans.append(plan_copy(ed_bal.reshape(-1), NlH, planes=d))
        ladders.append(_scatter_ladder(ed, Eb, n, NlH, cap=cap, group=Eb))
    n1_max = max(l[1][0][1] for l in ladders)
    n1_max = -(-n1_max // 128) * 128

    # rung-1 slab sources (padded to n1_max ids) per shard
    S0p = Eb * n * 128
    e_idx = np.repeat(np.arange(Ep, dtype=np.int64), n)
    a_idx = np.tile(np.arange(n, dtype=np.int64), Ep)
    pos_plane = ((e_idx // 128) * n + a_idx) * 128 + (e_idx % 128)
    rung_srcs, last_ids = [], []
    for ed, (dst0, stages) in zip(eds, ladders):
        n1 = stages[0][1]
        G0 = _stage_gather_ids(dst0, n1, cap)           # [cap, n1]
        src0 = np.where(G0 >= 0, pos_plane[np.maximum(G0, 0)],
                        np.int64(-1))
        pad = np.full((cap, n1_max - n1), -1, np.int64)
        rung_srcs.append(np.concatenate([src0, pad], axis=1))
        # final map: level-1 id -> local row (-1 on padding ids)
        node1 = np.full(n1_max, -1, np.int64)
        node1[:n1] = stages[1][0]                       # Eb <= group path
        last_ids.append(node1)

    # pass 2: force the union structure
    gs = copy_plan_structure(g_plans)
    g_forced = []
    for ed in eds:
        ed_bal = ed.reshape(Eb, 128, n).transpose(0, 2, 1)
        g_forced.append(plan_copy(ed_bal.reshape(-1), NlH, planes=d,
                                  force_structure=gs))
    r_plans = [_sum_plan(src, S0p, d, cap) for src in rung_srcs]
    rs = copy_plan_structure([p.plan for p in r_plans])
    r_forced = [SumPlan(plan_copy(
        np.transpose(src.reshape(cap, n1_max // 128, 128),
                     (1, 0, 2)).reshape(-1),
        S0p, planes=d, force_structure=rs), cap) for src in rung_srcs]
    return g_forced, r_forced, np.stack(last_ids), n1_max


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RoutedShardSpMV:
    """Stacked per-shard routed apply (leaves carry a leading [S] axis;
    shard_map slices them; :meth:`local` runs ONE shard's apply)."""

    gather: object            # CopyPlan, stacked leaves
    rung1: object             # SumPlan, stacked leaves
    last_ids: jnp.ndarray     # [S, n1] local row of each rung-1 id (-1 pad)
    KeB: jnp.ndarray          # [S, Eb, n, d, n, d, 128]
    NlH: int
    d: int
    interpret: bool = True

    @classmethod
    def build(cls, Kes, locs, Nl: int, H: int, d: int,
              interpret: bool = True) -> "RoutedShardSpMV":
        """Kes: [S, Ep, nd, nd] (zero rows on padding elements);
        locs: [S, Ep, n] local rows (-1 on padding elements)."""
        Kes = np.asarray(Kes, np.float32)
        locs = np.asarray(locs, np.int64)
        S, Ep, n = locs.shape
        Eb = -(-Ep // 128)
        if Eb * 128 != Ep:
            pad = Eb * 128 - Ep
            locs = np.concatenate(
                [locs, np.full((S, pad, n), -1, np.int64)], axis=1)
            Kes = np.concatenate(
                [Kes, np.zeros((S, pad) + Kes.shape[2:], np.float32)],
                axis=1)
            Ep = Eb * 128
        NlH = Nl + H
        gathers, rungs, last_ids, n1 = _shard_plans(
            [locs[s] for s in range(S)], NlH, d)
        stack = lambda plans: jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *plans)
        KeB = jnp.asarray(np.transpose(
            Kes.reshape(S, Eb, 128, n, d, n, d), (0, 1, 3, 4, 5, 6, 2)))
        return cls(stack(gathers), stack(rungs),
                   jnp.asarray(last_ids, jnp.int32), KeB, NlH, d,
                   interpret)

    def local(self, s_gather, s_rung1, s_last, s_KeB, x):
        """One shard's apply: x [NlH, d] -> A_local @ x [NlH, d] (halo
        rows receive partial values — callers slice [:Nl]).  The s_*
        arguments are the shard-sliced plan pytrees / arrays."""
        Eb, n = s_KeB.shape[0], s_KeB.shape[1]
        d = self.d
        src = x.reshape(self.NlH, d).T                   # [d, NlH]
        ue = s_gather(src, interpret=self.interpret) \
            .reshape(d, Eb, n, 128)
        fe = jnp.einsum("eACacl,ceal->CeAl", s_KeB, ue)
        y1 = s_rung1(fe.reshape(d, -1), interpret=self.interpret)
        # final rung: rung-1 ids -> local rows (XLA scatter-add; -1 pads
        # drop via an overflow segment)
        ids = jnp.where(s_last >= 0, s_last, self.NlH)
        out = jax.vmap(lambda yp: jax.ops.segment_sum(
            yp, ids, num_segments=self.NlH + 1))(y1)     # [d, NlH+1]
        return out[:, : self.NlH].T                      # [NlH, d]

    def tree_flatten(self):
        return ((self.gather, self.rung1, self.last_ids, self.KeB),
                (self.NlH, self.d, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, *aux)
