"""Routed element-by-element operator: the fast general-mesh SpMV.

``A u = scatter(Ke @ gather(u))`` with both irregular stages executed by
the in-register lane-routing kernels of :mod:`meshfem_tpu.sparse.route`
instead of XLA's row gathers, and the element contraction laid out
lane-major so no operand is ever relaid out on the hot path:

  * ALL vector components (and, with ``block_rhs``, all m RHS columns)
    route through ONE index stream in PLANES MODE
    (``route._route_vreg_planes``): the routing problem is built on
    plane-local ids and each chain step routes every stacked value
    plane, so the index decode and pidx traffic amortize d- (or
    d*m-) fold.  Slots are laid out COMPONENT-OUTERMOST
    ``[d, Eb, n, 128]`` (Eb = ceil(E/128) element blocks, lane = element
    within block); the contraction einsum absorbs the layout via a
    permuted ``Ke`` ``[Eb, n, d, n, d, 128]``.  Measured at 1.17M DOF
    (v5e): chain-steps 663k -> 204k, apply 5.97 -> 5.3 ms — the routing
    is data-op bound, so the index amortization mostly removes glue;
  * the per-element stiffness contraction is a pure VPU multiply-reduce
    over ``Ke`` stored lane-major — at P2/3D it streams KeB at ~926 GB/s
    (HBM peak, 1.08 ms at bench scale) and is also ARITHMETIC-minimal
    (1.8 KFLOP/element vs the factored form's ~8-40 KFLOP), so dense
    KeB is the default; the factored isotropic backend (69x less
    element data) exists for memory-limited problem sizes;
  * the transpose scatter runs as a routed LADDER (``two_level``):
    slots -> per-block compact ids -> per-8-block-group compact ids ->
    global nodes, with OVERFLOW SPLITTING at each rung (every compact id
    receives at most ``cap`` = 4 contributions; average level-1 fan-in
    is ~2.6, so cap-8 slabs ran 32% full and routed 3.1x the slot count
    in zeros).  Locality: a rung's output window pulls only from its own
    block's / group's windows, so chains stay small.  Fan-in-capped
    rungs run as SLAB-SUM COPY plans (:class:`SumPlan`): contributions
    ride the sublanes and XLA folds them — streaming stores instead of
    the reduce kernel's serializing dynamic-row read-modify-writes
    (measured 2.93 ms vs ~copy rate).  Only the final rung (unbounded
    fan-in) uses the reduce kernel, on ~1/4 of the slot count.
    (A TILE-CHAIN variant — 8-row tile gathers with sublane = row%8
    packing, ``MESHFEM_TILE_RUNGS=1`` — collapses rung chains to 1-3
    but conflict-stacking inflates routed volume ~6x: measured 17.6 ms
    apply vs 5.3; kept for structure experiments only.)

Requires a locality-preserving node numbering
(``FEMMesh(..., node_order="firsttouch")`` over spatially sorted elements,
``mesh.reorder.reorder_mesh``): chain depth tracks the windowed spread of
each element block's node ids.

This replaces CHOLMOD's factorize/solve role for large general meshes
(reference ``SparseMatrices.hh:1984-2296``) with a matvec fast enough to
iterate, vs 55 ms/apply for the gather-pyramid EBE path and >= 12.5x
fill-in for any assembled block format (experiments/fill_probe.py).
"""

from __future__ import annotations

import dataclasses
import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from .route import (plan_copy, plan_copy_cells, plan_reduce, CopyPlan,
                    ReducePlan)

# plans depend only on connectivity (elem_dofs, N, d, two_level) — cache
# them so re-assembly with new material values (material optimization,
# Newton steps) skips the ~40 s host routing compile
_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SumPlan:
    """A <=cap-fan-in reduce rung as COPY-plan + sublane sum.

    The inner :class:`~meshfem_tpu.sparse.route.CopyPlan` routes slabs
    ``[window, cap, 128]`` — its up-to-``cap`` contributions on the
    sublanes — and the sum folds them to the ``[window, 128]`` output.
    Each slab slot holds at most ONE contribution (fan-in is capped by
    ``_split_compact``), so the copy plan's set-style XLA fix-up stays
    correct and the summation order is fixed (deterministic).  The plan
    runs in PLANES mode: the d component planes (and multi-RHS columns)
    share one index stream."""

    plan: CopyPlan
    cap: int = 8

    @property
    def n_out(self):
        return self.plan.n_out // self.cap

    @property
    def buckets(self):
        return self.plan.buckets

    def __call__(self, src, *, interpret=False):
        """src [planes, plane_len] -> [planes, n_out]."""
        y = self.plan(src, interpret=interpret)
        if self.plan.planes == 1:
            return y.reshape(-1, self.cap, 128).sum(axis=1).reshape(-1)
        return y.reshape(self.plan.planes, -1, self.cap, 128) \
            .sum(axis=2).reshape(self.plan.planes, -1)

    def tree_flatten(self):
        return (self.plan,), (self.cap,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)


def _sum_plan(G_src, plane_len, d, cap=8, blk_rows=None):
    """Build a :class:`SumPlan` from gather planes ``G_src [cap, n_ids]``
    (source position of each id's k-th contribution in a per-component
    plane of ``plane_len``, -1 when absent; n_ids a multiple of 128).
    The d component planes share the plan (planes mode)."""
    n_ids = G_src.shape[1]
    NW = n_ids // 128
    assert NW * 128 == n_ids
    slab = np.transpose(G_src.reshape(cap, NW, 128), (1, 0, 2))
    return SumPlan(plan_copy(slab.reshape(-1), plane_len, planes=d,
                             blk_rows=blk_rows), cap)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SumPlanTiles:
    """A reduce rung as TILE-CHAIN copy + sublane fold + slab segment-sum.

    Contributions are packed into slab vregs at cell
    (sublane = source row % 8, lane = id % 128); one
    :func:`~meshfem_tpu.sparse.route._route_vreg_tiles` chain step serves
    8 source rows, so rung chains collapse to the source's TILE span (1-3
    for the block-local scatter rungs) instead of its row span (8-12).
    Slab count adapts per window (a window with conflict-free cells needs
    ONE slab vreg); the ragged per-window slabs fold through a
    deterministic segment-sum over ``win_of`` (fixed order)."""

    plan: CopyPlan
    win_of: jnp.ndarray        # [NV] int32 output window of each slab vreg
    n_win: int
    n_out: int

    @property
    def buckets(self):
        return self.plan.buckets

    def __call__(self, src, *, interpret=False):
        """src [planes, plane_len] -> [planes, n_out]."""
        d = self.plan.planes
        y = self.plan(src, interpret=interpret)
        y = y.reshape(d, -1, 8, 128).sum(axis=2)        # [d, NV, 128]
        folded = jax.vmap(
            lambda yp: jax.ops.segment_sum(yp, self.win_of,
                                           num_segments=self.n_win))(y)
        return folded.reshape(d, -1)[:, : self.n_out]

    def tree_flatten(self):
        return (self.plan, self.win_of), (self.n_win, self.n_out)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], *aux)


def _tile_slab_plan(dst_ids, src_pos, n_ids, plane_len, d,
                    blk_rows=None):
    """Pack contributions ``dst_ids[i] <- src_pos[i]`` (plane-local, both
    >= 0) into tile-slab vregs and compile the tile-chain copy.

    Cell assignment: (window = dst // 128, lane = dst % 128,
    sublane = (src >> 7) % 8); conflicting contributions (same window,
    lane, sublane) stack into additional slab vregs of that window."""
    dst_ids = np.asarray(dst_ids, np.int64)
    src_pos = np.asarray(src_pos, np.int64)
    lane = dst_ids & 127
    win = dst_ids >> 7
    sub = (src_pos >> 7) & 7
    n_win = int(-(-n_ids // 128))
    # occurrence rank within (window, lane, sublane) = slab level
    key = (win * 128 + lane) * 8 + sub
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.ones(len(ks), bool)
    first[1:] = ks[1:] != ks[:-1]
    starts = np.nonzero(first)[0]
    glen = np.diff(np.concatenate([starts, [len(ks)]]))
    occ = np.arange(len(ks)) - np.repeat(starts, glen)
    # slabs per window = max occ + 1 over the window's cells
    win_o = win[order]
    n_slab_w = np.zeros(n_win, np.int64)
    np.maximum.at(n_slab_w, win_o, occ + 1)
    slab_base = np.concatenate([[0], np.cumsum(n_slab_w)])
    NV = max(int(slab_base[-1]), 1)
    sid = np.full((NV, 8, 128), -1, np.int64)
    vreg = slab_base[win_o] + occ
    sid[vreg, sub[order], lane[order]] = src_pos[order]
    win_of = np.repeat(np.arange(n_win, dtype=np.int64), n_slab_w)
    if len(win_of) == 0:
        win_of = np.zeros(1, np.int64)
    plan = plan_copy_cells(sid, plane_len, planes=d, blk_rows=blk_rows)
    return SumPlanTiles(plan, jnp.asarray(win_of, jnp.int32), n_win,
                        int(n_ids))


def _split_compact(grp, node, cap, pad=128):
    """Compact (grp, node) items with overflow splitting.

    ``grp[i]``/``node[i]`` per input item; ``node < 0`` marks dead items
    (padding slots — their dst stays -1).  Each live (grp, node) pair
    receives ``ceil(count / cap)`` consecutive output ids with at most
    ``cap`` items per id: the reduce packer builds one 8-slot chunk per
    (window, lane), so no output window ever needs more than ~1 task rank
    — without the split, a single high-valence node (e.g. 25 incident
    elements in one block) forces ceil(25/8) mostly-empty task vregs on
    its whole window.  Ids are ordered (grp, node, split) and every
    group's id range is padded to a multiple of ``pad`` (= the routing
    window width) so reduce output windows never mix groups.

    Returns ``(dst [items], n_out, out_grp [n_out], out_node [n_out])``
    with ``out_node == -1`` on padding ids."""
    items = len(grp)
    dst = np.full(items, -1, np.int64)
    live = np.nonzero(node >= 0)[0]
    if len(live) == 0:
        return dst, 0, np.zeros(0, np.int64), np.zeros(0, np.int64)
    BIG = np.int64(1) << 40
    key = grp[live] * BIG + node[live]
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.ones(len(ks), bool)
    first[1:] = ks[1:] != ks[:-1]
    gstart = np.nonzero(first)[0]
    glen = np.diff(np.concatenate([gstart, [len(ks)]]))
    occ = np.arange(len(ks)) - np.repeat(gstart, glen)
    split = occ // cap
    nsplit = -(-glen // cap)                   # ids per (grp, node) pair
    pair_grp = (ks[gstart] // BIG).astype(np.int64)
    pair_node = (ks[gstart] % BIG).astype(np.int64)
    n_grp = int(pair_grp[-1]) + 1
    ids_per_grp = np.bincount(pair_grp, weights=nsplit,
                              minlength=n_grp).astype(np.int64)
    padded = -(-ids_per_grp // pad) * pad
    grp_off = np.concatenate([[0], np.cumsum(padded)])
    unpadded_pre = np.concatenate([[0], np.cumsum(ids_per_grp)])
    pair_start = np.cumsum(nsplit) - nsplit    # pair-major running ids
    pair_base = grp_off[pair_grp] + (pair_start - unpadded_pre[pair_grp])
    dst[live[order]] = np.repeat(pair_base, glen) + split
    n_out = int(grp_off[-1])
    out_grp = np.repeat(np.arange(n_grp, dtype=np.int64), padded)
    out_node = np.full(n_out, -1, np.int64)
    nid = (np.repeat(pair_base, nsplit)
           + np.arange(int(nsplit.sum())) - np.repeat(pair_start, nsplit))
    out_node[nid] = np.repeat(pair_node, nsplit)
    return dst, n_out, out_grp, out_node


def _stage_gather_ids(dst, n_out, cap=8):
    """Transpose a ≤cap-per-id scatter map into gather planes:
    ``G [cap, n_out]`` with ``G[k, id]`` the source position of id's k-th
    contribution (-1 when it has fewer).  The copy-kernel formulation of
    a reduce stage: ``out = sum_k copy(src)[k]`` — deterministic (fixed
    k order) and served by the ~5x more efficient copy kernel."""
    dst = np.asarray(dst, np.int64)
    live = np.nonzero(dst >= 0)[0]
    order = live[np.argsort(dst[live], kind="stable")]
    ds = dst[order]
    first = np.ones(len(ds), bool)
    first[1:] = ds[1:] != ds[:-1]
    starts = np.nonzero(first)[0]
    glen = np.diff(np.concatenate([starts, [len(ds)]]))
    occ = np.arange(len(ds)) - np.repeat(starts, glen)
    G = np.full((cap, n_out), -1, np.int64)
    G[occ, ds] = order
    return G


def _scatter_ladder(ed, Eb, n, N, cap=4, group=8):
    """Multi-stage scatter ladder for the transpose reduce:

      slots (element-major ``[Ep, n]`` flat) -> level-1 per-block compact
      ids -> level-2 per-``group``-block compact ids -> global nodes [N].

    Each rung keeps its reduce LOCAL: a level-1 output window's sources
    are only its own block's n slot windows (chain <= n); a level-2
    window's sources are its ``group`` blocks' few compact windows; the
    final rung sees each node only once per incident group.  Overflow
    splitting (``_split_compact``) caps contributions per id at ``cap``
    so task ranks stay ~1 everywhere.

    Returns ``(dst0 [Ep * n], stages)`` with ``stages[0] = (None, n1)``
    and ``stages[1:] = [(dst_map, n_out), ...]`` ending at ``N``.

    ``cap`` trades slab occupancy against rung width: average level-1
    fan-in is only ~2.6 at P2/3D (8.4M slots over 3.27M block-node
    pairs), so cap=8 slabs run 32%-full — the rung-1 copy plan routes
    3.1x the slot count, mostly zeros.  cap=4 halves the slab volume at
    the cost of ~10% more (split) ids."""
    Ep = ed.shape[0]
    flat = ed.reshape(-1)
    slot_grp = np.repeat(np.arange(Ep, dtype=np.int64) // 128, n)
    dst0, n1, grp1, node1 = _split_compact(slot_grp, flat, cap)
    stages = [(None, n1)]
    if Eb > group:
        dst1, n2, _, node2 = _split_compact(grp1 // group, node1, cap)
        stages.append((dst1, n2))
        stages.append((node2, N))
    else:
        stages.append((node1, N))
    return dst0, stages


def _ladder_group():
    """Level-2 ladder fan-in (blocks per group): larger groups dedupe
    more ids before the final unbounded-fan-in ReducePlan rung at the
    cost of longer level-2 chains.  Probed on v5e at 1.17M DOF
    (experiments/probe_scat_grp.py): grp=8 rungs 2+3 = 0.65+0.65 ms,
    grp=32 = 0.71+0.26 ms (level-2 output 627k -> 524k ids, final rung
    389k), full apply 5.30 -> 5.21 ms; rung 1 is group-independent."""
    import os

    return int(os.environ.get("MESHFEM_SCAT_GRP", "32"))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PlanesOp:
    """Pytree callable exposing an operator's PLANE-layout apply.

    Wraps a :class:`RoutedEBE` (or anything with ``apply_planes``) so
    solvers can ship it as a jit argument and iterate on [d, N] vectors
    — no [N, d] <-> [d, N] transpose on the hot path (two full-vector
    HBM relayouts per CG iteration otherwise)."""

    op: object

    def __call__(self, u):
        return self.op.apply_planes(u)

    def tree_flatten(self):
        return (self.op,), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RoutedEBE:
    """Symmetric routed EBE operator for scalar or vector dofs.

    Same contract as :class:`meshfem_tpu.sparse.ebe.EBEKernel` for
    single-vector applies: u of shape [N] (d == 1) or [N, d].  f32 only —
    the routing kernels are f32; for f64 use EBEKernel.

    Two element-contraction backends:

      * ``KeB`` dense per-element stiffness [Eb, n, d, n, d, 128] — any
        material, but HBM-bound: (nd)^2 f32 per element (~925 MB at a
        257k-tet P2 bench apply, a >1 ms read floor per apply);
      * FACTORED isotropic (``GB``/``volB``/``lam``/``mu`` set, KeB
        None): the affine-simplex identity Ke = vol * T[klij] g_ka g_lb
        C[cafb] (``element_matrices.element_elasticity``) applied
        WITHOUT forming Ke — per-element data shrinks to grad_lambda +
        volume ((K+1) dim + 1 f32, 69x less traffic at P2/3D) and the
        contraction becomes small per-lane einsums with the constant
        gradgrad table.  Exact same arithmetic as applying the f32 Ke."""

    KeB: jnp.ndarray | None     # [Eb, n, d, n, d, 128] f32 (dense mode)
    gather: CopyPlan            # component planes [d*N] -> slots [Eb*nd*128]
    scatter: ReducePlan | SumPlan    # slots -> first-rung partials
    scatter_rest: tuple         # follow-up stages down to [d*N]
    order: jnp.ndarray | None   # [N] user dof held by internal slot i
    rank: jnp.ndarray | None    # [N] internal slot of user dof (inverse)
    num_dofs: int               # nodes
    vector_dim: int
    interpret: bool
    scatter_mode: str = "reduce"    # legacy knob (slab-sum ladder
                                    # is now the only path)
    GB: jnp.ndarray | None = None   # [Eb, K+1, dim, 128] f32 grad_lambda
    volB: jnp.ndarray | None = None  # [Eb, 128] f32 element volumes
    Tgg: jnp.ndarray | None = None   # [K+1, K+1, n, n] f32 gradgrad table
    lam: float = 0.0
    mu: float = 0.0
    deg: int = 2                     # element degree (factored tables)
    bgather: CopyPlan | None = None  # d*m-plane plans for apply_block
    bscatter: object | None = None
    bscatter_rest: tuple = ()
    bm: int = 0                      # RHS count the block plans serve

    @classmethod
    def build(cls, Ke, elem_dofs, num_dofs: int, vector_dim: int = 1,
              interpret: bool | None = None,
              two_level: bool | None = None,
              coords=None, scatter_mode: str | None = None,
              factor=None, block_rhs: int | None = None) -> "RoutedEBE":
        """Ke: [E, nd, nd] (node-major dof order: a = node * d + comp);
        elem_dofs: [E, n] node ids; num_dofs = number of NODES.

        ``factor`` (optional): ``(grad_lambda [E, K+1, dim], volume [E],
        lam, mu, deg)`` activates the factored isotropic contraction
        (class docstring) — ``Ke`` may then be None.

        ``two_level`` (default: on for E >= 4096): see module docstring.

        ``coords`` ([num_dofs, dim] positions): when given, the operator
        REORDERS internally — elements along RCB leaves, dofs by first
        touch — so routing chains stay small on arbitrarily-numbered
        input meshes, and ``__call__`` then works in the INTERNAL
        ordering (``order``/``rank`` non-None).  Callers keep solver
        vectors internal for the whole solve and convert once each way
        with :meth:`permute_in` / :meth:`permute_out`; applying A costs
        the same either way.  Without coords the input numbering is used
        as-is (correct always; fast only if the mesh was pre-ordered,
        e.g. ``FEMMesh(..., node_order='firsttouch')`` over RCB-sorted
        elements).

        ``block_rhs``: also build d * block_rhs-plane plans so
        :meth:`apply_block` with that many RHS columns routes ALL columns
        AND components through ONE index stream (homogenization's fl cell
        problems — the CHOLMOD factorize-once / m-back-substitutions
        economy, reference ``SparseMatrices.hh:2077-2131``)."""
        elem_dofs = np.asarray(elem_dofs)
        E, n = elem_dofs.shape
        d = vector_dim
        nd = n * d
        if factor is not None:
            gl, volume, lam, mu, deg = factor
            gl = jnp.asarray(gl, jnp.float32)
            volume = jnp.asarray(volume, jnp.float32)
            Ke = None
        else:
            Ke = jnp.asarray(Ke, jnp.float32)
            assert Ke.shape == (E, nd, nd)
        Eb = -(-E // 128)
        Ep = Eb * 128
        N = num_dofs
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if two_level is None:
            two_level = E >= 4096
        # scatter_mode is a legacy knob: the slab-sum ladder replaced the
        # per-task reduce packing AND the 8-plane 'copy' formulation
        # (both measured slower — 2.93 ms / ~3x — than SumPlan rungs)
        scatter_mode = "reduce"

        if coords is not None:
            from ..mesh.reorder import rcb_order

            cent = np.asarray(coords)[elem_dofs].mean(axis=1)
            eperm = rcb_order(cent)
            ed_sorted = elem_dofs[eperm]
            uniq, first_pos = np.unique(ed_sorted.ravel(),
                                        return_index=True)
            touched = uniq[np.argsort(first_pos)]
            untouched = np.setdiff1d(np.arange(N, dtype=np.int64), uniq)
            order_np = np.concatenate([touched, untouched])
            rank_np = np.empty(N, np.int64)
            rank_np[order_np] = np.arange(N)
            elem_dofs = rank_np[ed_sorted]
            epj = jnp.asarray(eperm)
            if Ke is not None:
                Ke = jnp.take(Ke, epj, axis=0)
            if factor is not None:
                gl = jnp.take(gl, epj, axis=0)
                volume = jnp.take(volume, epj, axis=0)
            order = jnp.asarray(order_np)
            rank = jnp.asarray(rank_np)
        else:
            order = rank = None

        ed_key = hashlib.sha1(np.ascontiguousarray(elem_dofs)).hexdigest()

        sb = factor is not None    # superblock slot layout (qp kernel)

        def plan_set(planes):
            """Build (or fetch) the gather/scatter plan set dispatching
            ``planes`` value planes through the shared index stream
            (planes = d for the single-vector apply, d * m for the m-RHS
            block apply)."""
            import os

            knobs = (os.environ.get("MESHFEM_SCAT_CAP", "4"),
                     os.environ.get("MESHFEM_TILE_RUNGS", "0"),
                     os.environ.get("MESHFEM_SCAT_BLK", ""),
                     os.environ.get("MESHFEM_SCAT_GRP", "32"))
            key = (ed_key, N, d, two_level, scatter_mode, "planes-v2",
                   planes, knobs, sb)
            cached = _PLAN_CACHE.get(key)
            if cached is None:
                cached = cls._build_plan_set(elem_dofs, E, Eb, Ep, n, N,
                                             planes, two_level, sb=sb)
                if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
                    _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
                _PLAN_CACHE[key] = cached
            return cached

        gather, scatter, scatter_rest = plan_set(d)
        import os

        if block_rhs and os.environ.get("MESHFEM_BLOCK_PLANES") == "1":
            # EXPERIMENTAL (off by default): d*m-plane block plans.
            # Measured at 1.17M DOF on v5e: planes=18 OOMs scoped VMEM
            # (double-buffered source block + stack-allocated small
            # bucket outputs), and the planes=9 fallback needs such
            # small per-plane blocks (~790 rows) that spill fix-ups
            # dominate — 41 ms/column vs 5.8 ms single-vector.  The
            # production apply_block instead reuses the d-plane plans
            # per column and amortizes the KeB read through ONE stacked
            # contraction (_contract_block).
            g = max(1, 9 // d)
            bgather, bscatter, bscatter_rest = plan_set(d * min(
                g, block_rhs))
        else:
            bgather, bscatter, bscatter_rest = None, None, ()
            block_rhs = 0
        fields = cls._element_fields(Ke, factor and (gl, volume, lam,
                                                     mu, deg),
                                     E, Eb, Ep, n, d, nd)
        return cls(gather=gather, scatter=scatter,
                   scatter_rest=scatter_rest, order=order, rank=rank,
                   num_dofs=N, vector_dim=d, interpret=interpret,
                   scatter_mode=scatter_mode, bgather=bgather,
                   bscatter=bscatter, bscatter_rest=bscatter_rest,
                   bm=int(block_rhs or 0), **fields)

    @classmethod
    def _build_plan_set(cls, elem_dofs, E, Eb, Ep, n, N, planes,
                        two_level, sb=False):
        """Host-compile one (gather, scatter, scatter_rest) plan set.

        ``sb``: SUPERBLOCK slot layout for the qp stress kernel
        (:func:`meshfem_tpu.sparse.contract.qp_contract`): slots ordered
        ``((e // 1024) * n + a) * 1024 + e % 1024`` — 1024 elements per
        superblock with (sublane, lane) = (row within block, e % 128),
        so each gathered node row ``u[c, i]`` is a whole [8, 128] vreg.
        The scatter ladder keeps its 128-element rung blocks (locality
        unchanged — a block's slots still span <= n source windows)."""
        d = planes                  # routing planes (index-stream width)
        if sb:
            Ep = -(-E // 1024) * 1024
            Eb = Ep // 128
        ed = np.full((Ep, n), -1, np.int64)
        ed[:E] = elem_dofs
        if sb:
            # [E8, n, 1024] node id of slot (e8, a, j)
            ed_bal = ed.reshape(Ep // 1024, 1024, n).transpose(0, 2, 1)
        else:
            # [Eb, n, 128] node id of slot (b, a, l) = elem 128 b + l
            ed_bal = ed.reshape(Eb, 128, n).transpose(0, 2, 1)

        # gather: PLANE-LOCAL routing (slot <- node), dispatched in planes
        # mode — the d component planes share one index stream
        gather = plan_copy(ed_bal.reshape(-1), N, planes=d)

        if two_level:
            # Scatter ladder (see _scatter_ladder): slots -> overflow-split
            # block-compact -> group-compact -> global nodes.  Rungs with
            # structural fan-in <= 8 (every rung built by _split_compact)
            # run as SLAB-SUM COPY plans: one vreg = one output window's 8
            # contributions [8, 128] riding the sublanes, routed by the
            # copy kernel and sublane-summed in XLA.  Same chain profile
            # as the reduce packer's tasks, but no dynamic-row
            # read-modify-write: the reduce kernel's o_ref[row] += part
            # serializes its unrolled routes (measured 2.93 ms vs the
            # copy kernel's 0.32 ms at comparable chain work, v5e 1.17M
            # DOF).  Only the LAST rung (group-compact ids -> global
            # nodes) has unbounded fan-in and stays a ReducePlan — on
            # ~1/20 the original slot count.
            import os

            cap = int(os.environ.get("MESHFEM_SCAT_CAP", "4"))
            tiles = os.environ.get("MESHFEM_TILE_RUNGS", "0") == "1"
            # scatter rungs read BLOCK-LOCAL sources (an element block's
            # n slot rows / a group's compact-id windows), so their VMEM
            # source blocks should be small — a big block is re-fetched
            # every grid step for ~10 useful rows
            sblk = os.environ.get("MESHFEM_SCAT_BLK")
            sblk = int(sblk) if sblk else None
            dst0_node, stages = _scatter_ladder(ed, Eb, n, N, cap=cap,
                                                group=_ladder_group())
            S0p = Eb * n * 128
            # element-major slot s = e*n + a -> plane-local slot position
            e_idx = np.repeat(np.arange(Ep, dtype=np.int64), n)
            a_idx = np.tile(np.arange(n, dtype=np.int64), Ep)
            if sb:
                pos_plane = ((e_idx // 1024) * n + a_idx) * 1024 \
                    + (e_idx % 1024)
            else:
                pos_plane = ((e_idx // 128) * n + a_idx) * 128 \
                    + (e_idx % 128)
            n1 = stages[0][1]
            live0 = np.nonzero(dst0_node >= 0)[0]
            if tiles:
                scatter = _tile_slab_plan(dst0_node[live0],
                                          pos_plane[live0], n1, S0p, d,
                                          blk_rows=sblk)
            else:
                G0 = _stage_gather_ids(dst0_node, n1, cap)  # [cap, n1]
                src0 = np.where(G0 >= 0, pos_plane[np.maximum(G0, 0)],
                                np.int64(-1))
                scatter = _sum_plan(src0, S0p, d, cap, blk_rows=sblk)
            rest = []
            n_prev = n1
            for dst_map, n_out in stages[1:-1]:
                if tiles:
                    liv = np.nonzero(dst_map >= 0)[0]
                    rest.append(_tile_slab_plan(dst_map[liv], liv, n_out,
                                                n_prev, d, blk_rows=sblk))
                else:
                    G = _stage_gather_ids(dst_map, n_out, cap)
                    rest.append(_sum_plan(G, n_prev, d, cap,
                                          blk_rows=sblk))
                n_prev = n_out
            dst_map, n_out = stages[-1]
            rest.append(plan_reduce(dst_map, n_out, n_prev, planes=d,
                                    blk_rows=sblk))
            scatter_rest = tuple(rest)
        else:
            scatter = plan_reduce(ed_bal.reshape(-1), N, Eb * n * 128,
                                  planes=d)
            scatter_rest = ()
        return gather, scatter, scatter_rest

    @classmethod
    def _element_fields(cls, Ke, factor, E, Eb, Ep, n, d, nd):
        """Element-data fields for either contraction backend."""
        if factor is None:
            return dict(KeB=cls._relayout(Ke, E, Eb, Ep, n, d, nd))
        gl, volume, lam, mu, deg = factor
        from ..ops.element_matrices import gradgrad_table

        K1 = gl.shape[1]                       # K + 1
        dim = gl.shape[2]
        # SUPERBLOCK layout (matches the sb=True plans and the qp stress
        # kernel): 1024 elements per block, lanes = e % 128, sublanes =
        # (e % 1024) // 128
        Ep8 = -(-E // 1024) * 1024
        if Ep8 != E:
            gl = jnp.concatenate(
                [gl, jnp.zeros((Ep8 - E, K1, dim), jnp.float32)])
            volume = jnp.concatenate(
                [volume, jnp.zeros((Ep8 - E,), jnp.float32)])
        E8 = Ep8 // 1024
        GB = jnp.transpose(gl.reshape(E8, 1024, K1, dim), (0, 2, 3, 1))
        volB = volume.reshape(E8, 1024)
        Tgg = jnp.asarray(gradgrad_table(K1 - 1, deg), jnp.float32)
        return dict(KeB=None, GB=GB, volB=volB, Tgg=Tgg,
                    lam=float(lam), mu=float(mu), deg=int(deg))

    @staticmethod
    def _relayout(Ke, E, Eb, Ep, n, d, nd):
        # lane-major relayout on DEVICE (a ~1 GB host-side transpose copy
        # costs ~40 s at bench scale; the device does it in milliseconds),
        # rows/cols split (node, comp) so the contraction reads
        # component-major slots directly
        if Ep != E:
            Ke = jnp.concatenate(
                [Ke, jnp.zeros((Ep - E, nd, nd), jnp.float32)])
        return jnp.transpose(Ke.reshape(Eb, 128, n, d, n, d),
                             (0, 2, 3, 4, 5, 1))

    # ------------------------------------------------------------------
    def permute_in(self, u):
        """User-ordered [N] / [N, d] -> internal ordering (identity when
        built without coords)."""
        return u if self.order is None else u[self.order]

    def permute_out(self, y):
        """Internal ordering -> user ordering."""
        return y if self.order is None else y[self.rank]

    def _eb_n(self):
        if self.KeB is not None:
            return self.KeB.shape[0], self.KeB.shape[1]
        return self.GB.shape[0], self.Tgg.shape[-1]

    @property
    def _lanes(self):
        """Trailing lane count of one element block: 128 for the dense
        KeB layout, 1024 for the factored SUPERBLOCK layout."""
        return 128 if self.KeB is not None else 1024

    def _contract(self, ue):
        """[d, Eb, n, 128] component-major element values -> forces
        [d, Eb, n, 128] (VPU multiply-reduce; lanes = elements)."""
        if self.KeB is not None:
            return jnp.einsum("eACacl,ceal->CeAl", self.KeB, ue)
        return self._contract_factored(ue)

    def _contract_factored(self, ue):
        """Factored isotropic contraction (class docstring): with
        g = grad_lambda, T the gradgrad table and C_cafb = lam d_ca d_fb
        + mu (d_cf d_ab + d_cb d_af), Ke u splits into

          f1[ic] = mu  sum_j (sum_km T[kmij] (g_k . g_m)) u[jc]
          f2[ic] = lam sum_k g_kc sum_lj T[klij] (g_l . u_j)
          f3[ic] = mu  sum_l g_lc sum_kj T[klij] (g_k . u_j)

        all scaled by vol — three lane-parallel contractions against
        per-element data of (K+1) dim + 1 floats instead of (nd)^2.

        On TPU this runs the SUPERBLOCK quadrature-point stress kernel
        (:func:`meshfem_tpu.sparse.contract.qp_contract`): XLA lowers
        the loose einsums below to badly-padded batched matmuls (27 ms
        vs the 3.7 ms dense apply measured on v5e at 1.17M DOF), and the
        earlier TQ table kernel filled 1/8 of the MXU (2.2 ms); the qp
        kernel is pure full-vreg VPU work at ~1.6 KFLOP/element.  The
        einsum form stays as the interpret-mode (CPU) reference.
        ``MESHFEM_FACTORED_TQ=1`` falls back to the TQ kernel (probe
        insurance; pays two 34 MB relayouts per apply)."""
        if not self.interpret:
            import os

            E8 = self.GB.shape[0]
            K1, dim = self.GB.shape[1], self.GB.shape[2]
            d, n = ue.shape[0], ue.shape[2]
            if os.environ.get("MESHFEM_FACTORED_TQ") == "1":
                from .contract import factored_contract

                GB2 = self.GB.reshape(E8, K1 * dim, 8, 128) \
                    .transpose(0, 2, 1, 3).reshape(E8 * 8, K1 * dim, 128)
                volB = self.volB.reshape(E8, 8, 128).reshape(E8 * 8, 128)
                ue_o = ue.reshape(d, E8, n, 8, 128) \
                    .transpose(0, 1, 3, 2, 4).reshape(d, E8 * 8, n, 128)
                fe = factored_contract(GB2, volB, ue_o, self.lam,
                                       self.mu, dim, self.deg)
                return fe.reshape(d, E8, 8, n, 128) \
                    .transpose(0, 1, 3, 2, 4)
            from .contract import qp_contract

            GB2 = self.GB.reshape(E8, K1 * dim, 8, 128)
            return qp_contract(GB2, self.volB.reshape(E8, 8, 128),
                               ue.reshape(d, E8, n, 8, 128), self.lam,
                               self.mu, dim, self.deg)
        # HIGHEST precision: these contractions lower to MXU matmuls,
        # whose default f32 path runs bf16 passes (~1e-3 relative error,
        # measured 2.3e-3 on the apply) — enough asymmetry to stall CG.
        # HIGHEST keeps full f32; the matmuls are small (~2.5 GFLOP at
        # bench scale) so even the multi-pass cost is noise next to the
        # HBM traffic this path saves.
        hp = jax.lax.Precision.HIGHEST
        g, T = self.GB, self.Tgg
        d1 = jnp.einsum("ekcl,cenl->eknl", g, ue, precision=hp)
        G2 = jnp.einsum("ekcl,emcl->ekml", g, g, precision=hp)
        Le = jnp.einsum("kmij,ekml->eijl", T, G2, precision=hp)
        f1 = self.mu * jnp.einsum("eijl,cejl->ceil", Le, ue, precision=hp)
        m1 = jnp.einsum("klij,eljL->ekiL", T, d1, precision=hp)
        m2 = jnp.einsum("klij,ekjL->eliL", T, d1, precision=hp)
        f2 = self.lam * jnp.einsum("ekcL,ekiL->ceiL", g, m1, precision=hp)
        f3 = self.mu * jnp.einsum("elcL,eliL->ceiL", g, m2, precision=hp)
        return self.volB[None, :, None, :] * (f1 + f2 + f3)

    def _scatter(self, fl):
        """fl [d, slots_plane] -> [d, N] (planes-mode rungs)."""
        y = self.scatter(fl, interpret=self.interpret)
        for p in self.scatter_rest:
            y = p(y, interpret=self.interpret)
        return y

    def apply_planes(self, src):
        """Plane-native apply: ``src [d, N] -> A src [d, N]``.

        The kernels work in component planes end to end; ``__call__``
        wraps this with the user-layout [N, d] transposes.  Solvers that
        keep their vectors in plane layout (``PlanesOp``) skip those
        per-apply relayouts entirely — at 1.17M DOF the two [N, 3]
        transposes are pure HBM glue on every CG iteration."""
        Eb, n = self._eb_n()
        d = self.vector_dim
        ue = self.gather(src.astype(jnp.float32), interpret=self.interpret) \
            .reshape(d, Eb, n, self._lanes)
        fe = self._contract(ue)
        return self._scatter(fe.reshape(d, -1))           # [d, N]

    def __call__(self, u):
        d = self.vector_dim
        u = u.astype(jnp.float32)
        src = u.reshape(self.num_dofs, d).T               # [d, N] planes
        y = self.apply_planes(src)
        if d == 1:
            return y.reshape(u.shape)
        return y.reshape(d, self.num_dofs).T.reshape(u.shape)

    def apply_block(self, U):
        """Multi-RHS apply: ``U [N, d, m] -> A @ U`` (also ``[N, m]`` when
        d == 1).  The routing PLAN is RHS-independent (reference:
        ``PeriodicHomogenization.hh:48-53`` amortizes one CHOLMOD
        factorization over 6 back-substitutions).  The m columns run
        through the SAME planes-mode plans column by column (one jitted
        dispatch sequence; per-column routing already amortizes its index
        stream across the d components), while the ELEMENT CONTRACTION —
        the dense path's 900-f32-per-element HBM read — runs ONCE for all
        m columns (``_contract_block``), so the per-RHS cost drops by the
        full contraction share.  (A vmap over columns instead batches
        every routing intermediate into [m, ...] HLO temps — measured
        2.3x slower per RHS at m = 2 and RESOURCE_EXHAUSTED at m = 6 at
        1.17M DOF.)"""
        Eb, n = self._eb_n()
        d = self.vector_dim
        m = U.shape[-1]
        U = U.astype(jnp.float32)
        if self.bgather is not None and m == self.bm:
            g = self.bgather.planes // d      # columns per plane group
            if g >= m:
                return self._apply_block_planes(U, Eb, n, d, m)
            # VMEM caps the plane count (~9): run ceil(m/g) column
            # groups through the d*g-plane plans, padding the tail
            pad = (-m) % g
            if pad:
                U = jnp.concatenate(
                    [U, jnp.zeros(U.shape[:-1] + (pad,), U.dtype)],
                    axis=-1)
            outs = [self._apply_block_planes(U[..., j:j + g], Eb, n, d, g)
                    for j in range(0, m + pad, g)]
            return jnp.concatenate(outs, axis=-1)[..., :m]
        src = jnp.transpose(U.reshape(self.num_dofs, d, m),
                            (2, 1, 0))                    # [m, d, N]
        ues = [self.gather(src[j], interpret=self.interpret)
               .reshape(d, Eb, n, self._lanes) for j in range(m)]
        fes = self._contract_block(ues)
        outs = [self._scatter(fe.reshape(d, -1)) for fe in fes]  # [d, N]
        y = jnp.stack(outs).reshape(m, d, self.num_dofs)
        out = jnp.transpose(y, (2, 1, 0))
        return out.reshape(U.shape)

    def _apply_block_planes(self, U, Eb, n, d, m):
        """All m columns AND d components through ONE routing pass
        (plans built with ``block_rhs``): the per-value index traffic
        — as large as one plane of routed data — amortizes d*m-fold."""
        # plane p = c * m + j (component-major: contract reads directly)
        src = jnp.transpose(U.reshape(self.num_dofs, d, m),
                            (1, 2, 0)).reshape(d * m, self.num_dofs)
        ue = self.bgather(src, interpret=self.interpret) \
            .reshape(d, m, Eb, n, self._lanes)
        if self.KeB is not None:
            uem = jnp.transpose(ue, (0, 2, 3, 4, 1))  # [d, Eb, n, 128, m]
            fem = jnp.einsum("eACacl,cealm->CeAlm", self.KeB, uem,
                             precision=jax.lax.Precision.HIGHEST)
            fe = jnp.transpose(fem, (0, 4, 1, 2, 3))  # [d, m, Eb, n, 128]
        else:
            fes = [self._contract(ue[:, j]) for j in range(m)]
            fe = jnp.stack(fes, axis=1)               # [d, m, Eb, n, 128]
        y = self.bscatter(fe.reshape(d * m, -1), interpret=self.interpret)
        for p in self.bscatter_rest:
            y = p(y, interpret=self.interpret)        # [d*m, N]
        out = jnp.transpose(y.reshape(d, m, self.num_dofs), (2, 0, 1))
        return out.reshape(U.shape)

    def _contract_block(self, ues):
        """Contract m gathered column tensors; the dense-KeB path stacks
        them into ONE einsum so the [Eb, n, d, n, d, 128] stiffness reads
        once for all m columns (the CHOLMOD multi-RHS back-substitution
        economy, ``SparseMatrices.hh:2077-2131``)."""
        if self.KeB is None:
            return [self._contract(ue) for ue in ues]
        uem = jnp.stack(ues, axis=-1)            # [d, Eb, n, 128, m]
        # HIGHEST: the m-column contraction lowers to an MXU dot whose
        # default f32 path runs bf16 passes (measured 3.4e-3 apply error
        # vs the per-column VPU multiply-reduce); the matmul is
        # KeB-streaming-bound so full precision is free
        fem = jnp.einsum("eACacl,cealm->CeAlm", self.KeB, uem,
                         precision=jax.lax.Precision.HIGHEST)
        return [fem[..., j] for j in range(len(ues))]

    def diagonal(self):
        """Assembled operator diagonal (Jacobi), via the scatter plan."""
        d = self.vector_dim
        if self.KeB is not None:
            de = jnp.einsum("eacacl->eacl", self.KeB)  # [Eb, n, d, 128]
        else:
            # diag Ke[(ac)(ac)] = vol sum_kl T[klaa]
            #                     (mu G_kl + (lam + mu) g_kc g_lc)
            hp = jax.lax.Precision.HIGHEST
            g, T = self.GB, self.Tgg
            Taa = jnp.einsum("klaa->kla", T)
            G2 = jnp.einsum("ekcl,emcl->ekml", g, g, precision=hp)
            iso = self.mu * jnp.einsum("kla,eklL->eaL", Taa, G2,
                                       precision=hp)
            dirn = (self.lam + self.mu) * jnp.einsum(
                "kla,ekcL,elcL->eacL", Taa, g, g, precision=hp)
            de = self.volB[:, None, None, :] * (iso[:, :, None, :] + dirn)
        y = self._scatter(jnp.transpose(de, (2, 0, 1, 3)).reshape(d, -1))
        if d == 1:
            return y.reshape(self.num_dofs)
        return y.reshape(d, self.num_dofs).T

    def diagonal_planes(self):
        """Operator diagonal in plane layout [d, N] (see
        :meth:`apply_planes`)."""
        d = self.vector_dim
        dg = self.diagonal()
        return dg.reshape(1, -1) if d == 1 else dg.T

    def tree_flatten(self):
        return ((self.KeB, self.gather, self.scatter, self.scatter_rest,
                 self.order, self.rank, self.GB, self.volB, self.Tgg,
                 self.bgather, self.bscatter, self.bscatter_rest),
                (self.num_dofs, self.vector_dim, self.interpret,
                 self.scatter_mode, self.lam, self.mu, self.deg,
                 self.bm))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        (KeB, gather, scatter, scatter_rest, order, rank, GB, volB,
         Tgg, bgather, bscatter, bscatter_rest) = ch
        n_dofs, d, interp, smode, lam, mu, deg, bm = aux
        return cls(KeB, gather, scatter, scatter_rest, order, rank,
                   n_dofs, d, interp, smode, GB, volB, Tgg, lam, mu, deg,
                   bgather, bscatter, bscatter_rest, bm)
