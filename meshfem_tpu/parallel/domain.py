"""Real domain decomposition for multi-chip solves (SURVEY §5.8).

The round-1 path replicated the full DOF vector on every chip and
all-reduced it each SpMV — O(Nd) ICI traffic per iteration.  This module
partitions the (reduced) DOF space into per-chip OWNED ranges along a
Morton curve and exchanges only HALO values:

* host build: Morton-order dofs, contiguous owned ranges, per-shard
  element lists (elements touching an owned dof, duplicated across shard
  boundaries so every owned row is complete locally), halo send/recv
  routing tables padded to uniform shapes;
* device SpMV (inside ``shard_map``): one ``lax.all_to_all`` moving only
  halo rows (O(halo) = O((Nd/S)^(2/3)) per pair, not O(Nd)).  Each
  shard's elements are SPLIT into an interior set (all nodes owned) and a
  boundary set (touches halo): the interior gather->einsum->segment_sum
  has no data dependence on the collective, so XLA's latency-hiding
  scheduler overlaps the all_to_all with the bulk of the local compute;
  only the boundary elements wait for the received halo rows;
* CG scalars (dot products) are the only ``psum``s;
* preconditioning: point Jacobi or exact per-node d x d block Jacobi
  (``precond='block'``), blocks assembled at build time;
* stopping: fixed iteration count (bit-identical to the single-device
  loop — partition invariance) or ``tol``-based with the loop dispatched
  in chunks and a host-side convergence + stagnation check between
  chunks (single multi-minute dispatches get relayed workers killed; see
  solvers/cg.py).

The replicated path (``parallel.sharded``) remains the small-problem
fallback.  Reference analog: TBB thread-local assembly
(``ParallelAssembly.hh:42-100``) — here the "threads" are chips.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..mesh.reorder import _morton_codes


@dataclasses.dataclass
class DomainDecomposition:
    """Host-built partition + halo-exchange plan (all arrays [S, ...],
    sharded on axis 0 at solve time)."""

    n_shards: int
    num_dofs: int          # original reduced dof count (unpadded)
    Nl: int                # owned rows per shard (padded)
    H: int                 # halo slots per shard (padded)
    K: int                 # exchange slots per (src, dst) pair (padded)
    d: int
    perm: np.ndarray       # old dof id -> new (morton) id
    Ke_int: jnp.ndarray    # [S, Ei, nd, nd] interior elements
    ld_int: jnp.ndarray    # [S, Ei, n] local OWNED rows in [0, Nl)
    Ke_bnd: jnp.ndarray    # [S, Eb, nd, nd] halo-touching elements
    ld_bnd: jnp.ndarray    # [S, Eb, n] local rows in [0, Nl + H)
    send_idx: jnp.ndarray  # [S, S, K] local OWNED rows to ship to each dst
    halo_take: jnp.ndarray  # [S, H] rows into the [S*K] recv buffer
    diag_s: jnp.ndarray    # [S, Nl, d] owned operator diagonal
    blocks_s: jnp.ndarray  # [S, Nl, d, d] per-node diagonal blocks
    halo_counts: np.ndarray  # [S, S] true (unpadded) pairwise traffic

    # -- host build -------------------------------------------------------
    @classmethod
    def build(cls, Ke, elem_dofs, num_dofs: int, d: int, positions,
              n_shards: int) -> "DomainDecomposition":
        """Ke [E, n*d, n*d]; elem_dofs [E, n] (reduced dof ids); positions
        [num_dofs, dim] representative coordinates for the Morton order."""
        Ke = np.asarray(Ke)
        elem_dofs = np.asarray(elem_dofs)
        E, n = elem_dofs.shape
        nd = Ke.shape[1]
        S = n_shards

        order = np.argsort(_morton_codes(np.asarray(positions)),
                           kind="stable")
        perm = np.empty(num_dofs, dtype=np.int64)
        perm[order] = np.arange(num_dofs)
        Nl = -(-num_dofs // S)
        new_ed = perm[elem_dofs]                       # [E, n]
        owner_ed = new_ed // Nl                        # [E, n]

        shard_elems, shard_halo, halo_by_pair = [], [], {}
        for s in range(S):
            mask = (owner_ed == s).any(axis=1)
            elems = np.flatnonzero(mask)
            dofs = np.unique(new_ed[elems])
            lo, hi = s * Nl, (s + 1) * Nl
            halo = dofs[(dofs < lo) | (dofs >= hi)]
            shard_elems.append(elems)
            shard_halo.append(halo)
            src_of = halo // Nl
            for src in np.unique(src_of):
                halo_by_pair[(int(src), s)] = halo[src_of == src]

        H = max((len(h) for h in shard_halo), default=1)
        H = max(H, 1)
        counts = np.zeros((S, S), dtype=np.int64)
        for (src, dst), rows in halo_by_pair.items():
            counts[src, dst] = len(rows)
        K = max(int(counts.max()), 1)

        send_idx = np.zeros((S, S, K), np.int32)
        halo_take = np.zeros((S, H), np.int32)
        diag_s = np.zeros((S, Nl, d), Ke.dtype)
        blocks_s = np.zeros((S, Nl, d, d), Ke.dtype)

        # permuted global diagonal + node blocks (f64 host accumulation)
        diag_full = np.zeros((S * Nl, d))
        de = np.einsum("eii->ei", Ke).reshape(E, n, d)
        np.add.at(diag_full, new_ed.reshape(-1), de.reshape(E * n, d))
        blocks_full = np.zeros((S * Nl, d, d))
        Kblk = np.einsum("eaiaj->eaij", Ke.reshape(E, n, d, n, d))
        np.add.at(blocks_full, new_ed.reshape(-1),
                  Kblk.reshape(E * n, d, d))

        per_shard = []
        for s in range(S):
            elems, halo = shard_elems[s], shard_halo[s]
            lo = s * Nl
            # local row of a new dof id: owned -> id - lo; halo -> Nl + pos
            halo_pos = {int(h): Nl + i for i, h in enumerate(halo)}
            ed = new_ed[elems]
            loc = ed - lo
            is_halo = (ed < lo) | (ed >= lo + Nl)
            if is_halo.any():
                flat = ed[is_halo]
                loc[is_halo] = np.asarray([halo_pos[int(x)] for x in flat])
            bnd = is_halo.any(axis=1)
            per_shard.append((elems[~bnd], loc[~bnd], elems[bnd], loc[bnd]))
            diag_s[s] = diag_full[lo:lo + Nl]
            blocks_s[s] = blocks_full[lo:lo + Nl]
            # halo slots grouped by source shard in ascending dof order:
            # recv buffer row for (src, k) is src * K + k.
            srcs = halo // Nl
            take = np.zeros(H, np.int64)
            for src in np.unique(srcs):
                rows = halo_by_pair[(int(src), s)]
                sel = np.flatnonzero(srcs == src)
                take[sel] = src * K + np.arange(len(rows))
                send_idx[src, s, :len(rows)] = rows - src * Nl
            halo_take[s, :len(halo)] = take[:len(halo)]

        Ei = max(len(p[0]) for p in per_shard)
        Eb = max(max(len(p[2]) for p in per_shard), 1)
        Ke_int = np.zeros((S, Ei, nd, nd), Ke.dtype)
        ld_int = np.zeros((S, Ei, n), np.int32)
        Ke_bnd = np.zeros((S, Eb, nd, nd), Ke.dtype)
        ld_bnd = np.zeros((S, Eb, n), np.int32)
        for s, (ei, li, eb, lb) in enumerate(per_shard):
            Ke_int[s, :len(ei)] = Ke[ei]
            ld_int[s, :len(ei)] = li
            Ke_bnd[s, :len(eb)] = Ke[eb]
            ld_bnd[s, :len(eb)] = lb

        return cls(S, num_dofs, Nl, H, K, d, perm,
                   jnp.asarray(Ke_int), jnp.asarray(ld_int),
                   jnp.asarray(Ke_bnd), jnp.asarray(ld_bnd),
                   jnp.asarray(send_idx), jnp.asarray(halo_take),
                   jnp.asarray(diag_s), jnp.asarray(blocks_s), counts)

    @classmethod
    def from_simulator(cls, sim, n_shards: int) -> "DomainDecomposition":
        pos = np.zeros((sim.num_dofs, sim.mesh.node_positions.shape[1]))
        pos[sim.dof_map] = np.asarray(sim.mesh.node_positions)
        return cls.build(sim.Ke, sim.elem_dofs, sim.num_dofs, sim.dim, pos,
                         n_shards)

    def build_routed(self, interpret: bool = True):
        """Per-shard ROUTED SpMV (``parallel/routed_dd.py``): the routed
        in-register kernels inside each shard, with plan structures
        FORCED identical across shards so shard_map sees one SPMD
        program.  f32 (the routing kernels are f32); combines the
        interior/boundary element sets (the all_to_all runs before the
        apply instead of overlapping the interior contraction)."""
        from .routed_dd import RoutedShardSpMV

        Ke_all = np.concatenate(
            [np.asarray(self.Ke_int), np.asarray(self.Ke_bnd)],
            axis=1).astype(np.float32)
        ld_all = np.concatenate(
            [np.asarray(self.ld_int), np.asarray(self.ld_bnd)], axis=1)
        return RoutedShardSpMV.build(Ke_all, ld_all, self.Nl, self.H,
                                     self.d, interpret=interpret)

    # -- vector layout ----------------------------------------------------
    def to_sharded(self, u):
        """[Nd, d(, m)] old dof order -> [S, Nl, d(, m)] padded/permuted."""
        u = np.asarray(u)
        pad = np.zeros((self.n_shards * self.Nl,) + u.shape[1:], u.dtype)
        pad[self.perm] = u
        return jnp.asarray(pad.reshape((self.n_shards, self.Nl)
                                       + u.shape[1:]))

    def from_sharded(self, us):
        flat = np.asarray(us).reshape((self.n_shards * self.Nl,)
                                      + us.shape[2:])
        return jnp.asarray(flat[self.perm])

    def comms_volume_per_spmv(self) -> int:
        """True halo scalars moved per SpMV (accounting, unpadded)."""
        return int(self.halo_counts.sum()) * self.d


@dataclasses.dataclass
class DDCoarse:
    """Replicated aggregation-coarse level for the DD solve: each shard
    restricts its OWNED residual rows through a composed
    P2-dof -> P1-vertex -> rigid-body-aggregate prolongator (per-dof: two
    target aggregates with [d, nm] weight blocks), the tiny aggregate
    residual is psum-replicated, solved by a replicated dense
    pseudo-inverse, and prolonged shard-locally.  Additive with the
    local smoother: M = S_block + P C^-1 P^T — a valid SPD two-level
    preconditioner, so DD iteration counts stay BOUNDED instead of
    growing with sqrt(kappa) (the CHOLMOD-robustness role at multi-chip
    scale; compare ``solvers/amg.py`` single-chip).  All operands are
    uniform [S, Nl, ...] arrays — SPMD-stackable, unlike per-shard routed
    plans whose bucket structures differ per shard."""

    aggA: jnp.ndarray     # [S, Nl] aggregate of endpoint vertex A
    aggB: jnp.ndarray     # [S, Nl]
    WA: jnp.ndarray       # [S, Nl, d, nm] weight blocks (0 on padding)
    WB: jnp.ndarray       # [S, Nl, d, nm]
    Cinv: jnp.ndarray     # [NA * nm, NA * nm] replicated dense pinv
    n_agg: int
    nm: int

    @classmethod
    def from_simulator(cls, sim, dd: "DomainDecomposition",
                       agg_size: int = 64, free_mask=None,
                       shift_rel: float = 0.0) -> "DDCoarse":
        """Host build: P1 Galerkin (exactly nested in P2) -> rigid-body
        aggregation Galerkin -> dense pinv.

        The coarse chain is MASKED through the prolongator (rows zeroed
        at fixed dofs, ``free_mask`` defaulting to ~sim.dirichlet_mask —
        the ``solvers/amg.py`` treatment): an unmasked floating coarse
        matrix has the rigid modes as an EXACT null space, and a
        shift-regularized inverse injects O(1/shift) rigid components
        that the Dirichlet projector then converts into large spurious
        corrections (measured: CG converges to a wrong solution).  For
        genuinely floating problems (periodic homogenization) pass the
        all-free mask and a small ``shift_rel``; the outer translation
        projector owns the nullspace there."""
        import scipy.sparse as sp

        from ..ops import element_matrices as em
        from ..sparse import assembly
        from ..solvers.amg import (_rcb_chunks, _rigid_modes,
                                   _tentative_prolongator, _scipy_P)

        mesh = sim.mesh
        d = sim.dim
        ND = sim.num_dofs
        dof_map = np.asarray(sim.dof_map)

        vdofs = dof_map[np.asarray(mesh.vertex_nodes)]
        cuniq, cidx = np.unique(vdofs, return_inverse=True)
        NC = len(cuniq)
        ep = mesh.node_endpoint_vertices()
        first = np.zeros(ND, np.int64)
        u_dofs, firsts = np.unique(dof_map, return_index=True)
        first[u_dofs] = firsts
        epd = ep[first]
        cA, cB = cidx[epd[:, 0]], cidx[epd[:, 1]]       # per P2 dof

        g = sim.geom
        Ke1 = em.element_elasticity(g.grad_lambda, g.volume, sim.D, 1)
        elem_c = cidx[np.asarray(mesh.F)]
        A1 = assembly.assemble_scipy(np.asarray(Ke1), elem_c, NC,
                                     d=d).tocsr()

        if free_mask is None:
            free_mask = ~np.asarray(sim.dirichlet_mask, bool)
        free = np.asarray(free_mask, bool).reshape(ND, d)
        free1 = free[cuniq]                             # [NC, d]

        pos_c = np.zeros((NC, mesh.node_positions.shape[1]))
        pos_c[cidx] = np.asarray(mesh.V)
        nm = 3 if d == 2 else 6
        agg_of, n_agg = _rcb_chunks(pos_c, agg_size)
        B = _rigid_modes(pos_c, d) * free1[:, :, None]  # masked rows
        Pblk, _ = _tentative_prolongator(B, agg_of, n_agg)
        P = _scipy_P(Pblk, agg_of, n_agg)
        Ac = (P.T @ A1 @ P).tocsr()
        Ad = np.asarray(Ac.todense())
        if shift_rel:
            shift = shift_rel * max(float(np.abs(Ad.diagonal()).mean()),
                                    1e-300)
            Ad = Ad + shift * np.eye(len(Ad))
        Cinv = np.linalg.pinv(Ad, rcond=1e-10, hermitian=True)

        # per-dof composed transfers in the DD's permuted+padded layout
        S, Nl = dd.n_shards, dd.Nl
        dt = dd.Ke_int.dtype
        aggA = np.zeros((S * Nl,), np.int32)
        aggB = np.zeros((S * Nl,), np.int32)
        WA = np.zeros((S * Nl, d, nm), dt)
        WB = np.zeros((S * Nl, d, nm), dt)
        new_of_old = dd.perm                            # old dof -> new
        aggA[new_of_old] = agg_of[cA]
        aggB[new_of_old] = agg_of[cB]
        # fine rows masked too: Pbar = M_free P (keeps the Galerkin chain
        # consistent with the masked coarse matrix)
        WA[new_of_old] = 0.5 * Pblk[cA] * free[:, :, None]
        WB[new_of_old] = 0.5 * Pblk[cB] * free[:, :, None]
        return cls(jnp.asarray(aggA.reshape(S, Nl)),
                   jnp.asarray(aggB.reshape(S, Nl)),
                   jnp.asarray(WA.reshape(S, Nl, d, nm)),
                   jnp.asarray(WB.reshape(S, Nl, d, nm)),
                   jnp.asarray(Cinv, dt), n_agg, nm)


@functools.lru_cache(maxsize=32)
def _dd_chunk_fn(mesh, axis, rhs_axis, S, Nl, H, K, d, n, use_block,
                 coarse_dims, routed, L):
    """Jitted shard_map running L CG iterations on carried state.
    ``coarse_dims``: None or (n_agg, nm) to enable the replicated
    aggregation-coarse correction (DDCoarse).  ``routed``: the per-shard
    operator is the ROUTED in-register SpMV (``parallel/routed_dd.py``,
    f32) instead of gather->einsum->segment_sum."""
    bspec = P(axis, None, None, rhs_axis)
    gspec = P(rhs_axis)

    def local(Ke_i, ld_i, Ke_b, ld_b, send, take, Minv, safe, free,
              aggA, aggB, WA, WB, Cinv, rsp,
              x, r, z, p, gamma):
        Ke_i, ld_i, Ke_b, ld_b, send, take, Minv, safe, free, \
            aggA, aggB, WA, WB, x, r, z, p \
            = (q[0] for q in (Ke_i, ld_i, Ke_b, ld_b, send, take, Minv,
                              safe, free, aggA, aggB, WA, WB, x, r, z, p))
        if routed:
            rsp_l = jax.tree_util.tree_map(lambda l: l[0], rsp)
        mloc = x.shape[-1]
        Ei, Eb = Ke_i.shape[0], Ke_b.shape[0]

        def spmv(u):                      # u [Nl, d, mloc] owned
            out_send = u[send.reshape(-1)].reshape(S, K, d, mloc)
            recv = jax.lax.all_to_all(out_send, axis, split_axis=0,
                                      concat_axis=0).reshape(S * K, d,
                                                             mloc)
            if routed:
                # per-shard routed apply on the halo-extended local
                # vector (interior/boundary combined: the all_to_all
                # completes before the contraction instead of
                # overlapping it)
                x_loc = jnp.concatenate([u, recv[take]])  # [Nl+H, d, m]
                cols = [rsp_l.local(rsp_l.gather, rsp_l.rung1,
                                    rsp_l.last_ids, rsp_l.KeB,
                                    x_loc[..., j])[:Nl]
                        for j in range(mloc)]
                return jnp.stack(cols, axis=-1)
            # interior elements: independent of the collective above —
            # XLA overlaps this compute with the all_to_all in flight
            ue_i = u[ld_i].reshape(Ei, n * d, mloc)
            fe_i = jnp.einsum("eij,ejm->eim", Ke_i, ue_i)
            acc = jax.ops.segment_sum(
                fe_i.reshape(Ei * n, d * mloc),
                ld_i.reshape(-1), num_segments=Nl).reshape(Nl, d, mloc)
            # boundary elements wait for the received halo rows
            x_loc = jnp.concatenate([u, recv[take]])     # [Nl + H, d, m]
            ue_b = x_loc[ld_b].reshape(Eb, n * d, mloc)
            fe_b = jnp.einsum("eij,ejm->eim", Ke_b, ue_b)
            acc_b = jax.ops.segment_sum(
                fe_b.reshape(Eb * n, d * mloc),
                ld_b.reshape(-1), num_segments=Nl + H)
            return acc + acc_b[:Nl].reshape(Nl, d, mloc)

        def dot(a, c):                    # per-column, psum over domain
            return jax.lax.psum(jnp.sum(a * c, axis=(0, 1)), axis)

        fm = free[..., None]
        proj = lambda v: v * fm
        if use_block:
            M_smooth = lambda v: proj(
                jnp.einsum("nab,nbm->nam", Minv, v))
        else:
            M_smooth = lambda v: proj(v / safe[..., None])
        if coarse_dims is not None:
            NA, nm = coarse_dims

            def coarse_corr(v):           # v [Nl, d, m] (free subspace)
                ca = jnp.einsum("nde,ndm->nem", WA, v)
                cb = jnp.einsum("nde,ndm->nem", WB, v)
                rc = jax.ops.segment_sum(ca, aggA, num_segments=NA) \
                    + jax.ops.segment_sum(cb, aggB, num_segments=NA)
                rc = jax.lax.psum(rc, axis)          # replicated [NA,nm,m]
                mloc2 = rc.shape[-1]
                xc = (Cinv @ rc.reshape(NA * nm, mloc2)).reshape(
                    NA, nm, mloc2)
                return jnp.einsum("nde,nem->ndm", WA, xc[aggA]) \
                    + jnp.einsum("nde,nem->ndm", WB, xc[aggB])

            M_apply = lambda v: M_smooth(v) + proj(coarse_corr(v))
        else:
            M_apply = M_smooth

        def body(state, _):
            x, r, z, p, gamma = state
            Ap = proj(spmv(p))
            den = dot(p, Ap)
            alpha = jnp.where((den != 0) & (gamma != 0),
                              gamma / jnp.where(den != 0, den, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M_apply(r)
            gamma_new = dot(r, z)
            beta = jnp.where(gamma != 0,
                             gamma_new / jnp.where(gamma != 0, gamma, 1.0),
                             0.0)
            p = z + beta * p
            return (x, r, z, p, gamma_new), None

        (x, r, z, p, gamma), _ = jax.lax.scan(
            body, (x, r, z, p, gamma), None, length=L)
        return x[None], r[None], z[None], p[None], gamma, dot(r, r)

    # check_vma=False: pallas_call (the routed per-shard kernels) cannot
    # declare varying-across-mesh info; the program is hand-verified SPMD
    kw = {}
    if routed:
        kw["check_vma"] = False
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis),) * 9 + (P(axis),) * 4 + (P(),)
                   + (P(axis),)
                   + (bspec,) * 4 + (gspec,),
                   out_specs=(bspec,) * 4 + (gspec, gspec), **kw)
    return jax.jit(fn)


def dd_cg_solve(mesh: Mesh, dd: DomainDecomposition, b, free_mask=None,
                iters: int = 50, axis: str = "e",
                rhs_axis: str | None = None, tol: float | None = None,
                precond: str = "jacobi", chunk: int | None = None,
                coarse: "DDCoarse | None" = None,
                routed_spmv=None):
    """Domain-decomposed PCG over ``mesh`` axis ``axis``.

    b [Nd, d] or [Nd, d, m] (original dof order); returns
    (u matching b's shape, resnorm2 [m] = final squared residual norms).
    With ``rhs_axis`` given, independent RHS columns are additionally
    sharded over that mesh axis (homogenization cell problems).

    ``precond``: 'jacobi' (point) or 'block' (exact per-node d x d
    blocks, assembled at build); pass ``coarse`` (a
    :class:`DDCoarse`) to ADD the replicated aggregation-coarse
    correction — the two-level preconditioner that keeps DD iteration
    counts bounded.  ``tol``: relative residual target —
    when given, the loop runs in ``chunk``-iteration dispatches with a
    host-side convergence/stagnation check between chunks (breakdown
    guards run per-iteration on device); when None, exactly ``iters``
    iterations run in one dispatch (bit-deterministic for the partition
    invariance tests).

    ``routed_spmv``: a :class:`~meshfem_tpu.parallel.routed_dd.
    RoutedShardSpMV` (from ``dd.build_routed()``) — the per-shard
    operator becomes the routed in-register SpMV (f32)."""
    S, Nl, H, K, d = dd.n_shards, dd.Nl, dd.H, dd.K, dd.d
    n = dd.ld_int.shape[2]
    dt = dd.Ke_int.dtype

    single = np.asarray(b).ndim == 2
    b = np.asarray(b, dt)
    if single:
        b = b[..., None]
    m = b.shape[-1]
    if rhs_axis is not None:
        bsh = mesh.shape[rhs_axis]
        m_pad = -(-m // bsh) * bsh
        if m_pad != m:
            b = np.concatenate(
                [b, np.zeros(b.shape[:-1] + (m_pad - m,), dt)], axis=-1)
    bs = dd.to_sharded(b)
    if free_mask is None:
        free = np.ones((dd.num_dofs, d))
    else:
        free = np.asarray(free_mask, np.float64).reshape(dd.num_dofs, d)
    fs = dd.to_sharded(free.astype(dt))

    use_block = precond == "block"
    if use_block:
        from ..solvers import precond as pc

        Minv = pc.block_jacobi_inv(
            dd.blocks_s.reshape(S * Nl, d, d),
            fs.reshape(S * Nl, d)).reshape(S, Nl, d, d).astype(dt)
    else:
        Minv = jnp.zeros((S, 1, d, d), dt)   # unused placeholder
    safe = jnp.where(dd.diag_s > 0, dd.diag_s, 1.0).astype(dt)

    eP = NamedSharding(mesh, P(axis))
    bspec = P(axis, None, None, rhs_axis)
    bP = NamedSharding(mesh, bspec)
    gP = NamedSharding(mesh, P(rhs_axis))
    rP = NamedSharding(mesh, P())
    if coarse is not None:
        coarse_dims = (coarse.n_agg, coarse.nm)
        cops = [jax.device_put(coarse.aggA, eP),
                jax.device_put(coarse.aggB, eP),
                jax.device_put(coarse.WA.astype(dt), eP),
                jax.device_put(coarse.WB.astype(dt), eP),
                jax.device_put(coarse.Cinv.astype(dt), rP)]
    else:
        coarse_dims = None
        cops = [jax.device_put(jnp.zeros((S, 1), jnp.int32), eP),
                jax.device_put(jnp.zeros((S, 1), jnp.int32), eP),
                jax.device_put(jnp.zeros((S, 1, d, 1), dt), eP),
                jax.device_put(jnp.zeros((S, 1, d, 1), dt), eP),
                jax.device_put(jnp.zeros((1, 1), dt), rP)]
    if routed_spmv is not None:
        rsp_ops = [jax.device_put(routed_spmv, eP)]
    else:
        # structural placeholder (scalar-leaf pytree is fine: the routed
        # branch is off, the arg is never touched)
        rsp_ops = [jax.device_put(jnp.zeros((S, 1), dt), eP)]
    ops = [jax.device_put(x, eP) for x in
           (dd.Ke_int, dd.ld_int, dd.Ke_bnd, dd.ld_bnd, dd.send_idx,
            dd.halo_take, Minv, safe, fs)] + cops + rsp_ops
    bs = jax.device_put(bs, bP)

    # initial state (global sharded ops — GSPMD handles the reduction);
    # z0 must apply the SAME preconditioner as the loop (CG consistency)
    fm = ops[8][..., None]
    r0 = bs * fm
    if use_block:
        z0 = jnp.einsum("snab,snbm->snam", ops[6].astype(dt), r0) * fm
    else:
        z0 = r0 / ops[7][..., None] * fm
    if coarse is not None:
        NA, nm = coarse_dims
        mb = r0.shape[-1]
        ca = jnp.einsum("snde,sndm->snem", ops[11], r0)
        cb = jnp.einsum("snde,sndm->snem", ops[12], r0)
        rc = jax.ops.segment_sum(
            ca.reshape(S * Nl, nm, mb), ops[9].reshape(-1),
            num_segments=NA) \
            + jax.ops.segment_sum(
                cb.reshape(S * Nl, nm, mb), ops[10].reshape(-1),
                num_segments=NA)
        xc = (ops[13] @ rc.reshape(NA * nm, mb)).reshape(NA, nm, mb)
        corr = jnp.einsum("snde,snem->sndm", ops[11],
                          xc[ops[9]]) \
            + jnp.einsum("snde,snem->sndm", ops[12], xc[ops[10]])
        z0 = z0 + corr * fm
    x0 = jnp.zeros_like(r0)
    gamma0 = jnp.sum(r0 * z0, axis=(0, 1, 2))
    state = (x0, r0, z0, z0, gamma0)
    b2 = np.maximum(np.asarray(jnp.sum(r0 * r0, axis=(0, 1, 2))), 1e-300)

    if tol is None:
        steps = [iters]
    else:
        c = chunk or min(256, max(iters, 1))
        steps = [min(c, iters - k) for k in range(0, iters, c)]

    res2 = np.zeros(b.shape[-1])
    best = np.inf
    stall = 0
    for L in steps:
        fn = _dd_chunk_fn(mesh, axis, rhs_axis, S, Nl, H, K, d, n,
                          use_block, coarse_dims,
                          routed_spmv is not None, L)
        *state, g, r2 = fn(*ops, *state)
        state = tuple(state) + (g,)
        res2 = np.asarray(r2)
        if tol is not None:
            rel2 = float((res2 / b2).max())
            if rel2 <= tol * tol:
                break
            # PCG residuals are non-monotone and can plateau transiently
            # across a chunk; only two consecutive chunks without any
            # improvement of the best-so-far mean roundoff-floor stall
            if rel2 >= best * 0.999:
                stall += 1
                if stall >= 2:
                    break
            else:
                stall = 0
            best = min(best, rel2)

    us = state[0]
    u = dd.from_sharded(us)[..., :m]
    res2 = jnp.asarray(res2[:m])
    if single:
        return u[..., 0], res2[0]
    return u, res2
