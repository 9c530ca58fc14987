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


@functools.lru_cache(maxsize=32)
def _dd_chunk_fn(mesh, axis, rhs_axis, S, Nl, H, K, d, n, use_block, L):
    """Jitted shard_map running L CG iterations on carried state."""
    bspec = P(axis, None, None, rhs_axis)
    gspec = P(rhs_axis)

    def local(Ke_i, ld_i, Ke_b, ld_b, send, take, Minv, safe, free,
              x, r, z, p, gamma):
        Ke_i, ld_i, Ke_b, ld_b, send, take, Minv, safe, free, x, r, z, p \
            = (q[0] for q in (Ke_i, ld_i, Ke_b, ld_b, send, take, Minv,
                              safe, free, x, r, z, p))
        mloc = x.shape[-1]
        Ei, Eb = Ke_i.shape[0], Ke_b.shape[0]

        def spmv(u):                      # u [Nl, d, mloc] owned
            out_send = u[send.reshape(-1)].reshape(S, K, d, mloc)
            recv = jax.lax.all_to_all(out_send, axis, split_axis=0,
                                      concat_axis=0).reshape(S * K, d,
                                                             mloc)
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
            M_apply = lambda v: proj(
                jnp.einsum("nab,nbm->nam", Minv, v))
        else:
            M_apply = lambda v: proj(v / safe[..., None])

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

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis),) * 9 + (bspec,) * 4 + (gspec,),
                   out_specs=(bspec,) * 4 + (gspec, gspec))
    return jax.jit(fn)


def dd_cg_solve(mesh: Mesh, dd: DomainDecomposition, b, free_mask=None,
                iters: int = 50, axis: str = "e",
                rhs_axis: str | None = None, tol: float | None = None,
                precond: str = "jacobi", chunk: int | None = None):
    """Domain-decomposed PCG over ``mesh`` axis ``axis``.

    b [Nd, d] or [Nd, d, m] (original dof order); returns
    (u matching b's shape, resnorm2 [m] = final squared residual norms).
    With ``rhs_axis`` given, independent RHS columns are additionally
    sharded over that mesh axis (homogenization cell problems).

    ``precond``: 'jacobi' (point) or 'block' (exact per-node d x d
    blocks, assembled at build).  ``tol``: relative residual target —
    when given, the loop runs in ``chunk``-iteration dispatches with a
    host-side convergence/stagnation check between chunks (breakdown
    guards run per-iteration on device); when None, exactly ``iters``
    iterations run in one dispatch (bit-deterministic for the partition
    invariance tests)."""
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
    ops = [jax.device_put(x, eP) for x in
           (dd.Ke_int, dd.ld_int, dd.Ke_bnd, dd.ld_bnd, dd.send_idx,
            dd.halo_take, Minv, safe, fs)]
    bs = jax.device_put(bs, bP)

    # initial state (global sharded ops — GSPMD handles the reduction)
    fm = ops[8][..., None]
    r0 = bs * fm
    if use_block:
        z0 = jnp.einsum("snab,snbm->snam", ops[6].astype(dt), r0) * fm
    else:
        z0 = r0 / ops[7][..., None] * fm
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
                          use_block, L)
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
