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
  halo rows (O(halo) = O((Nd/S)^(2/3)) per pair, not O(Nd)), then a purely
  local gather -> batched einsum -> segment_sum;
* CG scalars (dot products) are the only ``psum``s.

The replicated path (``parallel.sharded``) remains the small-problem
fallback.  Reference analog: TBB thread-local assembly
(``ParallelAssembly.hh:42-100``) — here the "threads" are chips.
"""

from __future__ import annotations

import dataclasses

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
    Ke_s: jnp.ndarray      # [S, Es, nd, nd]
    ldofs_s: jnp.ndarray   # [S, Es, n] -> local rows in [0, Nl + H)
    send_idx: jnp.ndarray  # [S, S, K] local OWNED rows to ship to each dst
    halo_take: jnp.ndarray  # [S, H] rows into the [S*K] recv buffer
    diag_s: jnp.ndarray    # [S, Nl, d] owned operator diagonal
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

        Es = max(len(e) for e in shard_elems)
        H = max((len(h) for h in shard_halo), default=1)
        H = max(H, 1)
        counts = np.zeros((S, S), dtype=np.int64)
        for (src, dst), rows in halo_by_pair.items():
            counts[src, dst] = len(rows)
        K = max(int(counts.max()), 1)

        Ke_s = np.zeros((S, Es, nd, nd), Ke.dtype)
        ldofs_s = np.zeros((S, Es, n), np.int32)
        send_idx = np.zeros((S, S, K), np.int32)
        halo_take = np.zeros((S, H), np.int32)
        diag_s = np.zeros((S, Nl, d), Ke.dtype)

        # permuted global diagonal (f64 host accumulation)
        diag_full = np.zeros((S * Nl, d))
        de = np.einsum("eii->ei", Ke).reshape(E, n, d)
        np.add.at(diag_full, new_ed.reshape(-1),
                  de.reshape(E * n, d))

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
            Ke_s[s, :len(elems)] = Ke[elems]
            ldofs_s[s, :len(elems)] = loc
            diag_s[s] = diag_full[lo:lo + Nl]
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

        return cls(S, num_dofs, Nl, H, K, d, perm,
                   jnp.asarray(Ke_s), jnp.asarray(ldofs_s),
                   jnp.asarray(send_idx), jnp.asarray(halo_take),
                   jnp.asarray(diag_s), counts)

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


def dd_cg_solve(mesh: Mesh, dd: DomainDecomposition, b, free_mask=None,
                iters: int = 50, axis: str = "e", rhs_axis: str | None = None):
    """Domain-decomposed block Jacobi-PCG over ``mesh`` axis ``axis``.

    b [Nd, d] or [Nd, d, m] (original dof order); returns
    (u matching b's shape, resnorm2 [m]).  The whole CG loop runs inside
    ONE jitted shard_map: per iteration, one all_to_all of halo rows over
    the domain axis + two scalar-block psums.  With ``rhs_axis`` given,
    independent RHS columns are additionally sharded over that mesh axis
    (homogenization cell problems / eigensolver blocks)."""
    S, Nl, H, K, d = dd.n_shards, dd.Nl, dd.H, dd.K, dd.d
    n = dd.ldofs_s.shape[2]
    dt = dd.Ke_s.dtype

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

    eP = NamedSharding(mesh, P(axis))
    bspec = P(axis, None, None, rhs_axis)
    args = [jax.device_put(x, eP) for x in
            (dd.Ke_s, dd.ldofs_s, dd.send_idx, dd.halo_take, dd.diag_s, fs)]
    bs = jax.device_put(bs, NamedSharding(mesh, bspec))

    def local(Ke, ldofs, send, take, diag, free, b):
        # shard_map blocks keep a leading dim of 1 on the domain axis
        Ke, ldofs, send, take, diag, free, b = (
            x[0] for x in (Ke, ldofs, send, take, diag, free, b))
        Es = Ke.shape[0]
        mloc = b.shape[-1]

        def spmv(u):                      # u [Nl, d, mloc] owned
            out_send = u[send.reshape(-1)].reshape(S, K, d, mloc)
            recv = jax.lax.all_to_all(out_send, axis, split_axis=0,
                                      concat_axis=0).reshape(S * K, d, mloc)
            x_loc = jnp.concatenate([u, recv[take]])     # [Nl + H, d, m]
            ue = x_loc[ldofs].reshape(Es, n * d, mloc)
            fe = jnp.einsum("eij,ejm->eim", Ke, ue)
            out = jax.ops.segment_sum(
                fe.reshape(Es, n, d, mloc).reshape(Es * n, d * mloc),
                ldofs.reshape(-1), num_segments=Nl + H)
            return out[:Nl].reshape(Nl, d, mloc)

        def dot(a, c):                    # per-column, psum over domain
            return jax.lax.psum(jnp.sum(a * c, axis=(0, 1)), axis)

        safe = jnp.where(diag > 0, diag, 1.0).astype(dt)[..., None]
        fm = free[..., None]
        proj = lambda v: v * fm

        b0 = proj(b)
        x = jnp.zeros_like(b0)
        r = b0
        z = proj(r / safe)
        gamma = dot(r, z)

        def body(state, _):
            x, r, z, p, gamma = state
            Ap = proj(spmv(p))
            den = dot(p, Ap)
            alpha = gamma / jnp.where(den != 0, den, 1.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = proj(r / safe)
            gamma_new = dot(r, z)
            beta = gamma_new / jnp.where(gamma != 0, gamma, 1.0)
            p = z + beta * p
            return (x, r, z, p, gamma_new), None

        (x, r, *_), _ = jax.lax.scan(body, (x, r, z, z, gamma), None,
                                     length=iters)
        return x[None], dot(r, r)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis),) * 6 + (bspec,),
                   out_specs=(bspec, P(rhs_axis)))
    us, res2 = jax.jit(fn)(*args, bs)
    u = dd.from_sharded(us)[..., :m]
    res2 = res2[:m]
    if single:
        return u[..., 0], res2[0]
    return u, res2
