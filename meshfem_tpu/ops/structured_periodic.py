"""Periodic (torus) structured path: homogenization cells on Kuhn grids.

Periodic homogenization of voxel/grid microstructure cells — the Elastic
Textures production workload — identifies opposite faces, which turns
the (n+1)^3-vertex grid into an n^3 TORUS: every P2 dof is exactly one
(cell, channel) slot of an [n, n, n, 8, 3] channel tensor, and the
variable-material cell operator (``ops/structured_var.py``) needs only
WRAPPED corner slices instead of padded ones.  The exact-Galerkin
multigrid hierarchy carries over unchanged (nesting is independent of
both material and topology of the box): torus transfers are rolls, every
coarser torus is again a torus, and the only nullspace is the three
translations (projected in the outer CG; coarsest pseudo-inverse).

The result: microstructure cell problems whose iteration counts are
MG-bounded instead of O(sqrt(kappa)) — the role CHOLMOD's factorization
plays in the reference's ``PeriodicHomogenization.hh:48-53``.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..fem.flattening import flat_len, shear_doubler
from .structured import _CHANNEL_BITS, validate_kuhn_grid
from .structured_var import _cube_reference, check_grid_element_order
from .structured_mg import (P1Level, _p1_diag, _p1_gershgorin, _chebyshev,
                            _p1_cell_matrices_var, _coarsen_cell_matrices)

def _wrap_pad(ch):
    """Append the first plane after the last along the 3 spatial axes."""
    ch = jnp.concatenate([ch, ch[:1]], axis=0)
    ch = jnp.concatenate([ch, ch[:, :1]], axis=1)
    return jnp.concatenate([ch, ch[:, :, :1]], axis=2)


def _wrap_fold(padded):
    """Adjoint of :func:`_wrap_pad`: fold overflow planes back."""
    padded = padded.at[:, :, 0].add(padded[:, :, -1])[:, :, :-1]
    padded = padded.at[:, 0].add(padded[:, -1])[:, :-1]
    return padded.at[0].add(padded[-1])[:-1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PeriodicVarP2Elasticity:
    """P2 elasticity with per-tet materials on the PERIODIC Kuhn grid.

    Vectors are torus channel tensors [n, n, n, 8, 3]; ``to_channels`` /
    ``from_channels`` convert periodic-dof fields [Nd, 3] (the dof space
    of ``analysis.homogenization.periodic_simulator`` on a grid mesh)."""

    n3: tuple
    SDS: jnp.ndarray       # [ncells, 6, fl, fl]
    Bc: jnp.ndarray        # [6*Q*fl, 81]
    wv: jnp.ndarray        # [6, Q]
    dof_slot: jnp.ndarray  # [Nd] -> flat torus channel index
    num_dofs: int

    @classmethod
    def build(cls, mesh: FEMMesh, D_elems, dof_map, dtype=None
              ) -> "PeriodicVarP2Elasticity":
        n3, h3 = validate_kuhn_grid(mesh)
        check_grid_element_order(mesh, n3, h3)
        dt = dtype or jnp.float64
        fl = flat_len(3)
        slots, tet_nodes, B, wv = _cube_reference(h3)
        E = mesh.num_elements
        ncells = E // 6
        S = np.asarray(shear_doubler(3), np.float64)
        D = np.asarray(D_elems, np.float64).reshape(ncells, 6, fl, fl)
        SDS = S[None, None, :, None] * D * S[None, None, None, :]
        hot = np.zeros((6, 10, 27))
        for t in range(6):
            for a in range(10):
                hot[t, a, tet_nodes[t, a]] = 1.0
        Q = B.shape[1]
        Bc = np.einsum("tqanc,tnk->tqakc", B, hot).reshape(
            6 * Q * fl, 27 * 3)

        # periodic dof -> torus slot: representative node position mod L
        bb = mesh.bbox()
        dof_map = np.asarray(dof_map)
        Nd = int(dof_map.max()) + 1
        first = np.zeros(Nd, np.int64)
        uniq, firsts = np.unique(dof_map, return_index=True)
        first[uniq] = firsts
        qn = np.round(np.asarray(mesh.node_positions[first] - bb.min)
                      / (np.asarray(h3) / 2)).astype(np.int64)
        owner = (qn // 2) % np.asarray(n3)
        bits = qn % 2
        ch = np.asarray([_CHANNEL_BITS.index(tuple(b)) for b in bits],
                        dtype=np.int64)
        nx, ny, nz = n3
        dof_slot = ((owner[:, 0] * ny + owner[:, 1]) * nz
                    + owner[:, 2]) * 8 + ch
        assert len(np.unique(dof_slot)) == Nd == nx * ny * nz * 8, \
            "periodic dof space does not tile the torus"

        obj = cls(n3, jnp.asarray(SDS, dt), jnp.asarray(Bc, dt),
                  jnp.asarray(wv, dt), jnp.asarray(dof_slot), Nd)
        obj._slots = slots
        return obj

    def to_channels(self, u):
        nx, ny, nz = self.n3
        z = jnp.zeros((nx * ny * nz * 8, u.shape[-1]), dtype=u.dtype)
        return z.at[self.dof_slot].set(u).reshape(nx, ny, nz, 8,
                                                  u.shape[-1])

    def from_channels(self, ch):
        return ch.reshape(-1, ch.shape[-1])[self.dof_slot]

    def _gather_cells(self, ch):
        nx, ny, nz = self.n3
        w = _wrap_pad(ch)
        cols = [w[o[0]:o[0] + nx, o[1]:o[1] + ny, o[2]:o[2] + nz, c]
                for o, c in self._slots]
        return jnp.stack(cols, axis=3)

    def _scatter_cells(self, f27, dtype, m):
        nx, ny, nz = self.n3
        out = jnp.zeros((nx + 1, ny + 1, nz + 1, 8, m), dtype)
        for k, (o, c) in enumerate(self._slots):
            out = out.at[o[0]:o[0] + nx, o[1]:o[1] + ny,
                         o[2]:o[2] + nz, c].add(f27[..., k, :])
        return _wrap_fold(out)

    def apply_channels(self, ch):
        nx, ny, nz = self.n3
        nc = nx * ny * nz
        fl = self.SDS.shape[-1]
        Q = self.wv.shape[1]
        dt = ch.dtype
        u27 = self._gather_cells(ch).reshape(nc, 81)
        strain = (u27 @ self.Bc.astype(dt).T).reshape(nc, 6, Q, fl)
        stress = jnp.einsum("xtab,xtqb->xtqa", self.SDS.astype(dt),
                            strain) * self.wv.astype(dt)[None, :, :, None]
        f27 = (stress.reshape(nc, 6 * Q * fl)
               @ self.Bc.astype(dt)).reshape(nx, ny, nz, 27, 3)
        return self._scatter_cells(f27, dt, 3)

    def __call__(self, u):
        return self.from_channels(self.apply_channels(self.to_channels(u)))

    def diagonal_channels(self):
        dt = self.SDS.dtype
        nx, ny, nz = self.n3
        nc = nx * ny * nz
        fl = self.SDS.shape[-1]
        Q = self.wv.shape[1]
        Bq = self.Bc.reshape(6, Q, fl, 27, 3)
        d27 = jnp.einsum("tqakc,xtab,tqbkc->xkc",
                         Bq * self.wv[:, :, None, None, None],
                         self.SDS, Bq).reshape(nx, ny, nz, 27, 3)
        return self._scatter_cells(d27, dt, 3)

    def tree_flatten(self):
        return ((self.SDS, self.Bc, self.wv, self.dof_slot),
                (self.n3, self.num_dofs, tuple(self._slots)))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = cls(aux[0], *ch, aux[1])
        obj._slots = list(aux[2])
        return obj


# ---------------------------------------------------------------------------
# Torus P1 level + transfers (rolls instead of pads)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TorusP1Level:
    """P1 level on the n^3 torus with per-cell [24, 24] matrices."""

    n3: tuple
    Kc: jnp.ndarray        # [nx, ny, nz, 24, 24]
    diag: jnp.ndarray      # [nx, ny, nz, 3]

    def apply(self, v):
        nx, ny, nz = self.n3
        w = _wrap_pad(v)
        cell = jnp.concatenate(
            [w[bx:bx + nx, by:by + ny, bz:bz + nz]
             for bx, by, bz in _CHANNEL_BITS], axis=-1)
        f = jnp.einsum("xyzj,xyzij->xyzi", cell, self.Kc.astype(v.dtype))
        out = jnp.zeros((nx + 1, ny + 1, nz + 1, 3), v.dtype)
        for i, (bx, by, bz) in enumerate(_CHANNEL_BITS):
            out = out.at[bx:bx + nx, by:by + ny, bz:bz + nz].add(
                f[..., 3 * i:3 * i + 3])
        return _wrap_fold(out)

    def tree_flatten(self):
        return (self.Kc, self.diag), (self.n3,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(aux[0], *ch)


def _torus_p1_diag(n3, Kc):
    nx, ny, nz = n3
    d = np.zeros((nx + 1, ny + 1, nz + 1, 3))
    kd = np.diagonal(np.asarray(Kc), axis1=-2, axis2=-1).reshape(
        nx, ny, nz, 8, 3)
    for i, (bx, by, bz) in enumerate(_CHANNEL_BITS):
        d[bx:bx + nx, by:by + ny, bz:bz + nz] += kd[..., i, :]
    d[:, :, 0] += d[:, :, -1]
    d[:, 0] += d[:, -1]
    d[0] += d[-1]
    return d[:nx, :ny, :nz]


def _roll(v, b, sign):
    return jnp.roll(v, shift=(-sign * b[0], -sign * b[1], -sign * b[2]),
                    axis=(0, 1, 2))


def torus_prolong_p2(v):
    """Torus vertex field [n, n, n, 3] -> channels [n, n, n, 8, 3]."""
    chs = [v]
    for b in _CHANNEL_BITS[1:]:
        chs.append(0.5 * (v + _roll(v, b, +1)))
    return jnp.stack(chs, axis=3)


def torus_restrict_p2(u):
    out = u[..., 0, :]
    for i, b in enumerate(_CHANNEL_BITS[1:], start=1):
        ub = u[..., i, :]
        out = out + 0.5 * (ub + _roll(ub, b, -1))
    return out


def torus_prolong_h(vc):
    """Torus (mx, my, mz) -> torus (2mx, 2my, 2mz):
    fine[2c + b] = (v[c] + v[c + b]) / 2."""
    mx, my, mz = vc.shape[:3]
    classes = [vc if b == (0, 0, 0) else 0.5 * (vc + _roll(vc, b, +1))
               for b in [(bx, by, bz) for bx in (0, 1) for by in (0, 1)
                         for bz in (0, 1)]]
    z = jnp.stack(classes, axis=0).reshape(2, 2, 2, mx, my, mz, 3)
    return z.transpose(3, 0, 4, 1, 5, 2, 6).reshape(2 * mx, 2 * my,
                                                    2 * mz, 3)


def torus_restrict_h(rf):
    mx, my, mz = (rf.shape[0] // 2, rf.shape[1] // 2, rf.shape[2] // 2)
    z = rf.reshape(mx, 2, my, 2, mz, 2, 3).transpose(1, 3, 5, 0, 2, 4, 6)
    out = z[0, 0, 0]
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                if bx == by == bz == 0:
                    continue
                ub = z[bx, by, bz]
                out = out + 0.5 * (ub + _roll(ub, (bx, by, bz), -1))
    return out


# ---------------------------------------------------------------------------
# Periodic variable-material multigrid
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PeriodicVarMG:
    """V-cycle preconditioner for periodic cell problems on Kuhn grids
    with per-element materials.  Nullspace (3 translations) is handled by
    mean projection in the caller's CG and the coarsest pseudo-inverse."""

    fine: PeriodicVarP2Elasticity
    fine_diag: jnp.ndarray
    levels: tuple          # of TorusP1Level
    coarse_inv: jnp.ndarray | None
    lam: tuple
    nu: int
    _coarse_lu: object = None

    @classmethod
    def build(cls, mesh: FEMMesh, D_elems, dof_map, *, nu: int = 3,
              dense_cap: int = 4096, dtype=None) -> "PeriodicVarMG":
        dt = dtype or jnp.float64
        op = PeriodicVarP2Elasticity.build(mesh, D_elems, dof_map,
                                           dtype=dt)
        n3 = tuple(int(c) for c in op.n3)
        fine_diag = op.diagonal_channels().astype(dt)

        def dofs(nn):
            return nn[0] * nn[1] * nn[2] * 3

        chain = [n3]
        while (all(c % 2 == 0 for c in chain[-1]) and min(chain[-1]) >= 4
               and dofs(chain[-1]) > dense_cap):
            chain.append(tuple(c // 2 for c in chain[-1]))

        Kc = _p1_cell_matrices_var(mesh, D_elems)
        levels = []
        for li, ln in enumerate(chain):
            if li > 0:
                Kc = _coarsen_cell_matrices(Kc)
            diag = _torus_p1_diag(ln, Kc)
            levels.append(TorusP1Level(ln, jnp.asarray(Kc, dt),
                                       jnp.asarray(diag, dt)))

        # coarsest: dense pseudo-inverse (translations are singular)
        # when small; otherwise host SuperLU on the 3-dof-pinned matrix
        # through pure_callback (odd extents stop the dyadic chain early)
        nl = levels[-1].n3
        Ncd = nl[0] * nl[1] * nl[2] * 3
        coarse_inv = None
        coarse_lu = None
        if Ncd <= dense_cap:
            Ac = cls._coarse_matrix_torus(np.asarray(levels[-1].Kc,
                                                     np.float64))
            coarse_inv = jnp.asarray(np.linalg.pinv(Ac, hermitian=True),
                                     dt)
        else:
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            Ac = sp.csr_matrix(cls._coarse_matrix_torus_sparse(
                np.asarray(levels[-1].Kc, np.float64)))
            m = np.ones(Ncd)
            m[:3] = 0.0                    # pin vertex 0 (translations)
            M = sp.diags(m)
            lu = spla.splu((M @ Ac @ M + sp.diags(1.0 - m)).tocsc())

            def coarse_solve(r):
                flat = np.asarray(r, np.float64).reshape(-1) * m
                out = lu.solve(flat) * m
                return out.reshape(r.shape).astype(np.asarray(r).dtype)

            coarse_lu = coarse_solve

        obj = cls(op, fine_diag, tuple(levels), coarse_inv,
                  (1.0,) * (1 + len(levels)), nu, coarse_lu)
        lam = [obj._lam_fine()]
        for lvl in levels:
            lam.append(_torus_gershgorin(lvl))
        obj.lam = tuple(lam)
        return obj

    @staticmethod
    def _coarse_matrix_torus_sparse(Kc):
        import scipy.sparse as sp

        nx, ny, nz = Kc.shape[:3]
        N = nx * ny * nz * 3
        corners = np.asarray(_CHANNEL_BITS)
        cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                     np.arange(nz), indexing="ij"),
                         axis=-1).reshape(-1, 3)
        gid = (((cells[:, None, 0] + corners[None, :, 0]) % nx) * ny
               + ((cells[:, None, 1] + corners[None, :, 1]) % ny)) * nz             + ((cells[:, None, 2] + corners[None, :, 2]) % nz)
        dof = (gid[:, :, None] * 3 + np.arange(3)).reshape(-1, 24)
        rows = np.repeat(dof, 24, axis=1).reshape(-1)
        cols = np.tile(dof, (1, 24)).reshape(-1)
        vals = np.asarray(Kc, np.float64).reshape(-1)
        return sp.coo_matrix((vals, (rows, cols)), shape=(N, N))

    @staticmethod
    def _coarse_matrix_torus(Kc):
        nx, ny, nz = Kc.shape[:3]
        N = nx * ny * nz * 3
        A = np.zeros((N, N))
        corners = np.asarray(_CHANNEL_BITS)
        cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                     np.arange(nz), indexing="ij"),
                         axis=-1).reshape(-1, 3)
        gid = (((cells[:, None, 0] + corners[None, :, 0]) % nx) * ny
               + ((cells[:, None, 1] + corners[None, :, 1]) % ny)) * nz \
            + ((cells[:, None, 2] + corners[None, :, 2]) % nz)
        dof = (gid[:, :, None] * 3 + np.arange(3)).reshape(-1, 24)
        Kf = np.asarray(Kc, np.float64).reshape(-1, 24, 24)
        for c in range(len(cells)):
            A[np.ix_(dof[c], dof[c])] += Kf[c]
        return A

    def _lam_fine(self):
        op = self.fine
        nx, ny, nz = op.n3
        fl = op.SDS.shape[-1]
        Q = op.wv.shape[1]
        aB = jnp.abs(op.Bc).reshape(6, Q, fl, 27, 3)
        z = jnp.einsum("tqakc->tqa", aB)
        rs27 = jnp.einsum("tqakc,xtab,tqb->xkc",
                          aB * op.wv[:, :, None, None, None],
                          jnp.abs(op.SDS), z).reshape(nx, ny, nz, 27, 3)
        rs = op._scatter_cells(rs27, rs27.dtype, 3)
        diag = np.asarray(self.fine_diag, np.float64)
        r = np.asarray(rs) / np.maximum(diag, 1e-30)
        return float(r.max()) * 1.02

    def _cycle(self, i, r):
        lvl = self.levels[i]
        if i == len(self.levels) - 1:
            if self.coarse_inv is not None:
                flat = r.reshape(-1)
                return (self.coarse_inv.astype(r.dtype) @ flat).reshape(
                    r.shape)
            return jax.pure_callback(
                self._coarse_lu, jax.ShapeDtypeStruct(r.shape, r.dtype),
                r, vmap_method="sequential")
        S = _chebyshev(lvl.apply, lvl.diag,
                       jnp.ones((), r.dtype), self.lam[1 + i], self.nu)
        x = S(r)
        res = r - lvl.apply(x)
        xc = self._cycle(i + 1, torus_restrict_h(res))
        x = x + torus_prolong_h(xc)
        return x + S(r - lvl.apply(x))

    def precondition(self, r_ch):
        """Torus channel residual -> correction (HIGHEST precision; see
        StructuredMG.precondition for why bf16 breaks MG-CG)."""
        with jax.default_matmul_precision("highest"):
            S = _chebyshev(self.fine.apply_channels, self.fine_diag,
                           jnp.ones((), r_ch.dtype), self.lam[0], self.nu)
            x = S(r_ch)
            res = r_ch - self.fine.apply_channels(x)
            xc = self._cycle(0, torus_restrict_p2(res))
            x = x + torus_prolong_p2(xc)
            return x + S(r_ch - self.fine.apply_channels(x))

    def tree_flatten(self):
        return ((self.fine, self.fine_diag, self.levels,
                 self.coarse_inv),
                (self.lam, self.nu))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0], aux[1])


def _torus_gershgorin(lvl: TorusP1Level) -> float:
    nx, ny, nz = lvl.n3
    rs = np.zeros((nx + 1, ny + 1, nz + 1, 3))
    ka = np.abs(np.asarray(lvl.Kc, np.float64)).sum(axis=-1).reshape(
        nx, ny, nz, 8, 3)
    for i, (bx, by, bz) in enumerate(_CHANNEL_BITS):
        rs[bx:bx + nx, by:by + ny, bz:bz + nz] += ka[..., i, :]
    rs[:, :, 0] += rs[:, :, -1]
    rs[:, 0] += rs[:, -1]
    rs[0] += rs[-1]
    rs = rs[:nx, :ny, :nz]
    diag = np.asarray(lvl.diag, np.float64)
    return float((rs / np.maximum(diag, 1e-30)).max()) * 1.02


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def _periodic_mg_cg(mg, bc, tol, maxiter):
    """Jitted MG-PCG on the torus; translations projected by per-column
    mean subtraction."""
    from ..solvers import cg as cg_mod

    with jax.default_matmul_precision("highest"):
        def project(v):
            return v - jnp.mean(v, axis=(0, 1, 2, 3), keepdims=True)

        res = cg_mod.cg(mg.fine.apply_channels, project(bc),
                        M_inv=mg.precondition, project=project,
                        tol=tol, maxiter=maxiter)
        return res.x, res.iters, res.resnorm


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def _periodic_mg_cg_block(mg, Bc, tol, maxiter):
    """All fl cell problems in ONE block CG: the torus operator and the
    V-cycle are linear, so they batch over a trailing RHS axis via vmap
    (batched convs/matmuls — the applies amortize across columns)."""
    from ..solvers import cg as cg_mod

    with jax.default_matmul_precision("highest"):
        A_blk = jax.vmap(mg.fine.apply_channels, in_axes=-1, out_axes=-1)
        M_blk = jax.vmap(mg.precondition, in_axes=-1, out_axes=-1)

        def project(v):
            return v - jnp.mean(v, axis=(0, 1, 2, 3), keepdims=True)

        return cg_mod.cg_block(A_blk, project(Bc), M_inv=M_blk,
                               project=project, tol=tol, maxiter=maxiter)


def solve_cell_problems_grid(sim, mg: PeriodicVarMG | None = None,
                             tol: float = 1e-10, maxiter: int = 300):
    """MG-preconditioned periodic cell problems for a GRID simulator
    (drop-in for ``analysis.homogenization.solve_cell_problems`` when the
    mesh is a Kuhn grid).  All fl right-hand sides solve in ONE block CG
    with the vmapped V-cycle.  Returns (w [fl, N, dim], iters list)."""
    from ..analysis.homogenization import canonical_strain

    dim = sim.dim
    fl = flat_len(dim)
    if mg is None:
        D = sim.D
        if getattr(D, "ndim", 0) == 2:
            D = jnp.broadcast_to(D, (sim.mesh.num_elements,) + D.shape)
        mg = PeriodicVarMG.build(sim.mesh, D, sim.dof_map,
                                 dtype=sim.Ke.dtype)
    Bc = jnp.stack([mg.fine.to_channels(sim.constant_strain_load(
        -canonical_strain(dim, i, sim.Ke.dtype))) for i in range(fl)],
        axis=-1)
    res = _periodic_mg_cg_block(mg, Bc, tol, maxiter)
    w = jnp.stack([mg.fine.from_channels(res.x[..., i])
                   for i in range(fl)])[:, jnp.asarray(sim.dof_map)]
    return w, [int(res.iters)] * fl
