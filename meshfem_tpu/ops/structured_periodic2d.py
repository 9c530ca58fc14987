"""2D pixel-cell periodic structured path: plane homogenization on tori.

The 2D mirror of ``ops/structured_periodic.py`` for PIXEL design cells
(`grid_tri(n, n, diagonal="right")`): each pixel is two right triangles
sharing the (1,0)-(0,1) anti-diagonal, the periodic P2 dof space is an
[n, n, 4, 2] channel torus (4 half-grid parity classes), element
stiffnesses factor through one fixed [2*Q*3, 18] strain matrix with
per-triangle [3, 3] materials, and the exact-Galerkin multigrid chain
(P2 -> P1 -> dyadic P1 tori, per-pixel [8, 8] matrices) mirrors 3D —
uniform-diagonal grids are self-similar under 2:1 refinement just like
Kuhn grids, with the midpoint rule reading each class's true edge
endpoints (the (1,1) half-grid point is the ANTI-diagonal's midpoint).

Reference roles: 2D periodic homogenization
(``PeriodicHomogenization.hh``), per-element materials
(``MaterialField.hh``).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..mesh import generators
from ..fem.flattening import flat_len, shear_doubler
from .structured_mg import _chebyshev

_BITS2 = [(0, 0), (1, 0), (0, 1), (1, 1)]
# Edge endpoints (as corner offsets of the owning pixel) for each nonzero
# midpoint class.  grid_tri's uniform split uses the ANTI-diagonal
# (1,0)-(0,1), so the (1,1) half-grid point is ITS midpoint.
_EDGE2 = {1: ((0, 0), (1, 0)),
          2: ((0, 0), (0, 1)),
          3: ((1, 0), (0, 1))}


def validate_pixel_grid(mesh: FEMMesh):
    """(n2, h2) for a right-diagonal triangulated pixel grid; raises
    ValueError otherwise (counts, lattice positions, uniform diagonal)."""
    if mesh.K != 2 or mesh.degree != 2:
        raise ValueError("2D structured path supports P2 triangles")
    bb = mesh.bbox()
    Vv = np.asarray(mesh.V)
    n2 = tuple(len(np.unique(np.round(Vv[:, a], 9))) - 1 for a in range(2))
    if min(n2) < 1:
        raise ValueError("not a pixel grid (degenerate axis)")
    h2 = tuple(float(bb.dimensions[a]) / n2[a] for a in range(2))
    nv2 = np.asarray(n2)
    if mesh.num_vertices != int(np.prod(nv2 + 1)) \
            or mesh.num_elements != 2 * int(np.prod(nv2)):
        raise ValueError("not a pixel grid (count mismatch)")
    q = (Vv - np.asarray(bb.min)) / np.asarray(h2)
    qi = np.round(q)
    if np.abs(q - qi).max() > 1e-6:
        raise ValueError("not a pixel grid (vertices off lattice)")
    tq = qi[np.asarray(mesh.F)].astype(np.int64)
    bits = tq - tq.min(axis=1, keepdims=True)
    if bits.min() < 0 or bits.max() > 1:
        raise ValueError("not a pixel grid (element spans cells)")
    # uniform anti-diagonal split (grid_tri 'right'): triangle corner
    # sets {00, 10, 01} and {10, 11, 01}
    keys = np.sort(bits[:, :, 0] * 2 + bits[:, :, 1], axis=1)
    ok = ((keys == np.asarray([0, 1, 2])).all(axis=1)
          | (keys == np.asarray([1, 2, 3])).all(axis=1))
    if not ok.all():
        raise ValueError("not a uniform pixel grid (use "
                         "grid_tri(..., diagonal='right'))")
    return n2, h2


def check_pixel_element_order(mesh, n2, h2):
    """Raise unless elements are in grid_tri order (pixel-major C-order,
    2 reference triangle slots per pixel) — the per-element material
    pairing depends on it."""
    bb = mesh.bbox()
    Vv = np.asarray(mesh.V)
    q = np.round((Vv - np.asarray(bb.min)) / np.asarray(h2)).astype(
        np.int64)
    tq = q[np.asarray(mesh.F)]
    cmin = tq.min(axis=1)
    cidx = cmin[:, 0] * n2[1] + cmin[:, 1]
    E = len(tq)
    if not np.array_equal(cidx, np.repeat(np.arange(E // 2), 2)):
        raise ValueError("elements are not in grid_tri order (pixel-"
                         "major C-order)")
    bits = tq - cmin[:, None, :]
    keys = np.sort(bits[:, :, 0] * 2 + bits[:, :, 1], axis=1)
    Vr, Tr = generators.grid_tri(1, 1, diagonal="right")
    qr = np.round(Vr).astype(np.int64)[Tr]
    ref = np.sort(qr[:, :, 0] * 2 + qr[:, :, 1], axis=1)
    if not np.array_equal(keys.reshape(E // 2, 2, 3),
                          np.broadcast_to(ref, (E // 2, 2, 3))):
        raise ValueError("pixel-local triangle slots do not match the "
                         "grid_tri reference pattern order")


def _pixel_reference(h2):
    from ..fem import quadrature
    from . import element_matrices as em

    V, T = generators.grid_tri(1, 1, hi=tuple(h2), diagonal="right")
    mesh = FEMMesh(V, T, degree=2)
    assert mesh.num_nodes == 9
    g = mesh.geometry()
    q = np.round(np.asarray(mesh.node_positions)
                 / (np.asarray(h2) / 2)).astype(int)
    slots = [(tuple(q[i] // 2), _BITS2.index(tuple(q[i] % 2)))
             for i in range(9)]
    pts, w = quadrature.rule_np(2, 2)
    B = np.asarray(em.element_strain_matrix(g.grad_lambda, 2, pts))
    wv = np.asarray(w)[None, :] * np.asarray(g.volume)[:, None]
    hot = np.zeros((2, 6, 9))
    for t in range(2):
        for a in range(6):
            hot[t, a, mesh.elem_nodes[t, a]] = 1.0
    Q = B.shape[1]
    fl = flat_len(2)
    Bc = np.einsum("tqanc,tnk->tqakc", B, hot).reshape(2 * Q * fl, 18)
    return slots, Bc, wv, mesh


def _wrap_pad2(ch):
    ch = jnp.concatenate([ch, ch[:1]], axis=0)
    return jnp.concatenate([ch, ch[:, :1]], axis=1)


def _wrap_fold2(p):
    p = p.at[:, 0].add(p[:, -1])[:, :-1]
    return p.at[0].add(p[-1])[:-1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PeriodicVarP2Elasticity2D:
    """2D P2 plane elasticity with per-triangle materials on the periodic
    pixel grid; vectors are [n, n, 4, 2] channel tori."""

    n2: tuple
    SDS: jnp.ndarray       # [npix, 2, 3, 3]
    Bc: jnp.ndarray        # [2*Q*3, 18]
    wv: jnp.ndarray        # [2, Q]
    dof_slot: jnp.ndarray  # [Nd]
    num_dofs: int

    @classmethod
    def build(cls, mesh: FEMMesh, D_elems, dof_map, dtype=None
              ) -> "PeriodicVarP2Elasticity2D":
        n2, h2 = validate_pixel_grid(mesh)
        check_pixel_element_order(mesh, n2, h2)
        dt = dtype or jnp.float64
        fl = flat_len(2)
        slots, Bc, wv, _ = _pixel_reference(h2)
        npix = mesh.num_elements // 2
        S = np.asarray(shear_doubler(2), np.float64)
        D = np.asarray(D_elems, np.float64).reshape(npix, 2, fl, fl)
        SDS = S[None, None, :, None] * D * S[None, None, None, :]

        bb = mesh.bbox()
        dof_map = np.asarray(dof_map)
        Nd = int(dof_map.max()) + 1
        first = np.zeros(Nd, np.int64)
        uniq, firsts = np.unique(dof_map, return_index=True)
        first[uniq] = firsts
        qn = np.round(np.asarray(mesh.node_positions[first] - bb.min)
                      / (np.asarray(h2) / 2)).astype(np.int64)
        owner = (qn // 2) % np.asarray(n2)
        ch = np.asarray([_BITS2.index(tuple(b)) for b in qn % 2],
                        dtype=np.int64)
        nx, ny = n2
        dof_slot = (owner[:, 0] * ny + owner[:, 1]) * 4 + ch
        assert len(np.unique(dof_slot)) == Nd == nx * ny * 4, \
            "periodic dof space does not tile the 2D torus"
        obj = cls(n2, jnp.asarray(SDS, dt), jnp.asarray(Bc, dt),
                  jnp.asarray(wv, dt), jnp.asarray(dof_slot), Nd)
        obj._slots = slots
        return obj

    def to_channels(self, u):
        nx, ny = self.n2
        z = jnp.zeros((nx * ny * 4, u.shape[-1]), dtype=u.dtype)
        return z.at[self.dof_slot].set(u).reshape(nx, ny, 4, u.shape[-1])

    def from_channels(self, ch):
        return ch.reshape(-1, ch.shape[-1])[self.dof_slot]

    def _gather_cells(self, ch):
        nx, ny = self.n2
        w = _wrap_pad2(ch)
        cols = [w[o[0]:o[0] + nx, o[1]:o[1] + ny, c]
                for o, c in self._slots]
        return jnp.stack(cols, axis=2)                  # [nx, ny, 9, 2]

    def _scatter_cells(self, f9, dtype, m):
        nx, ny = self.n2
        out = jnp.zeros((nx + 1, ny + 1, 4, m), dtype)
        for k, (o, c) in enumerate(self._slots):
            out = out.at[o[0]:o[0] + nx, o[1]:o[1] + ny, c].add(
                f9[..., k, :])
        return _wrap_fold2(out)

    def apply_channels(self, ch):
        nx, ny = self.n2
        nc = nx * ny
        fl = self.SDS.shape[-1]
        Q = self.wv.shape[1]
        dt = ch.dtype
        u9 = self._gather_cells(ch).reshape(nc, 18)
        strain = (u9 @ self.Bc.astype(dt).T).reshape(nc, 2, Q, fl)
        stress = jnp.einsum("xtab,xtqb->xtqa", self.SDS.astype(dt),
                            strain) * self.wv.astype(dt)[None, :, :, None]
        f9 = (stress.reshape(nc, 2 * Q * fl)
              @ self.Bc.astype(dt)).reshape(nx, ny, 9, 2)
        return self._scatter_cells(f9, dt, 2)

    def __call__(self, u):
        return self.from_channels(self.apply_channels(self.to_channels(u)))

    def diagonal_channels(self):
        dt = self.SDS.dtype
        nx, ny = self.n2
        fl = self.SDS.shape[-1]
        Q = self.wv.shape[1]
        Bq = self.Bc.reshape(2, Q, fl, 9, 2)
        d9 = jnp.einsum("tqakc,xtab,tqbkc->xkc",
                        Bq * self.wv[:, :, None, None, None],
                        self.SDS, Bq).reshape(nx, ny, 9, 2)
        return self._scatter_cells(d9, dt, 2)

    def tree_flatten(self):
        return ((self.SDS, self.Bc, self.wv, self.dof_slot),
                (self.n2, self.num_dofs, tuple(self._slots)))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = cls(aux[0], *ch, aux[1])
        obj._slots = list(aux[2])
        return obj


# ---------------------------------------------------------------------------
# Torus P1 levels + transfers (2D)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TorusP1Level2D:
    n2: tuple
    Kc: jnp.ndarray        # [nx, ny, 8, 8]
    diag: jnp.ndarray      # [nx, ny, 2]

    def apply(self, v):
        nx, ny = self.n2
        w = _wrap_pad2(v)
        cell = jnp.concatenate(
            [w[b[0]:b[0] + nx, b[1]:b[1] + ny] for b in _BITS2], axis=-1)
        f = jnp.einsum("xyj,xyij->xyi", cell, self.Kc.astype(v.dtype))
        out = jnp.zeros((nx + 1, ny + 1, 2), v.dtype)
        for i, b in enumerate(_BITS2):
            out = out.at[b[0]:b[0] + nx, b[1]:b[1] + ny].add(
                f[..., 2 * i:2 * i + 2])
        return _wrap_fold2(out)

    def tree_flatten(self):
        return (self.Kc, self.diag), (self.n2,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(aux[0], *ch)


def _p1_cell_matrices_var2d(mesh, D_elems):
    from . import element_matrices as em

    n2, h2 = validate_pixel_grid(mesh)
    g = mesh.geometry()
    Ke1 = np.asarray(em.element_elasticity(
        g.grad_lambda, g.volume, jnp.asarray(D_elems), 1))  # [E, 6, 6]
    npix = len(Ke1) // 2
    V1, T1 = generators.grid_tri(1, 1, hi=tuple(h2), diagonal="right")
    m1 = FEMMesh(V1, T1, degree=1)
    q = np.round(np.asarray(m1.node_positions)
                 / np.asarray(h2)).astype(int)
    vid = np.asarray([_BITS2.index(tuple(b)) for b in q])
    hot = np.zeros((2, 3, 4))
    for t in range(2):
        for a in range(3):
            hot[t, a, vid[m1.elem_nodes[t, a]]] = 1.0
    Kt = Ke1.reshape(npix, 2, 3, 2, 3, 2)
    Kc = np.einsum("tak,tbl,xtaibj->xkilj", hot, hot, Kt)
    return Kc.reshape(n2[0], n2[1], 8, 8)


def _torus_p1_diag2d(n2, Kc):
    nx, ny = n2
    d = np.zeros((nx + 1, ny + 1, 2))
    kd = np.diagonal(np.asarray(Kc), axis1=-2, axis2=-1).reshape(
        nx, ny, 4, 2)
    for i, b in enumerate(_BITS2):
        d[b[0]:b[0] + nx, b[1]:b[1] + ny] += kd[..., i, :]
    d[:, 0] += d[:, -1]
    d[0] += d[-1]
    return d[:nx, :ny]


def _h_reduction_2d():
    Ts = np.zeros((4, 4, 4))
    for si, s in enumerate(_BITS2):
        for gi, gb in enumerate(_BITS2):
            p = np.asarray(s) + np.asarray(gb)      # in half-steps: 0..2
            half = p % 2 == 1
            if not half.any():                      # lattice point
                Ts[si, gi, _BITS2.index(tuple(p // 2))] += 1.0
            else:
                base = p // 2
                if half.all():                      # anti-diagonal midpoint
                    u = base + np.asarray((1, 0))
                    v = base + np.asarray((0, 1))
                else:                               # axis edge midpoint
                    u = base
                    v = base + half.astype(int)
                Ts[si, gi, _BITS2.index(tuple(u))] += 0.5
                Ts[si, gi, _BITS2.index(tuple(v))] += 0.5
    return np.einsum("sfc,ij->sficj", Ts, np.eye(2)).reshape(4, 8, 8)


def _coarsen_2d(Kc_f):
    nx, ny = Kc_f.shape[:2]
    T8 = _h_reduction_2d()
    Kc = np.zeros((nx // 2, ny // 2, 8, 8))
    for si, s in enumerate(_BITS2):
        sub = Kc_f[s[0]::2, s[1]::2]
        Kc += np.einsum("fi,xyfg,gj->xyij", T8[si], sub, T8[si])
    return Kc


def _roll2(v, b, sign):
    return jnp.roll(v, shift=(-sign * b[0], -sign * b[1]), axis=(0, 1))


def torus2d_prolong_p2(v):
    chs = [v]
    for i in (1, 2, 3):
        ea, eb = _EDGE2[i]
        chs.append(0.5 * (_roll2(v, ea, +1) + _roll2(v, eb, +1)))
    return jnp.stack(chs, axis=2)


def torus2d_restrict_p2(u):
    out = u[..., 0, :]
    for i in (1, 2, 3):
        ea, eb = _EDGE2[i]
        ub = u[..., i, :]
        out = out + 0.5 * (_roll2(ub, ea, -1) + _roll2(ub, eb, -1))
    return out


def _class_of_bits2(b):
    return _BITS2.index(tuple(b))


def torus2d_prolong_h(vc):
    mx, my = vc.shape[:2]
    classes = []
    for bx in (0, 1):
        for by in (0, 1):
            if bx == by == 0:
                classes.append(vc)
            else:
                ea, eb = _EDGE2[_class_of_bits2((bx, by))]
                classes.append(0.5 * (_roll2(vc, ea, +1)
                                      + _roll2(vc, eb, +1)))
    z = jnp.stack(classes, axis=0).reshape(2, 2, mx, my, 2)
    return z.transpose(2, 0, 3, 1, 4).reshape(2 * mx, 2 * my, 2)


def torus2d_restrict_h(rf):
    mx, my = rf.shape[0] // 2, rf.shape[1] // 2
    z = rf.reshape(mx, 2, my, 2, 2).transpose(1, 3, 0, 2, 4)
    out = z[0, 0]
    for bx in (0, 1):
        for by in (0, 1):
            if bx == by == 0:
                continue
            ea, eb = _EDGE2[_class_of_bits2((bx, by))]
            ub = z[bx, by]
            out = out + 0.5 * (_roll2(ub, ea, -1) + _roll2(ub, eb, -1))
    return out


def _torus_gershgorin2d(lvl: TorusP1Level2D) -> float:
    nx, ny = lvl.n2
    rs = np.zeros((nx + 1, ny + 1, 2))
    ka = np.abs(np.asarray(lvl.Kc, np.float64)).sum(axis=-1).reshape(
        nx, ny, 4, 2)
    for i, b in enumerate(_BITS2):
        rs[b[0]:b[0] + nx, b[1]:b[1] + ny] += ka[..., i, :]
    rs[:, 0] += rs[:, -1]
    rs[0] += rs[-1]
    rs = rs[:nx, :ny]
    diag = np.asarray(lvl.diag, np.float64)
    return float((rs / np.maximum(diag, 1e-30)).max()) * 1.02


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PeriodicVarMG2D:
    """2D torus V-cycle for pixel-cell homogenization (translations
    projected by the caller; coarsest pseudo-inverse)."""

    fine: PeriodicVarP2Elasticity2D
    fine_diag: jnp.ndarray
    levels: tuple
    coarse_inv: jnp.ndarray | None
    lam: tuple
    nu: int
    _coarse_lu: object = None

    @classmethod
    def build(cls, mesh: FEMMesh, D_elems, dof_map, *, nu: int = 3,
              dense_cap: int = 4096, dtype=None) -> "PeriodicVarMG2D":
        dt = dtype or jnp.float64
        op = PeriodicVarP2Elasticity2D.build(mesh, D_elems, dof_map,
                                             dtype=dt)
        n2 = tuple(int(c) for c in op.n2)
        fine_diag = op.diagonal_channels().astype(dt)

        def dofs(nn):
            return nn[0] * nn[1] * 2

        chain = [n2]
        while (all(c % 2 == 0 for c in chain[-1]) and min(chain[-1]) >= 4
               and dofs(chain[-1]) > dense_cap):
            chain.append(tuple(c // 2 for c in chain[-1]))

        Kc = _p1_cell_matrices_var2d(mesh, D_elems)
        levels = []
        for li, ln in enumerate(chain):
            if li > 0:
                Kc = _coarsen_2d(Kc)
            diag = _torus_p1_diag2d(ln, Kc)
            levels.append(TorusP1Level2D(ln, jnp.asarray(Kc, dt),
                                         jnp.asarray(diag, dt)))

        nl = levels[-1].n2
        Ncd = nl[0] * nl[1] * 2
        coarse_inv = None
        coarse_lu = None
        if Ncd <= dense_cap:
            Ac = cls._coarse_matrix(np.asarray(levels[-1].Kc, np.float64))
            coarse_inv = jnp.asarray(np.linalg.pinv(Ac, hermitian=True),
                                     dt)
        else:
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            Ac = cls._coarse_matrix_sparse(
                np.asarray(levels[-1].Kc, np.float64)).tocsr()
            m = np.ones(Ncd)
            m[:2] = 0.0                    # pin vertex 0 (translations)
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
            lam.append(_torus_gershgorin2d(lvl))
        obj.lam = tuple(lam)
        return obj

    @staticmethod
    def _coarse_matrix_sparse(Kc):
        import scipy.sparse as sp

        nx, ny = Kc.shape[:2]
        N = nx * ny * 2
        corners = np.asarray(_BITS2)
        cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                     indexing="ij"),
                         axis=-1).reshape(-1, 2)
        gid = ((cells[:, None, 0] + corners[None, :, 0]) % nx) * ny             + ((cells[:, None, 1] + corners[None, :, 1]) % ny)
        dof = (gid[:, :, None] * 2 + np.arange(2)).reshape(-1, 8)
        rows = np.repeat(dof, 8, axis=1).reshape(-1)
        cols = np.tile(dof, (1, 8)).reshape(-1)
        vals = np.asarray(Kc, np.float64).reshape(-1)
        return sp.coo_matrix((vals, (rows, cols)), shape=(N, N))

    @staticmethod
    def _coarse_matrix(Kc):
        nx, ny = Kc.shape[:2]
        N = nx * ny * 2
        A = np.zeros((N, N))
        corners = np.asarray(_BITS2)
        cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                     indexing="ij"),
                         axis=-1).reshape(-1, 2)
        gid = ((cells[:, None, 0] + corners[None, :, 0]) % nx) * ny \
            + ((cells[:, None, 1] + corners[None, :, 1]) % ny)
        dof = (gid[:, :, None] * 2 + np.arange(2)).reshape(-1, 8)
        Kf = np.asarray(Kc, np.float64).reshape(-1, 8, 8)
        for c in range(len(cells)):
            A[np.ix_(dof[c], dof[c])] += Kf[c]
        return A

    def _lam_fine(self):
        op = self.fine
        nx, ny = op.n2
        fl = op.SDS.shape[-1]
        Q = op.wv.shape[1]
        aB = jnp.abs(op.Bc).reshape(2, Q, fl, 9, 2)
        z = jnp.einsum("tqakc->tqa", aB)
        rs9 = jnp.einsum("tqakc,xtab,tqb->xkc",
                         aB * op.wv[:, :, None, None, None],
                         jnp.abs(op.SDS), z).reshape(nx, ny, 9, 2)
        rs = op._scatter_cells(rs9, rs9.dtype, 2)
        diag = np.asarray(self.fine_diag, np.float64)
        r = np.asarray(rs) / np.maximum(diag, 1e-30)
        return float(np.where(diag > 0, r, 0.0).max()) * 1.02

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
        S = _chebyshev(lvl.apply, lvl.diag, jnp.ones((), r.dtype),
                       self.lam[1 + i], self.nu)
        x = S(r)
        res = r - lvl.apply(x)
        xc = self._cycle(i + 1, torus2d_restrict_h(res))
        x = x + torus2d_prolong_h(xc)
        return x + S(r - lvl.apply(x))

    def precondition(self, r_ch):
        with jax.default_matmul_precision("highest"):
            S = _chebyshev(self.fine.apply_channels, self.fine_diag,
                           jnp.ones((), r_ch.dtype), self.lam[0], self.nu)
            x = S(r_ch)
            res = r_ch - self.fine.apply_channels(x)
            xc = self._cycle(0, torus2d_restrict_p2(res))
            x = x + torus2d_prolong_p2(xc)
            return x + S(r_ch - self.fine.apply_channels(x))

    def tree_flatten(self):
        return ((self.fine, self.fine_diag, self.levels,
                 self.coarse_inv, jnp.asarray(self.lam)),
                (self.nu, self._coarse_lu))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch[:4], ch[4], aux[0], aux[1])


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def _periodic2d_mg_cg_block(mg, Bc, tol, maxiter):
    from ..solvers import cg as cg_mod

    with jax.default_matmul_precision("highest"):
        A_blk = jax.vmap(mg.fine.apply_channels, in_axes=-1, out_axes=-1)
        M_blk = jax.vmap(mg.precondition, in_axes=-1, out_axes=-1)

        def project(v):
            return v - jnp.mean(v, axis=(0, 1, 2), keepdims=True)

        return cg_mod.cg_block(A_blk, project(Bc), M_inv=M_blk,
                               project=project, tol=tol, maxiter=maxiter)


def solve_cell_problems_grid2d(sim, tol: float = 1e-10,
                               maxiter: int = 300):
    """2D pixel-grid cell problems in one block CG with the vmapped torus
    V-cycle.  Returns (w [fl, N, dim], iters list)."""
    from ..analysis.homogenization import canonical_strain

    fl = flat_len(2)
    D = sim.D
    if getattr(D, "ndim", 0) == 2:
        D = jnp.broadcast_to(D, (sim.mesh.num_elements,) + D.shape)
    mg = PeriodicVarMG2D.build(sim.mesh, D, sim.dof_map,
                               dtype=sim.Ke.dtype)
    Bc = jnp.stack([mg.fine.to_channels(sim.constant_strain_load(
        -canonical_strain(2, i, sim.Ke.dtype))) for i in range(fl)],
        axis=-1)
    res = _periodic2d_mg_cg_block(mg, Bc, tol, maxiter)
    w = jnp.stack([mg.fine.from_channels(res.x[..., i])
                   for i in range(fl)])[:, jnp.asarray(sim.dof_map)]
    return w, [int(res.iters)] * fl
