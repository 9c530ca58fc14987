"""Structured geometric multigrid: an all-conv V-cycle for the packed P2 path.

The reference factorizes once with CHOLMOD and back-substitutes
(``SparseMatrices.hh:1984-2296``), making iteration counts irrelevant; our
structured CG path iterates at 2-8k it/s but still pays O(sqrt(kappa))
iterations.  This module converts those fast iterations into fast *solves*:
a geometric V-cycle preconditioner whose every ingredient is a conv /
reshape / matmul — no gathers anywhere in the cycle.

Hierarchy (all levels exactly Galerkin, verified to 1e-13 in
``tests/test_structured_mg.py``):

* level 0: P2 elasticity on the n^3 Kuhn grid — the existing lane-packed
  conv operator (``ops.structured.StructuredP2Elasticity``);
* level 1: P1 on the SAME grid.  P1 c P2 with exact nodal interpolation
  (every P2 edge node is the midpoint of the Kuhn edge from its owner
  cell's min corner to corner ``bits``), so the Galerkin coarse operator
  equals the rediscretized P1 stiffness;
* levels 2..: P1 on dyadically coarsened grids.  Kuhn triangulations are
  self-similar under 2:1 refinement (Bey/Freudenthal), so rediscretized
  coarse == Galerkin again; transfers are parity-class reshapes with the
  same midpoint rule, fine[2c + b] = (v[c] + v[c + b]) / 2;
* coarsest: dense f64 inverse (host-built, applied as one matmul) when
  small enough, else a host scipy LU via ``pure_callback`` (odd grid
  sizes stop the dyadic chain early; even n recommended).

Smoother: fixed-degree Chebyshev over Jacobi targeting the upper spectrum
[lam_max/4, lam_max] per level — linear and symmetric, so the V-cycle is a
valid plain-CG preconditioner.  P1-level operators use the corner-
gather -> [cells, 24] @ K_cell -> corner-scatter form: the cell grid
contains only real cells, so no boundary corrections are needed at all.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .structured import StructuredP2Elasticity, _CHANNEL_BITS
from ..mesh.femmesh import FEMMesh
from ..mesh import generators


def _p1_cell_stiffness(h3, D):
    """[24, 24] P1 stiffness of one Kuhn-subdivided cell with per-axis
    spacings h3, rows/cols ordered by ``_CHANNEL_BITS`` corner order."""
    from . import element_matrices as em
    from ..sparse import assembly

    V, T = generators.grid_tet(1, 1, 1, hi=tuple(h3))
    mesh = FEMMesh(V, T, degree=1)
    g = mesh.geometry()
    Ke = em.element_elasticity(g.grad_lambda, g.volume, jnp.asarray(D), 1)
    K = np.asarray(assembly.assemble_scipy(
        np.asarray(Ke, np.float64), mesh.elem_nodes, mesh.num_nodes,
        d=3).todense())
    q = np.round(np.asarray(mesh.node_positions)
                 / (np.asarray(h3))).astype(int)
    perm = np.empty(8, np.int64)
    for i in range(8):
        perm[_CHANNEL_BITS.index(tuple(q[i]))] = i
    idx = (perm[:, None] * 3 + np.arange(3)[None, :]).reshape(-1)
    return K[np.ix_(idx, idx)]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class P1Level:
    """P1 elasticity on an (nx, ny, nz)-cell Kuhn grid as corner-gather ->
    per-cell MXU matmul -> corner-scatter (slices only; the cell grid has
    no fake cells, so the operator is exact with zero boundary fix-up)."""

    n3: tuple
    Kc: jnp.ndarray        # [24, 24]
    free: jnp.ndarray      # [mx, my, mz, 3] 1.0 = free
    diag: jnp.ndarray      # [mx, my, mz, 3]

    def apply(self, v):
        nx, ny, nz = self.n3
        cell = jnp.concatenate(
            [v[bx:bx + nx, by:by + ny, bz:bz + nz]
             for bx, by, bz in _CHANNEL_BITS], axis=-1)      # [nx,ny,nz,24]
        if self.Kc.ndim == 2:          # uniform material: one [24, 24]
            f = jnp.einsum("xyzj,ij->xyzi", cell, self.Kc.astype(v.dtype))
        else:                          # per-cell [nx, ny, nz, 24, 24]
            f = jnp.einsum("xyzj,xyzij->xyzi", cell,
                           self.Kc.astype(v.dtype))
        y = jnp.zeros_like(v)
        for i, (bx, by, bz) in enumerate(_CHANNEL_BITS):
            y = y.at[bx:bx + nx, by:by + ny, bz:bz + nz].add(
                f[..., 3 * i:3 * i + 3])
        return y

    def tree_flatten(self):
        return (self.Kc, self.free, self.diag), (self.n3,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(aux[0], *ch)


def _p1_diag(n3, Kc):
    """Assembled diagonal of the P1 grid operator (host, f64); Kc either
    one [24, 24] or per-cell [nx, ny, nz, 24, 24]."""
    nx, ny, nz = n3
    d = np.zeros((nx + 1, ny + 1, nz + 1, 3))
    Kc = np.asarray(Kc)
    kd = np.diagonal(Kc, axis1=-2, axis2=-1)
    if Kc.ndim == 2:
        kd = np.broadcast_to(kd, (nx, ny, nz, 24))
    kd = kd.reshape(nx, ny, nz, 8, 3)
    for i, (bx, by, bz) in enumerate(_CHANNEL_BITS):
        d[bx:bx + nx, by:by + ny, bz:bz + nz] += kd[..., i, :]
    return d


def _p1_gershgorin(lvl: "P1Level") -> float:
    """Row-scaled Gershgorin bound on lam_max(D^-1 A) for a P1 level
    (abs row sums assembled per cell, exact on the host)."""
    nx, ny, nz = lvl.n3
    rs = np.zeros((nx + 1, ny + 1, nz + 1, 3))
    Kc = np.asarray(lvl.Kc, np.float64)
    ka = np.abs(Kc).sum(axis=-1)
    if Kc.ndim == 2:
        ka = np.broadcast_to(ka, (nx, ny, nz, 24))
    ka = ka.reshape(nx, ny, nz, 8, 3)
    for i, (bx, by, bz) in enumerate(_CHANNEL_BITS):
        rs[bx:bx + nx, by:by + ny, bz:bz + nz] += ka[..., i, :]
    diag = np.asarray(lvl.diag, np.float64)
    return float((rs / np.maximum(diag, 1e-30)).max()) * 1.02


# ---------------------------------------------------------------------------
# Transfers (all pure slice / pad / reshape)
# ---------------------------------------------------------------------------

def packed_to_channels(op: StructuredP2Elasticity, xp):
    """[mx, my, G, 24P] -> [mx, my, mz, 8, 3] (slice off dead z pad)."""
    mx, my, mz = op.n3[0] + 1, op.n3[1] + 1, op.n3[2] + 1
    return xp.reshape(mx, my, op.G * op.P, 8, 3)[:, :, :mz]


def channels_to_packed(op: StructuredP2Elasticity, ch):
    mx, my, mz = op.n3[0] + 1, op.n3[1] + 1, op.n3[2] + 1
    pad = op.G * op.P - mz
    ch = jnp.pad(ch, [(0, 0), (0, 0), (0, pad), (0, 0), (0, 0)])
    return ch.reshape(mx, my, op.G, op.C)


def _shift_up(v, b):
    """shifted[c] = v[c + b] (zero past the end)."""
    bx, by, bz = b
    s = v[bx:, by:, bz:]
    return jnp.pad(s, [(0, bx), (0, by), (0, bz), (0, 0)])


def _shift_down(v, b):
    """shifted[c] = v[c - b] (zero before the start)."""
    bx, by, bz = b
    m = v.shape
    return jnp.pad(v, [(bx, 0), (by, 0), (bz, 0), (0, 0)])[
        :m[0], :m[1], :m[2]]


def prolong_p2(v):
    """P1 vertex field [mx, my, mz, 3] -> P2 channel field
    [mx, my, mz, 8, 3]: edge channel b gets (v[c] + v[c + b]) / 2."""
    chs = [v]
    for b in _CHANNEL_BITS[1:]:
        chs.append(0.5 * (v + _shift_up(v, b)))
    return jnp.stack(chs, axis=3)


def restrict_p2(u):
    """Adjoint of :func:`prolong_p2`: [mx, my, mz, 8, 3] -> vertices."""
    out = u[..., 0, :]
    for i, b in enumerate(_CHANNEL_BITS[1:], start=1):
        ub = u[..., i, :]
        out = out + 0.5 * (ub + _shift_down(ub, b))
    return out


def prolong_h(vc, nf3):
    """P1 grid (n/2) -> P1 grid n by the Kuhn midpoint rule:
    fine[2c + b] = (v[c] + v[c + b]) / 2 (copy for b = 0)."""
    mc = vc.shape[:3]
    classes = [vc if b == (0, 0, 0) else 0.5 * (vc + _shift_up(vc, b))
               for b in [(bx, by, bz)
                         for bx in (0, 1) for by in (0, 1) for bz in (0, 1)]]
    z = jnp.stack(classes, axis=0).reshape(2, 2, 2, *mc, 3)
    fine = z.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
        2 * mc[0], 2 * mc[1], 2 * mc[2], 3)
    return fine[:nf3[0] + 1, :nf3[1] + 1, :nf3[2] + 1]


def restrict_h(rf, nc3):
    """Adjoint of :func:`prolong_h`."""
    mc = (nc3[0] + 1, nc3[1] + 1, nc3[2] + 1)
    mf = rf.shape[:3]
    rf = jnp.pad(rf, [(0, 2 * mc[0] - mf[0]), (0, 2 * mc[1] - mf[1]),
                      (0, 2 * mc[2] - mf[2]), (0, 0)])
    z = rf.reshape(mc[0], 2, mc[1], 2, mc[2], 2, 3).transpose(
        1, 3, 5, 0, 2, 4, 6)
    out = z[0, 0, 0]
    for bx in (0, 1):
        for by in (0, 1):
            for bz in (0, 1):
                if bx == by == bz == 0:
                    continue
                ub = z[bx, by, bz]
                out = out + 0.5 * (ub + _shift_down(ub, (bx, by, bz)))
    return out


# ---------------------------------------------------------------------------
# The multigrid object
# ---------------------------------------------------------------------------

def _chebyshev(apply_A, diag, mask, lam_max, degree):
    """Fixed-degree Chebyshev smoother over Jacobi targeting
    [lam_max/4, lam_max] — linear + symmetric (valid inside plain CG).

    ``lam_max`` may arrive as a python float or (via the pytree children
    of StructuredMG under x64) an f64 scalar; cast it to the iterate
    dtype so the smoother never promotes an f32 CG carry."""
    lam_max = jnp.asarray(lam_max, dtype=diag.dtype)
    lam_min = lam_max / 4.0
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma = theta / delta
    safe = jnp.where(diag > 0, diag, 1.0)

    def S(b):
        z = (b / safe) * mask
        d = z / theta
        x = d
        r = b
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = r - apply_A(d * mask) * mask
            z = (r / safe) * mask
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
            x = x + d
            rho = rho_new
        return x * mask

    return S


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StructuredMG:
    """V-cycle preconditioner + solver for the structured P2 path.

    Build once per (mesh, D, Dirichlet mask); ``precondition`` maps a
    packed residual to a packed correction (pass the object as a jit
    ARGUMENT — closure-captured convs compile pathologically, see
    ``ops.structured``).  ``solve`` runs MG-PCG end to end."""

    fine: StructuredP2Elasticity
    free_packed: jnp.ndarray       # [mx, my, G, C] (valid & free)
    fine_diag: jnp.ndarray         # packed Jacobi diagonal
    levels: tuple                  # of P1Level, finest-to-coarsest
    coarse_inv: jnp.ndarray | None  # [Ncd, Ncd] dense inverse (grid order)
    lam: tuple                     # per-level lam_max: (P2, *P1 levels)
    nu: int                        # Chebyshev smoothing degree
    _coarse_lu: object = None      # host splu fallback (aux, may be None)

    # -- build ----------------------------------------------------------
    @classmethod
    def build(cls, mesh: FEMMesh, D, fixed_mask=None, *, nu: int = 3,
              dense_cap: int = 4096, dtype=None,
              exact_lambda: bool = False,
              fine_op: StructuredP2Elasticity | None = None
              ) -> "StructuredMG":
        op = fine_op or StructuredP2Elasticity.build(mesh, D, dtype=dtype)
        dt = op.kernel.dtype
        n3 = tuple(int(c) for c in op.n3)
        bb = mesh.bbox()
        h3 = tuple(float(bb.dimensions[a]) / n3[a] for a in range(3))

        valid = op.valid_mask_packed().astype(dt)
        if fixed_mask is not None:
            free_packed = op.to_packed(
                (~jnp.asarray(fixed_mask)).astype(dt)) * valid
        else:
            free_packed = valid
        fine_diag = op.diagonal_packed().astype(dt)

        # level chain: P1 on the same grid, then dyadic coarsening while
        # even; stop when the next level would fit the dense cap.
        def dofs(n):
            return (n[0] + 1) * (n[1] + 1) * (n[2] + 1) * 3

        chain = [n3]
        while (all(c % 2 == 0 for c in chain[-1]) and min(chain[-1]) >= 4
               and dofs(chain[-1]) > dense_cap):
            chain.append(tuple(c // 2 for c in chain[-1]))

        # vertex-level free masks: fine vertices = ch0 of the P2 channels,
        # coarser = even-index subsample (coincident grid points)
        vmask = np.asarray(packed_to_channels(op, free_packed)[..., 0, :])
        levels = []
        masks = [vmask]
        for ln in chain[1:]:
            masks.append(masks[-1][::2, ::2, ::2])
        for ln, m in zip(chain, masks):
            hl = tuple(h3[a] * (n3[a] // ln[a]) for a in range(3))
            Kc = _p1_cell_stiffness(hl, D)
            diag = _p1_diag(ln, Kc)
            levels.append(P1Level(ln, jnp.asarray(Kc, dt),
                                  jnp.asarray(m, dt),
                                  jnp.asarray(diag, dt)))

        # coarsest solve
        nc = chain[-1]
        coarse_inv = None
        coarse_lu = None
        Ac, perm = cls._coarse_matrix(nc, h3, n3, D, masks[-1])
        if dofs(nc) <= dense_cap:
            Ad = np.asarray(Ac.todense())
            if np.asarray(masks[-1]).min() > 0:
                # no Dirichlet anywhere: singular (rigid modes) — use the
                # pseudo-inverse; the outer CG projects the nullspace
                inv = np.linalg.pinv(Ad, hermitian=True)
            else:
                inv = np.linalg.inv(Ad)
            coarse_inv = jnp.asarray(inv[np.ix_(perm, perm)], dt)
        else:
            import scipy.sparse.linalg as spla

            lu = spla.splu(Ac.tocsc())
            iperm = np.argsort(perm)

            def coarse_solve(r):
                flat = np.asarray(r, np.float64).reshape(-1)[iperm]
                return lu.solve(flat)[perm].reshape(r.shape).astype(
                    np.asarray(r).dtype)

            coarse_lu = coarse_solve

        # spectral bounds.  Default: host-side row-scaled Gershgorin
        # (lam_max(D^-1 A) <= max_i sum_j |a_ij| / d_i, with per-cell
        # contributions bounding the assembled |a_ij|) — zero device
        # dispatches.  exact_lambda=True runs power iteration instead
        # (tighter by ~20-40%, but each level costs a remote compile:
        # measured ~980 s total at bench scale on the relayed backend).
        obj = cls(op, free_packed, fine_diag, tuple(levels), coarse_inv,
                  (1.0,) * (1 + len(levels)), nu, coarse_lu)
        if exact_lambda:
            lam = [obj._lam_max_fine()]
            for i in range(len(levels)):
                lam.append(obj._lam_max_p1(i))
        else:
            lam = [obj._lam_fine_gershgorin()]
            for lvl in levels:
                lam.append(_p1_gershgorin(lvl))
        obj.lam = tuple(lam)
        return obj

    def _lam_fine_gershgorin(self):
        """Row-scaled Gershgorin bound for the packed P2 level: abs-row
        sums assembled exactly like the diagonal (uniform interior per
        channel minus fake-cube shell contributions)."""
        op = self.fine
        Kabs = jnp.sum(jnp.abs(op.K_cube), axis=1).reshape(27, 3)
        kern = np.asarray(op.kernel, np.float64)
        rs_int = jnp.asarray(
            np.abs(kern).sum(axis=(0, 1, 2, 3)).reshape(8, 3))
        mx, my, mz = (op.n3[0] + 1, op.n3[1] + 1, op.n3[2] + 1)
        n_slots = mx * my * mz * 8
        full = jnp.tile(rs_int[None], (mx * my * mz, 1, 1)).reshape(
            n_slots, 3)
        nf = op.fake_slots.shape[0]
        fe = jnp.tile(Kabs[None], (nf, 1, 1)) \
            * op.fake_mask.astype(full.dtype)[:, :, None]
        corr = op.fake_plan(fe.reshape(nf * 27, 3).astype(full.dtype))
        rs = full.at[op.shell_slots].add(-corr)
        diag = op.diagonal_channels()
        live = np.asarray(op.valid_mask(), bool).reshape(-1)
        r = np.asarray(rs)[live] / np.maximum(np.asarray(diag)[live], 1e-30)
        return float(r.max()) * 1.02

    @staticmethod
    def _coarse_matrix(nc, h3, n3, D, mask):
        """Masked coarse P1 matrix (scipy sparse, MESH dof ordering) + the
        permutation from grid flat order to mesh dof order."""
        import scipy.sparse as sp

        from . import element_matrices as em
        from ..sparse import assembly

        hi = tuple(h3[a] * n3[a] for a in range(3))
        V, T = generators.grid_tet(*nc, hi=hi)
        cm = FEMMesh(V, T, degree=1)
        g = cm.geometry()
        Ke = em.element_elasticity(g.grad_lambda, g.volume,
                                   jnp.asarray(D), 1)
        A = assembly.assemble_scipy(
            np.asarray(Ke, np.float64), cm.elem_nodes, cm.num_nodes,
            d=3).tocsr()
        # node id -> grid flat index ((x * my + y) * mz + z)
        my, mz = nc[1] + 1, nc[2] + 1
        q = np.round(np.asarray(cm.node_positions)
                     / np.asarray(h3) / np.asarray(
                         [n3[a] // nc[a] for a in range(3)])).astype(int)
        gid = (q[:, 0] * my + q[:, 1]) * mz + q[:, 2]
        perm_nodes = np.argsort(gid)     # grid order -> node id
        perm = (perm_nodes[:, None] * 3 + np.arange(3)).reshape(-1)
        m = np.asarray(mask, np.float64).reshape(-1)[
            np.argsort(perm)]            # mesh-order mask
        M = sp.diags(m)
        A = M @ A @ M + sp.diags(1.0 - m)
        return A, perm

    def _lam_max_fine(self, iters: int = 30):
        mask = self.free_packed
        safe = jnp.where(self.fine_diag > 0, self.fine_diag, 1.0)
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal(mask.shape), mask.dtype) * mask

        @jax.jit
        def step(op, mask, safe, v):
            w = (op.apply_packed(v * mask) * mask) / safe
            return w / jnp.linalg.norm(w), jnp.linalg.norm(w)

        lam = 1.0
        for _ in range(iters):
            v, lam = step(self.fine, mask, safe, v)
        return float(lam) * 1.05

    def _lam_max_p1(self, i, iters: int = 30):
        lvl = self.levels[i]
        safe = jnp.where(lvl.diag > 0, lvl.diag, 1.0)
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal(lvl.free.shape),
                        lvl.free.dtype) * lvl.free

        @jax.jit
        def step(lvl, safe, v):
            w = (lvl.apply(v * lvl.free) * lvl.free) / safe
            return w / jnp.linalg.norm(w), jnp.linalg.norm(w)

        lam = 1.0
        for _ in range(iters):
            v, lam = step(lvl, safe, v)
        return float(lam) * 1.05

    # -- the cycle ------------------------------------------------------
    def _coarse_apply(self, r):
        lvl = self.levels[-1]
        if self.coarse_inv is not None:
            flat = (r * lvl.free).reshape(-1)
            return (self.coarse_inv.astype(r.dtype) @ flat).reshape(
                r.shape) * lvl.free
        out = jax.pure_callback(
            self._coarse_lu, jax.ShapeDtypeStruct(r.shape, r.dtype),
            r * lvl.free, vmap_method="sequential")
        return out * lvl.free

    def precondition(self, rp):
        """Packed residual [mx, my, G, C] -> packed correction (one
        symmetric V-cycle; linear, SPD on the free subspace).

        All matmuls/convs inside run at HIGHEST (true f32) precision:
        XLA:TPU's default bf16 conv multiplication leaves ~1e-3 relative
        error in the operator — harmless for Jacobi-CG iteration-rate
        runs, but the V-cycle amplifies low modes ~1e3x and CG then sees
        an indefinite operator (measured: <p, Ap> < 0 at 1.2M DOF)."""
        with jax.default_matmul_precision("highest"):
            return self._precondition_inner(rp)

    def _precondition_inner(self, rp):
        mask = self.free_packed
        S = _chebyshev(self.fine.apply_packed, self.fine_diag, mask,
                       self.lam[0], self.nu)
        r = rp * mask
        x = S(r)
        res = (r - self.fine.apply_packed(x) * mask)
        rc = restrict_p2(packed_to_channels(self.fine, res))
        xc = self._cycle_p1(0, rc * self.levels[0].free)
        ch = prolong_p2(xc)
        x = x + channels_to_packed(self.fine, ch) * mask
        x = x + S(r - self.fine.apply_packed(x) * mask)
        return x

    def _cycle_p1(self, i, r):
        lvl = self.levels[i]
        if i == len(self.levels) - 1:
            return self._coarse_apply(r)
        S = _chebyshev(lvl.apply, lvl.diag, lvl.free, self.lam[1 + i],
                       self.nu)
        r = r * lvl.free
        x = S(r)
        res = r - lvl.apply(x) * lvl.free
        nxt = self.levels[i + 1]
        rc = restrict_h(res, nxt.n3) * nxt.free
        xc = self._cycle_p1(i + 1, rc)
        x = x + prolong_h(xc, lvl.n3) * lvl.free
        x = x + S(r - lvl.apply(x) * lvl.free)
        return x

    # -- end-to-end solve ----------------------------------------------
    def solve(self, b, fixed_values=None,
              tol: float = 1e-10, maxiter: int = 500):
        """MG-PCG on nodal b [N, 3]; returns (u [N, 3], CGResult).

        The Dirichlet mask must match the one given at build.  The whole
        solve is one jitted dispatch with ``self`` as a jit argument (a
        closure-captured conv kernel compiles ~43x slower on this
        toolchain, see ``ops.structured``); MG-PCG converges in tens of
        iterations, so the single dispatch stays well under the relay
        watchdog that forces chunking in plain CG."""
        op = self.fine
        bc = op.to_packed(jnp.asarray(b))
        u_d = None
        if fixed_values is not None:
            mask = self.free_packed.astype(bc.dtype)
            u_d = op.to_packed(jnp.asarray(fixed_values)) \
                * (op.valid_mask_packed().astype(bc.dtype) - mask)
        x, iters, resnorm = _mg_pcg(self, bc, u_d, tol, maxiter)
        return op.from_packed(x), _CGResultShim(x, iters, resnorm)

    # -- pytree ---------------------------------------------------------
    def tree_flatten(self):
        # lam rides as a CHILD (jnp scalars): per-problem spectral bounds
        # must not retrigger jit retraces via static aux
        return ((self.fine, self.free_packed, self.fine_diag, self.levels,
                 self.coarse_inv, jnp.asarray(self.lam)),
                (self.nu, self._coarse_lu))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch[:5], ch[5], aux[0], aux[1])


from ..solvers.cg import CGResult as _CGResultShim  # noqa: E402


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def _mg_pcg(mg, bc, u_d, tol, maxiter):
    """Jitted MG-PCG core: every array (conv kernels, masks, dense coarse
    inverse) enters as a jit argument through the ``mg`` pytree.  Traced
    under HIGHEST matmul precision throughout — see
    :meth:`StructuredMG.precondition` for why bf16 convs break MG-CG."""
    from ..solvers import cg as cg_mod

    with jax.default_matmul_precision("highest"):
        mask = mg.free_packed.astype(bc.dtype)
        if u_d is not None:
            bc = bc - mg.fine.apply_packed(u_d)
        res = cg_mod.cg(mg.fine.apply_packed, bc, M_inv=mg.precondition,
                        project=lambda v: v * mask, tol=tol,
                        maxiter=maxiter)
        x = res.x if u_d is None else res.x + u_d
        return x, res.iters, res.resnorm


# ---------------------------------------------------------------------------
# Variable-material hierarchy (per-element D — ops/structured_var.py fine
# level).  Nesting is material-independent, so exact Galerkin coarse
# operators exist at every level as per-cell [24, 24] P1 matrices:
# the finest P1 level assembles them per-tet, h-coarsening reduces 8 fine
# cells through fixed interpolation matrices T_s (the Kuhn midpoint rule).
# ---------------------------------------------------------------------------

def _p1_cell_matrices_var(mesh, D_elems):
    """[nx, ny, nz, 24, 24] per-cell P1 stiffness from per-tet materials
    (exact Galerkin restriction of the P2 operator)."""
    from .structured import validate_kuhn_grid

    n3, h3 = validate_kuhn_grid(mesh)
    nx, ny, nz = n3
    g = mesh.geometry()
    from . import element_matrices as em

    Ke1 = np.asarray(em.element_elasticity(
        g.grad_lambda, g.volume, jnp.asarray(D_elems), 1))  # [E, 12, 12]
    ncells = len(Ke1) // 6
    # cube-local vertex one-hot from the reference cell
    V1, T1 = generators.grid_tet(1, 1, 1, hi=tuple(h3))
    m1 = FEMMesh(V1, T1, degree=1)
    q = np.round(np.asarray(m1.node_positions)
                 / np.asarray(h3)).astype(int)
    vid = np.asarray([_CHANNEL_BITS.index(tuple(b)) for b in q])
    hot = np.zeros((6, 4, 8))
    for t in range(6):
        for a in range(4):
            hot[t, a, vid[m1.elem_nodes[t, a]]] = 1.0
    Kt = Ke1.reshape(ncells, 6, 4, 3, 4, 3)
    Kc = np.einsum("tak,tbl,xtaibj->xkilj", hot, hot, Kt, optimize=True)
    return Kc.reshape(nx, ny, nz, 24, 24)


def _h_reduction_matrices():
    """[8, 24, 24] T_s: coarse cell corner values -> fine subcell s corner
    values (Kuhn midpoint rule), s in _CHANNEL_BITS order."""
    Ts = np.zeros((8, 8, 8))
    for si, s in enumerate(_CHANNEL_BITS):
        for gi, gbits in enumerate(_CHANNEL_BITS):
            p = (np.asarray(s) + np.asarray(gbits)) / 2.0
            u = np.floor(p).astype(int)
            v = np.ceil(p).astype(int)
            Ts[si, gi, _CHANNEL_BITS.index(tuple(u))] += 0.5
            Ts[si, gi, _CHANNEL_BITS.index(tuple(v))] += 0.5
    T24 = np.einsum("sfc,ij->sficj", Ts, np.eye(3)).reshape(8, 24, 24)
    return T24


def _coarsen_cell_matrices(Kc_f):
    """Per-cell P1 matrices on grid n -> exact Galerkin per-cell matrices
    on grid n/2 (sum over the 8 subcells of T_s^T K T_s)."""
    nx, ny, nz = Kc_f.shape[:3]
    T24 = _h_reduction_matrices()
    Kc = np.zeros((nx // 2, ny // 2, nz // 2, 24, 24))
    for si, s in enumerate(_CHANNEL_BITS):
        sub = Kc_f[s[0]::2, s[1]::2, s[2]::2]
        Kc += np.einsum("fi,xyzfg,gj->xyzij", T24[si], sub, T24[si],
                        optimize=True)
    return Kc


def _coarse_matrix_from_cells(Kc, mask):
    """Scipy CSR of the masked coarsest operator from per-cell [24, 24]
    matrices, in GRID vertex order; plus the identity permutation (the
    assembly is already grid-ordered)."""
    import scipy.sparse as sp

    nx, ny, nz = Kc.shape[:3]
    mx, my, mz = nx + 1, ny + 1, nz + 1
    cells = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij"),
                     axis=-1).reshape(-1, 3)
    # global vertex id of cube corner k for each cell
    corners = np.asarray(_CHANNEL_BITS)
    gid = ((cells[:, None, 0] + corners[None, :, 0]) * my
           + (cells[:, None, 1] + corners[None, :, 1])) * mz \
        + (cells[:, None, 2] + corners[None, :, 2])          # [nc, 8]
    dof = (gid[:, :, None] * 3 + np.arange(3)).reshape(-1, 24)
    rows = np.repeat(dof, 24, axis=1).reshape(-1)
    cols = np.tile(dof, (1, 24)).reshape(-1)
    vals = np.asarray(Kc, np.float64).reshape(-1)
    N = mx * my * mz * 3
    A = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    m = np.asarray(mask, np.float64).reshape(-1)
    M = sp.diags(m)
    return (M @ A @ M + sp.diags(1.0 - m)).tocsr(), np.arange(N)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class VarStructuredMG:
    """V-cycle preconditioner + solver for PER-ELEMENT materials on Kuhn
    grids (fine level = ``ops/structured_var.StructuredVarP2Elasticity``,
    channel-space vectors; every coarse level carries exact-Galerkin
    per-cell [24, 24] matrices)."""

    fine: object                   # StructuredVarP2Elasticity
    free_ch: jnp.ndarray           # [mx, my, mz, 8, 3] valid & free
    fine_diag: jnp.ndarray
    levels: tuple
    coarse_inv: jnp.ndarray | None
    lam: tuple
    nu: int
    _coarse_lu: object = None

    @classmethod
    def build(cls, mesh: FEMMesh, D_elems, fixed_mask=None, *,
              nu: int = 3, dense_cap: int = 4096, dtype=None,
              Kc_fine=None) -> "VarStructuredMG":
        """``Kc_fine``: precomputed _p1_cell_matrices_var(mesh, D_elems)
        (shared across builds that differ only in the mask)."""
        from .structured_var import StructuredVarP2Elasticity

        dt = dtype or jnp.float64
        op = StructuredVarP2Elasticity.build(mesh, D_elems, dtype=dt)
        n3 = tuple(int(c) for c in op.n3)

        valid = op.valid_mask_channels().astype(dt)
        valid = jnp.broadcast_to(valid, valid.shape[:-1] + (3,))
        if fixed_mask is not None:
            free_ch = op.to_channels(
                (~jnp.asarray(fixed_mask)).astype(dt)) * valid
        else:
            free_ch = valid
        fine_diag = op.diagonal_channels().astype(dt)

        def dofs(nn):
            return (nn[0] + 1) * (nn[1] + 1) * (nn[2] + 1) * 3

        chain = [n3]
        while (all(c % 2 == 0 for c in chain[-1]) and min(chain[-1]) >= 4
               and dofs(chain[-1]) > dense_cap):
            chain.append(tuple(c // 2 for c in chain[-1]))

        vmask = np.asarray(free_ch[..., 0, :])
        masks = [vmask]
        for _ in chain[1:]:
            masks.append(masks[-1][::2, ::2, ::2])

        Kc = (Kc_fine if Kc_fine is not None
              else _p1_cell_matrices_var(mesh, D_elems))
        levels = []
        for li, (ln, m) in enumerate(zip(chain, masks)):
            if li > 0:
                Kc = _coarsen_cell_matrices(Kc)
            diag = _p1_diag(ln, Kc)
            levels.append(P1Level(ln, jnp.asarray(Kc, dt),
                                  jnp.asarray(m, dt),
                                  jnp.asarray(diag, dt)))

        coarse_inv = None
        coarse_lu = None
        Ac, _ = _coarse_matrix_from_cells(np.asarray(levels[-1].Kc,
                                                     np.float64),
                                          masks[-1])
        if dofs(chain[-1]) <= dense_cap:
            Ad = np.asarray(Ac.todense())
            if np.asarray(masks[-1]).min() > 0:
                inv = np.linalg.pinv(Ad, hermitian=True)
            else:
                inv = np.linalg.inv(Ad)
            coarse_inv = jnp.asarray(inv, dt)
        else:
            import scipy.sparse.linalg as spla

            lu = spla.splu(Ac.tocsc())

            def coarse_solve(r):
                flat = np.asarray(r, np.float64).reshape(-1)
                return lu.solve(flat).reshape(r.shape).astype(
                    np.asarray(r).dtype)

            coarse_lu = coarse_solve

        obj = cls(op, free_ch, fine_diag, tuple(levels), coarse_inv,
                  (1.0,) * (1 + len(levels)), nu, coarse_lu)
        lam = [obj._lam_fine_gershgorin()]
        for lvl in levels:
            lam.append(_p1_gershgorin(lvl))
        obj.lam = tuple(lam)
        return obj

    def _lam_fine_gershgorin(self):
        """Row-scaled Gershgorin: abs row-sum bound assembled per tet,
        |Ke| row sums bounded by |B|^T |SDS| |B| 1 (triangle inequality)."""
        op = self.fine
        nx, ny, nz = op.n3
        aB = jnp.abs(op.B)
        aS = jnp.abs(op.SDS).reshape(nx, ny, nz, 6, op.SDS.shape[-2],
                                     op.SDS.shape[-1])
        z = jnp.einsum("tqanc->tqa", aB)
        rs_tet = jnp.einsum("tqanc,xyztab,tqb->xyztnc",
                            aB * op.wv[:, :, None, None, None], aS, z)
        rs27 = jnp.einsum("tak,xyztac->xyzkc", op.tet_slot, rs_tet)
        rs = op._scatter_cells(rs27, rs27.dtype, 3)
        diag = np.asarray(self.fine_diag, np.float64)
        r = np.asarray(rs) / np.maximum(diag, 1e-30)
        r = np.where(diag > 0, r, 0.0)        # dead slots excluded
        return float(r.max()) * 1.02

    # -- cycle -----------------------------------------------------------
    _coarse_apply = StructuredMG._coarse_apply
    _cycle_p1 = StructuredMG._cycle_p1

    def precondition(self, r_ch):
        """Channel-space residual -> correction (symmetric V-cycle at
        HIGHEST matmul precision; see StructuredMG.precondition)."""
        with jax.default_matmul_precision("highest"):
            mask = self.free_ch
            S = _chebyshev(self.fine.apply_channels, self.fine_diag, mask,
                           self.lam[0], self.nu)
            r = r_ch * mask
            x = S(r)
            res = (r - self.fine.apply_channels(x) * mask)
            rc = restrict_p2(res)
            xc = self._cycle_p1(0, rc * self.levels[0].free)
            x = x + prolong_p2(xc) * mask
            x = x + S(r - self.fine.apply_channels(x) * mask)
            return x

    def solve(self, b, fixed_values=None, tol: float = 1e-10,
              maxiter: int = 500):
        """MG-PCG on nodal b [N, 3]; returns (u [N, 3], CGResult)."""
        op = self.fine
        bc = op.to_channels(jnp.asarray(b))
        u_d = None
        if fixed_values is not None:
            valid = op.valid_mask_channels().astype(bc.dtype)
            valid = jnp.broadcast_to(valid, valid.shape[:-1] + (3,))
            mask = self.free_ch.astype(bc.dtype)
            u_d = op.to_channels(jnp.asarray(fixed_values)) \
                * (valid - mask)
        x, iters, resnorm = _var_mg_pcg(self, bc, u_d, tol, maxiter)
        return op.from_channels(x), _CGResultShim(x, iters, resnorm)

    def tree_flatten(self):
        return ((self.fine, self.free_ch, self.fine_diag, self.levels,
                 self.coarse_inv, jnp.asarray(self.lam)),
                (self.nu, self._coarse_lu))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch[:5], ch[5], aux[0], aux[1])


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def _var_mg_pcg(mg, bc, u_d, tol, maxiter):
    from ..solvers import cg as cg_mod

    with jax.default_matmul_precision("highest"):
        mask = mg.free_ch.astype(bc.dtype)
        if u_d is not None:
            bc = bc - mg.fine.apply_channels(u_d)
        res = cg_mod.cg(mg.fine.apply_channels, bc * mask,
                        M_inv=mg.precondition,
                        project=lambda v: v * mask, tol=tol,
                        maxiter=maxiter)
        x = res.x if u_d is None else res.x + u_d
        return x, res.iters, res.resnorm
