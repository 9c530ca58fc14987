"""Device-resident multilevel preconditioner for arbitrary unstructured
meshes — the full CHOLMOD-role solver (factorize-once, bounded solve cost,
reference ``SparseMatrices.hh:1984-2296``) with EVERY level's work on
device:

  level 0   P2 fine: routed in-register SpMV (``sparse/routed_ebe``)
  level 1   P1 on the same mesh (exactly nested in P2 — every edge node is
            its edge midpoint, so the Galerkin coarse operator equals the
            rediscretized P1 stiffness; see ``solvers/twolevel.py``),
            itself a routed SpMV; P2<->P1 transfers run as routed
            copy/reduce plans (an XLA gather/scatter of ~1M 2-row
            couples costs ~5 ns/row — the routed plans do it at
            tens of Gvalues/s);
  level 2+  aggregation levels: spatially-chunked (RCB) aggregates with a
            RIGID-BODY near-nullspace tentative prolongator
            (Vanek/Mandel/Brezina smoothed-aggregation construction,
            unsmoothed P), Galerkin block operators stored as padded
            block-ELL ([nA, K, b, b] values + neighbor ids — one gather +
            one einsum per apply, MXU-friendly);
  coarsest  dense pseudo-inverse (built once on host at setup, applied as
            a device matmul).

Chebyshev/Jacobi smoothing at every level (fixed degree — linear AND
symmetric, so the V-cycle is a valid plain-CG preconditioner).  Unlike
``solvers/twolevel.py`` there is NO ``pure_callback`` host round trip per
application and no SuperLU coarse-memory wall: host work happens once at
build (small scipy Galerkin products on the P1-and-coarser levels only —
the P2 level is never assembled), after which ``solve`` is a single jitted
MG-PCG dispatch with the whole hierarchy passed as a pytree argument.

Setup cost: the P1 scipy assembly + per-aggregate QRs + one or two
Galerkin triple products on ~1/8-size systems — seconds at 1M fine DOF.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.structured_mg import _chebyshev
from ..sparse.route import plan_copy, plan_reduce, CopyPlan, ReducePlan
from ..sparse.routed_ebe import RoutedEBE
from . import cg as cg_mod


# ---------------------------------------------------------------------------
# Aggregation-level pieces
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AggLevel:
    """One aggregation level: the transfer FROM the parent level (whose
    units are ``n_units`` blocks of ``b_f`` dofs) into ``n_agg``
    aggregates of ``b_c`` dofs, plus this level's Galerkin operator in
    padded block-ELL form.  The last level carries no ELL operator
    (``vals is None``) — its correction is the dense coarsest solve."""

    Pblk: jnp.ndarray            # [n_units, b_f, b_c] masked tentative P
    agg_of: jnp.ndarray          # [n_units] int32 aggregate of each unit
    vals: jnp.ndarray | None     # [n_agg, K, b_c, b_c] ELL blocks
    nbr: jnp.ndarray | None      # [n_agg, K] int32 neighbor (n_agg = pad)
    diag: jnp.ndarray | None     # [n_agg, b_c] point diagonal
    lam: jnp.ndarray | float | None   # Gershgorin bound on lam(D^-1 A)
    n_agg: int

    def tree_flatten(self):
        return ((self.Pblk, self.agg_of, self.vals, self.nbr, self.diag,
                 self.lam), (self.n_agg,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    # -- device ops -------------------------------------------------------
    def restrict(self, r):
        """Parent residual [n_units, b_f] -> aggregate space [n_agg, b_c]."""
        contrib = jnp.einsum("vij,vi->vj", self.Pblk.astype(r.dtype), r)
        return jax.ops.segment_sum(contrib, self.agg_of,
                                   num_segments=self.n_agg)

    def prolong(self, uc):
        """[n_agg, b_c] -> parent space [n_units, b_f]."""
        return jnp.einsum("vij,vj->vi", self.Pblk.astype(uc.dtype),
                          uc[self.agg_of])

    def apply(self, u):
        """Block-ELL SpMV at this level: u [n_agg, b_c] -> A u."""
        up = jnp.concatenate([u, jnp.zeros((1, u.shape[1]), u.dtype)])
        un = up[self.nbr]                                  # [nA, K, b]
        return jnp.einsum("akij,akj->ai", self.vals.astype(u.dtype), un)


def _rcb_chunks(pos, size):
    """Aggregate unit ids into spatially-compact chunks of ~``size`` via
    recursive coordinate bisection order.  Returns (agg_of [n], n_agg)."""
    from ..mesh.reorder import rcb_order

    n = len(pos)
    order = rcb_order(np.asarray(pos))
    n_agg = max(1, -(-n // size))
    agg_of = np.empty(n, np.int64)
    # equal-size contiguous chunks along the RCB order
    bounds = np.linspace(0, n, n_agg + 1).astype(np.int64)
    for a in range(n_agg):
        agg_of[order[bounds[a]:bounds[a + 1]]] = a
    return agg_of, n_agg


def _rigid_modes(pos, d):
    """[n, d, n_modes] rigid translation+rotation near-nullspace."""
    n = len(pos)
    nm = 3 if d == 2 else 6
    B = np.zeros((n, d, nm))
    for c in range(d):
        B[:, c, c] = 1.0
    if d == 2:
        B[:, 0, 2] = -pos[:, 1]
        B[:, 1, 2] = pos[:, 0]
    else:
        for axis in range(3):
            a, b = (axis + 1) % 3, (axis + 2) % 3
            B[:, a, 3 + axis] = -pos[:, b]
            B[:, b, 3 + axis] = pos[:, a]
    return B


def _tentative_prolongator(B, agg_of, n_agg):
    """Per-aggregate QR of the near-nullspace (Vanek/Mandel/Brezina):
    B [n_units, b_f, nm] (already masked at fixed dofs) ->
    (Pblk [n_units, b_f, nm] with orthonormal per-aggregate columns,
    B_coarse [n_agg, nm, nm] the R factors = coarse near-nullspace)."""
    n_units, b_f, nm = B.shape
    Pblk = np.zeros((n_units, b_f, nm))
    Bc = np.zeros((n_agg, nm, nm))
    order = np.argsort(agg_of, kind="stable")
    bounds = np.searchsorted(agg_of[order], np.arange(n_agg + 1))
    for a in range(n_agg):
        rows = order[bounds[a]:bounds[a + 1]]
        M = B[rows].reshape(len(rows) * b_f, nm)
        if M.shape[0] < nm:      # degenerate tiny aggregate: pad rows
            M = np.concatenate([M, np.zeros((nm - M.shape[0], nm))])
        Q, R = np.linalg.qr(M)
        Q = Q[: len(rows) * b_f]
        # rank guard: null columns (fully-fixed aggregates / degenerate
        # geometry) get zero weight — their coarse dof goes dead and the
        # Galerkin diagonal fix below gives it an identity row
        keep = np.abs(np.diagonal(R)) > 1e-10 * max(
            np.abs(np.diagonal(R)).max(), 1e-300)
        Q = Q * keep[None, :]
        R = R * keep[:, None]
        Pblk[rows] = Q.reshape(len(rows), b_f, nm)
        Bc[a] = R
    return Pblk, Bc


def _scipy_P(Pblk, agg_of, n_agg):
    import scipy.sparse as sp

    n_units, b_f, nm = Pblk.shape
    rows = np.repeat(np.arange(n_units * b_f), nm)
    cols = (agg_of[:, None, None] * nm
            + np.broadcast_to(np.arange(nm), (n_units, b_f, nm))).reshape(-1)
    return sp.coo_matrix(
        (Pblk.reshape(-1), (rows, cols)),
        shape=(n_units * b_f, n_agg * nm)).tocsr()


def _to_ell(A, b):
    """scipy CSR [n*b, n*b] -> padded block-ELL (vals [n, K, b, b],
    nbr [n, K] with pad id n, point diag [n, b], Gershgorin lam)."""
    n = A.shape[0] // b
    Ab = A.tobsr(blocksize=(b, b))
    counts = np.diff(Ab.indptr)
    K = max(int(counts.max()), 1)
    vals = np.zeros((n, K, b, b))
    nbr = np.full((n, K), n, np.int64)
    for i in range(n):
        lo, hi = Ab.indptr[i], Ab.indptr[i + 1]
        vals[i, : hi - lo] = Ab.data[lo:hi]
        nbr[i, : hi - lo] = Ab.indices[lo:hi]
    diag = A.diagonal().reshape(n, b)
    # dead dofs (zero diagonal, e.g. rank-dropped coarse modes): identity
    dead = diag <= 0
    if dead.any():
        di, db = np.nonzero(dead)
        diag[dead] = 1.0
        # write 1.0 on the diagonal inside the self block (create one if
        # the row is empty)
        for i, c in zip(di, db):
            slot = np.nonzero(nbr[i] == i)[0]
            if len(slot) == 0:
                slot = np.nonzero(nbr[i] == n)[0][:1]
                nbr[i, slot[0]] = i
            vals[i, slot[0], c, c] = 1.0
    absA = abs(A)
    rowsum = np.asarray(absA.sum(axis=1)).reshape(-1)
    dflat = diag.reshape(-1)
    lam = float(np.max(rowsum / np.where(dflat > 0, dflat, 1.0))) * 1.05
    return vals, nbr, diag, lam


# ---------------------------------------------------------------------------
# The hierarchy
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class UnstructuredMG:
    """Multilevel V-cycle preconditioner + solver for unstructured P2
    meshes.  Operates in the FINE ROUTED KERNEL'S internal ordering —
    ``precondition`` maps internal residuals to internal corrections;
    ``solve`` converts once each way.  Pass the object as a jit ARGUMENT
    (pytree), never a closure constant."""

    rk_f: RoutedEBE              # fine P2 operator (internal order)
    diag_f: jnp.ndarray          # [Nf, d]
    free_f: jnp.ndarray          # [Nf, d] 1.0/0.0
    tr_p: CopyPlan               # P1 -> P2 prolongation ([2*d*Nf] slots)
    tr_r: ReducePlan             # P2 -> P1 restriction
    rk_c: RoutedEBE              # P1 operator (its own internal order)
    diag_c: jnp.ndarray          # [NC, d]
    free_c: jnp.ndarray          # [NC, d]
    levels: tuple                # AggLevel...
    Cinv: jnp.ndarray            # dense coarsest pseudo-inverse
    lam: jnp.ndarray             # [2] Gershgorin bounds (P2, P1)
    nu: int
    d: int
    Nf: int
    NC: int

    # -- build -----------------------------------------------------------
    @classmethod
    def build(cls, sim, fixed_mask=None, nu: int = 3,
              agg_size: int = 32, coarse_target: int = 1600,
              rk=None, dtype=jnp.float32) -> "UnstructuredMG":
        """sim: ElasticitySimulator (any dof_map incl. periodic).

        fixed_mask [num_dofs, d] bool (None -> sim.dirichlet_mask); the
        hierarchy is masked to the free subspace at every level (fixed
        fine dofs zero the prolongator rows, so coarse operators act on
        free interpolants only — the StructuredMG treatment)."""
        import scipy.sparse as sp

        from ..ops import element_matrices as em
        from ..sparse import assembly

        mesh = sim.mesh
        d = sim.dim
        ND = sim.num_dofs
        dof_map = np.asarray(sim.dof_map)
        if fixed_mask is None:
            fixed_mask = sim.dirichlet_mask
        fixed = np.asarray(fixed_mask, bool).reshape(ND, d)

        # fine routed kernel (internal RCB/first-touch order)
        rk_f = sim.routed_kernel() if rk is None else rk
        order_f = (np.arange(ND) if rk_f.order is None
                   else np.asarray(rk_f.order))
        free_f = jnp.asarray((~fixed)[order_f], dtype)
        diag_f = rk_f.diagonal().astype(dtype)

        # ---- P1 level (exactly nested) --------------------------------
        # coarse dofs = unique vertex dofs under the dof map
        vdofs = dof_map[np.asarray(mesh.vertex_nodes)]
        cuniq, cidx = np.unique(vdofs, return_inverse=True)
        NC = len(cuniq)
        ep = mesh.node_endpoint_vertices()               # [N, 2] vertices
        first = np.zeros(ND, np.int64)
        u_dofs, firsts = np.unique(dof_map, return_index=True)
        first[u_dofs] = firsts
        epd = ep[first]                                  # per-dof endpoints
        cA_dof, cB_dof = cidx[epd[:, 0]], cidx[epd[:, 1]]

        g = sim.geom
        Ke1 = em.element_elasticity(g.grad_lambda, g.volume, sim.D, 1)
        elem_c = cidx[np.asarray(mesh.F)]                # [E, K+1] P1 dofs
        # representative position per P1 dof (periodic mates coincide
        # modulo the cell; any representative keeps RCB locality)
        pos_c = np.zeros((NC, mesh.node_positions.shape[1]))
        pos_c[cidx] = np.asarray(mesh.V)
        rk_c = RoutedEBE.build(jnp.asarray(Ke1, jnp.float32), elem_c, NC,
                               d, coords=pos_c)
        order_c = (np.arange(NC) if rk_c.order is None
                   else np.asarray(rk_c.order))
        rank_c = np.empty(NC, np.int64)
        rank_c[order_c] = np.arange(NC)
        diag_c = rk_c.diagonal().astype(dtype)
        fixed_c = fixed[cuniq][order_c]                  # [NC, d] internal
        free_c = jnp.asarray(~fixed_c, dtype)

        # routed P2<->P1 transfer plans (internal orders on both sides)
        cA_i = rank_c[cA_dof[order_f]]
        cB_i = rank_c[cB_dof[order_f]]
        Nf = ND
        coff = np.arange(d, dtype=np.int64) * NC
        ids = np.stack([coff[:, None] + cA_i[None, :],
                        coff[:, None] + cB_i[None, :]])  # [2, d, Nf]
        tr_p = plan_copy(ids.reshape(-1), d * NC)
        tr_r = plan_reduce(ids.reshape(-1), d * NC, 2 * d * Nf)

        # ---- aggregation levels on the host (setup only) ---------------
        A1 = assembly.assemble_scipy(np.asarray(Ke1), elem_c, NC, d=d)
        A1 = A1.tocsr()
        # permute into rk_c's internal order so host Galerkin matches the
        # device-side unit indexing
        pvec = (order_c[:, None] * d + np.arange(d)).reshape(-1)
        A1 = A1[pvec][:, pvec].tocsr()

        nm = 3 if d == 2 else 6
        B = _rigid_modes(pos_c[order_c], d)              # [NC, d, nm]
        B = B * (~fixed_c)[:, :, None]                   # mask fixed rows
        levels = []
        A_lvl = A1
        pos_lvl = pos_c[order_c]
        b_f = d
        n_units = NC
        while n_units * nm > coarse_target and n_units > 2 * agg_size:
            agg_of, n_agg = _rcb_chunks(pos_lvl, agg_size)
            Pblk, Bc = _tentative_prolongator(B.reshape(n_units, b_f, nm),
                                              agg_of, n_agg)
            P = _scipy_P(Pblk, agg_of, n_agg)
            A_next = (P.T @ A_lvl @ P).tocsr()
            # aggregate centroids for the next clustering round
            cnt = np.bincount(agg_of, minlength=n_agg).astype(float)
            cent = np.zeros((n_agg, pos_lvl.shape[1]))
            np.add.at(cent, agg_of, pos_lvl)
            cent /= np.maximum(cnt, 1.0)[:, None]
            levels.append((Pblk, agg_of, n_agg, A_next))
            A_lvl, pos_lvl = A_next, cent
            B = Bc                                       # [n_agg, nm, nm]
            b_f, n_units = nm, n_agg

        # convert to device AggLevels; the LAST level gets the dense
        # pseudo-inverse instead of an ELL operator
        agg_levels = []
        for i, (Pblk, agg_of, n_agg, A_next) in enumerate(levels):
            if i + 1 < len(levels):
                vals, nbr, diag, lam = _to_ell(A_next, nm)
                agg_levels.append(AggLevel(
                    jnp.asarray(Pblk, dtype), jnp.asarray(agg_of, jnp.int32),
                    jnp.asarray(vals, dtype), jnp.asarray(nbr, jnp.int32),
                    jnp.asarray(diag, dtype), jnp.asarray(lam, dtype),
                    n_agg))
            else:
                agg_levels.append(AggLevel(
                    jnp.asarray(Pblk, dtype), jnp.asarray(agg_of, jnp.int32),
                    None, None, None, None, n_agg))
        if levels:
            # masked by construction: the P1->agg prolongator rows were
            # zeroed at fixed P1 dofs, so the Galerkin chain only sees the
            # free subspace (dead coarse dofs get identity rows below)
            Ad = np.asarray(levels[-1][3].todense())
        else:
            # tiny problems: P1 is already the coarsest — dense-solve the
            # MASKED operator (an unmasked coarse solve returns
            # corrections that violate the Dirichlet data and the V-cycle
            # stalls near the boundary)
            m1 = (~fixed_c).astype(float).reshape(-1)
            Ad = np.asarray(A_lvl.todense()) * m1[:, None] * m1[None, :]
        dead = Ad.diagonal() <= 0
        if dead.any():
            Ad = Ad + np.diag(dead.astype(float))
        Cinv = jnp.asarray(np.linalg.pinv(Ad, rcond=1e-10,
                                          hermitian=True), dtype)

        # ---- spectral bounds (Gershgorin) -------------------------------
        # P1: exact from the assembled matrix
        rowsum1 = np.asarray(abs(A1).sum(axis=1)).reshape(-1)
        d1 = A1.diagonal()
        lam1 = float(np.max(rowsum1 / np.where(d1 > 0, d1, 1.0))) * 1.05
        # P2: |Ke| row sums scattered (upper-bounds the assembled row sums)
        Keabs = jnp.sum(jnp.abs(jnp.asarray(sim.Ke, dtype)), axis=2)
        rs = jax.ops.segment_sum(
            Keabs.reshape(-1, d),
            jnp.asarray(np.asarray(sim.elem_dofs).reshape(-1)),
            num_segments=ND)
        df = np.asarray(sim.K_diagonal(), np.float64)
        lam0 = float(np.max(np.asarray(rs, np.float64)
                            / np.where(df > 0, df, 1.0))) * 1.05
        lam = jnp.asarray([lam0, lam1], dtype)

        return cls(rk_f, diag_f, free_f, tr_p, tr_r, rk_c, diag_c, free_c,
                   tuple(agg_levels), Cinv, lam, nu, d, Nf, NC)

    # -- transfers ---------------------------------------------------------
    def _prolong_f(self, uc):
        """P1 internal [NC, d] -> P2 internal [Nf, d]."""
        src = uc.T.reshape(-1)
        z = self.tr_p(src, interpret=self.rk_f.interpret) \
            .reshape(2, self.d, self.Nf)
        return (0.5 * (z[0] + z[1])).T

    def _restrict_f(self, r):
        """P2 internal [Nf, d] -> P1 internal [NC, d]."""
        planes = r.T.reshape(-1)
        src = jnp.concatenate([planes, planes]) * 0.5
        y = self.tr_r(src, interpret=self.rk_f.interpret)
        return y.reshape(self.d, self.NC).T

    # -- V-cycle -----------------------------------------------------------
    def precondition(self, r):
        """Internal fine residual [Nf, d] -> correction (one symmetric
        V-cycle; linear, SPD on the free subspace).  All matmuls run at
        HIGHEST precision — the cycle amplifies low modes ~1e3x and CG
        sees an indefinite operator under bf16 contraction noise (same
        failure measured for the structured path, ``ops/structured_mg``)."""
        with jax.default_matmul_precision("highest"):
            return self._vcycle(r)

    def _vcycle(self, r):
        mask = self.free_f
        S = _chebyshev(self.rk_f, self.diag_f, mask, self.lam[0], self.nu)
        r = r * mask
        x = S(r)
        res = (r - self.rk_f(x)) * mask
        rc = self._restrict_f(res) * self.free_c
        xc = self._cycle_p1(rc)
        x = x + self._prolong_f(xc) * mask
        x = x + S((r - self.rk_f(x)) * mask)
        return x

    def _cycle_p1(self, rc):
        if not self.levels:
            return self._coarse_solve(rc)
        S = _chebyshev(self.rk_c, self.diag_c, self.free_c, self.lam[1],
                       self.nu)
        x = S(rc)
        res = (rc - self.rk_c(x)) * self.free_c
        r2 = self.levels[0].restrict(res)
        x2 = self._cycle_agg(0, r2)
        x = x + self.levels[0].prolong(x2) * self.free_c
        x = x + S((rc - self.rk_c(x)) * self.free_c)
        return x

    def _cycle_agg(self, i, r):
        lvl = self.levels[i]
        if i == len(self.levels) - 1:
            return self._coarse_solve(r)
        ones = jnp.ones_like(r)   # agg levels are mask-free (masked P)
        S = _chebyshev(lvl.apply, lvl.diag, ones, lvl.lam, self.nu)
        x = S(r)
        res = r - lvl.apply(x)
        nxt = self.levels[i + 1]
        rc = nxt.restrict(res)
        xc = self._cycle_agg(i + 1, rc)
        x = x + nxt.prolong(xc)
        x = x + S(r - lvl.apply(x))
        return x

    def _coarse_solve(self, r):
        shp = r.shape
        return (self.Cinv.astype(r.dtype) @ r.reshape(-1)).reshape(shp)

    # -- end-to-end solve --------------------------------------------------
    def solve(self, b, fixed_values=None, tol: float = 1e-8,
              maxiter: int = 400, project=None):
        """MG-PCG on user-ordered b [ND, d]; returns (u [ND, d] in USER
        dof order, CGResult).  One jitted dispatch (hierarchy rides as a
        pytree argument).  ``project``: optional extra projector applied
        with the free mask (e.g. the periodic translation projector)."""
        rk = self.rk_f
        b_i = rk.permute_in(jnp.asarray(b, self.diag_f.dtype))
        u_d = None
        if fixed_values is not None:
            vals_i = rk.permute_in(
                jnp.asarray(fixed_values, self.diag_f.dtype))
            u_d = vals_i * (1.0 - self.free_f)
        x, iters, resnorm = _amg_pcg(self, b_i, u_d, tol, maxiter)
        return rk.permute_out(x), cg_mod.CGResult(x, iters, resnorm)

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return ((self.rk_f, self.diag_f, self.free_f, self.tr_p, self.tr_r,
                 self.rk_c, self.diag_c, self.free_c, self.levels,
                 self.Cinv, self.lam),
                (self.nu, self.d, self.Nf, self.NC))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, *aux)


@functools.partial(jax.jit, static_argnames=("tol", "maxiter"))
def _amg_pcg(mg, b_i, u_d, tol, maxiter):
    """Jitted MG-PCG core — every array enters through the ``mg`` pytree
    (closure-captured routed-kernel tables constant-bake hundreds of MB
    through the compile service; see ``cg.cg_operator``)."""
    with jax.default_matmul_precision("highest"):
        mask = mg.free_f
        if u_d is not None:
            b_i = b_i - mg.rk_f(u_d)
        res = cg_mod.cg(mg.rk_f, b_i, M_inv=mg.precondition,
                        project=lambda v: v * mask, tol=tol,
                        maxiter=maxiter)
        x = res.x if u_d is None else res.x + u_d
        return x, res.iters, res.resnorm
