"""Periodic homogenization of effective elasticity tensors.

Parity with reference ``PeriodicHomogenization.hh`` and
``OrthotropicHomogenization.hh``:

* cell problems: for each canonical macroscopic strain e^ij, solve
      -div C : [strain(w^ij) + e^ij] = 0,  w^ij cell-periodic
  (``solveCellProblems``, ``PeriodicHomogenization.hh:34-54``) — here via a
  periodic DOF map + translation projection instead of constraint rows;
* homogenized tensor, stress form (``:72-128``) and boundary/displacement
  form (``:146-186``);
* macroscopic-to-microscopic strain tensors (``:195``), strain/displacement
  probes (python binding ``periodic_homogenization.cc:159-163``);
* orthotropic base cell variant: symmetry-plane normal pinning instead of
  periodicity, 1 stretch + N(N-1)/2 shear systems, full-tensor
  reconstruction by reflection signs (``OrthotropicHomogenization.hh``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..mesh import periodic as per
from ..mesh.geometry import BBox
from ..fem import elasticity_tensor as et
from ..fem import shape_functions as sf
from ..fem.flattening import flat_len, flat_rows_cols, shear_doubler
from ..physics.elasticity import ElasticitySimulator
from ..solvers import cg as cg_mod


@dataclasses.dataclass
class HomogenizationResult:
    """Mirrors the python binding's ``HomogenizationResult``
    (``periodic_homogenization.cc:22-31``)."""

    Ch: jnp.ndarray            # [fl, fl] homogenized tensor (D matrix)
    w: jnp.ndarray             # [fl, N, dim] fluctuation displacements
    strain_w: jnp.ndarray      # [fl, E, fl] average fluctuation strains
    cg_iters: list

    @property
    def tensor(self) -> et.ElasticityTensor:
        return et.ElasticityTensor(self.Ch)


def canonical_strain(dim: int, i: int, dtype=jnp.float64):
    """SMatrix::CanonicalBasis(i) (``SymmetricMatrix.hh:407-413``): the
    symmetrized basis e^(kl) = 1/2 (e_k x e_l + e_l x e_k) — raw flat
    component 1 on diagonal slots, 0.5 on shear slots."""
    e = jnp.zeros(flat_len(dim), dtype=dtype)
    return e.at[i].set(1.0 if i < dim else 0.5)


def solve_cell_problems(sim: ElasticitySimulator, tol: float = 1e-11,
                        maxiter: int = 100000, precond: str = "block",
                        chebyshev_degree: int = 6, operator: str = "auto"):
    """Solve the fl(N) cell problems on a periodic simulator — as ONE block
    CG over all fl right-hand sides (the EBE kernel's gathers are row-count
    bound, so the multi-RHS solve costs barely more than a single one).

    ``sim`` must have been built with a periodic dof_map (see
    :func:`periodic_simulator`).  ``precond``: 'jacobi' | 'block' (d x d
    node blocks) | 'chebyshev' (k-step polynomial in the block-Jacobi
    preconditioned operator) | 'twolevel' / 'twolevel-mult' (P1-coarse
    two-level, ``solvers/twolevel.py`` — the high-contrast workhorse on
    unstructured cells) | 'multigrid' (periodic torus V-cycle for
    Kuhn-GRID cells, ``ops/structured_periodic.py`` — MG-bounded
    iteration counts; raises off-grid).

    ``operator``: 'auto' runs the routed in-register multi-RHS SpMV
    (``RoutedEBE.apply_block``) on TPU past ~16k elements for the
    jacobi/block preconditioners — all fl cell problems amortize one
    routing-plan dispatch sequence, wrapped in f64 iterative refinement
    below f32 reach (the role ``PeriodicHomogenization.hh:48-53`` gives
    one CHOLMOD factorization + 6 back-substitutions); 'routed' / 'ebe'
    force a path.  Returns (w [fl, N, dim], iters list)."""
    from ..solvers import precond as pc

    dim = sim.dim
    fl = flat_len(dim)
    # Translation-invariance: project translations out of the periodic
    # system (replaces the pin / no-rigid-translation constraint).  The
    # translation basis is exactly the per-component constant vector, so the
    # projection is exact mean subtraction — no QR, bit-accurate on TPU
    # (an inexact projector lets the singular system's null component grow).
    project = lambda v: v - jnp.mean(v, axis=0, keepdims=True)
    if precond == "multigrid":
        # grid cells (voxel/pixel microstructures): periodic torus
        # multigrid — MG-bounded iteration counts per cell problem;
        # raises ValueError off-grid
        if dim == 3:
            from ..ops.structured_periodic import solve_cell_problems_grid

            return solve_cell_problems_grid(sim, tol=tol, maxiter=maxiter)
        from ..ops.structured_periodic2d import solve_cell_problems_grid2d

        return solve_cell_problems_grid2d(sim, tol=tol, maxiter=maxiter)
    if (operator == "routed"
            or (operator == "auto" and precond in ("jacobi", "block")
                and sim._routed_auto())):
        return _solve_cell_problems_routed(sim, tol, maxiter, precond,
                                           project)
    if precond == "jacobi":
        diag = sim.K_diagonal()
        safe = jnp.where(diag > 0, diag, 1.0)
        M_inv = lambda r: r / (safe if r.ndim == 2 else safe[..., None])
    elif precond in ("twolevel", "twolevel-mult"):
        # P1-coarse two-level (solvers/twolevel.py): bounded iteration
        # counts at high contrast — the role CHOLMOD's factorization
        # plays for the reference (PeriodicHomogenization.hh:48-53)
        from ..solvers.twolevel import TwoLevel

        tl = TwoLevel.from_simulator(
            sim, mode=("multiplicative" if precond.endswith("mult")
                       else "additive"), project=project)
        M_inv = tl.M_inv
    else:
        blocks = pc.node_block_diagonal(sim.Ke, sim.elem_dofs, sim.num_dofs,
                                        dim)
        M_inv = pc.block_jacobi_apply(pc.block_jacobi_inv(blocks))
        if precond == "chebyshev":
            Ap = lambda v: project(sim.apply_K(v))
            Mp = lambda r: project(M_inv(r))
            lmax = pc.estimate_lambda_max(Ap, Mp, (sim.num_dofs, dim),
                                          dtype=sim.Ke.dtype)
            M_inv = pc.chebyshev_preconditioner(
                Ap, M_inv, lmax, degree=chebyshev_degree, project=project)

    B = jnp.stack([sim.constant_strain_load(
        -canonical_strain(dim, i, sim.Ke.dtype)) for i in range(fl)],
        axis=-1)                                           # [Nd, dim, fl]
    res = cg_mod.cg_block(sim.apply_K, B, M_inv=M_inv, project=project,
                          tol=tol, maxiter=maxiter)
    w = jnp.moveaxis(res.x, -1, 0)[:, jnp.asarray(sim.dof_map)]
    return w, [int(res.iters)] * fl


def _solve_cell_problems_routed(sim, tol, maxiter, precond, project):
    """All fl cell problems through ONE routed multi-RHS block CG
    (``RoutedEBE.apply_block``): the routing plan is RHS-independent, so
    the per-dispatch overhead that dominates the single-vector routed
    apply amortizes across the block — the TPU answer to the reference's
    factorize-once / 6-back-substitutions amortization
    (``PeriodicHomogenization.hh:48-53``).  f32 block CG, wrapped in f64
    iterative refinement (EBE f64 residuals) below f32 reach.

    The translation projector (mean over the node axis) is permutation-
    invariant, so it applies unchanged in the operator's internal
    ordering."""
    from ..solvers import precond as pc
    from ..solvers.refine import refine as mp_refine

    dim = sim.dim
    fl = flat_len(dim)
    f32 = jnp.float32
    rk = sim.routed_kernel(block_rhs=fl)   # fl-column block plans: one
    diag_i = rk.diagonal()                 # index stream for all columns
    if precond == "jacobi":
        safe = jnp.where(diag_i > 0, diag_i, 1.0)
        M_inv = lambda r: r / (safe if r.ndim == 2 else safe[..., None])
    else:  # block Jacobi, permuted into the internal ordering
        blocks = pc.node_block_diagonal(jnp.asarray(sim.Ke, f32),
                                        sim.elem_dofs, sim.num_dofs, dim)
        if rk.order is not None:
            blocks = blocks[rk.order]
        M_inv = pc.block_jacobi_apply(pc.block_jacobi_inv(blocks))

    B = jnp.stack([sim.constant_strain_load(
        -canonical_strain(dim, i, sim.Ke.dtype)) for i in range(fl)],
        axis=-1)                                           # [Nd, dim, fl]

    def solve_lo_block(Bi, lo_tol, lo_maxiter):
        res = cg_mod.cg_block(rk.apply_block, Bi, M_inv=M_inv,
                              project=project, tol=lo_tol,
                              maxiter=lo_maxiter)
        return res

    if sim.Ke.dtype != jnp.float64 or tol >= 1e-5:
        res = solve_lo_block(project(rk.permute_in(jnp.asarray(B, f32))),
                             tol, maxiter)
        X = rk.permute_out(res.x).astype(sim.Ke.dtype)
        iters = [int(res.iters)] * fl
    else:
        # f64 refinement: EBE f64 residuals, routed f32 block corrections
        apply_hi = lambda X: project(sim.apply_K(X))
        b64 = project(jnp.asarray(B, jnp.float64))

        def solve_lo(R32):
            res = solve_lo_block(project(rk.permute_in(R32)), 1e-4,
                                 maxiter)
            return rk.permute_out(res.x), res.iters

        ref = mp_refine(apply_hi, solve_lo, b64, tol=tol)
        X = ref.x
        iters = [int(ref.inner_iters)] * fl
    w = jnp.moveaxis(X, -1, 0)[:, jnp.asarray(sim.dof_map)]
    return w, iters


def periodic_simulator(mesh: FEMMesh, material, cell: BBox | None = None,
                       eps: float = 1e-7,
                       permit_mismatch: bool = False) -> ElasticitySimulator:
    """Build an ElasticitySimulator with periodic DOF identification
    (replaces ``applyPeriodicConditions``, ``LinearElasticity.hh:845``)."""
    dof_map, num_dofs, _ = per.match_periodic_nodes(
        mesh.node_positions, cell or mesh.bbox(), eps,
        permit_mismatch=permit_mismatch)
    return ElasticitySimulator(mesh, material, dof_map=dof_map)


def homogenized_tensor_stress_form(sim: ElasticitySimulator, w,
                                   base_cell_volume: float | None = None):
    """Eh row i = <[C : strain(w_i)] + C row i> averaged over the cell
    (``homogenizedElasticityTensor``, ``PeriodicHomogenization.hh:72-128``)."""
    mesh = sim.mesh
    if base_cell_volume is None:
        base_cell_volume = mesh.bbox().volume()
    vol = sim.geom.volume
    rows = []
    for i in range(w.shape[0]):
        stress = sim.average_stress_field(w[i])          # [E, fl]
        rows.append(jnp.einsum("e,ea->a", vol, stress))
    Eh = jnp.stack(rows)                                  # [fl, fl]
    if sim.D.ndim == 2:
        Eh = Eh + sim.D * jnp.sum(vol)
    else:
        Eh = Eh + jnp.einsum("e,eab->ab", vol, sim.D)
    return Eh / base_cell_volume


def homogenized_tensor_displacement_form(sim: ElasticitySimulator, w,
                                         base_cell_volume: float | None = None):
    """Boundary-integral form (constant base material,
    ``homogenizedElasticityTensorDisplacementForm``,
    ``PeriodicHomogenization.hh:146-186``):
    Eh row i = C : nw^i + C * volFrac, nw^i = 1/2 int_dw (w x n + n x w)."""
    mesh = sim.mesh
    if base_cell_volume is None:
        base_cell_volume = mesh.bbox().volume()
    if sim.D.ndim != 2:
        raise ValueError("displacement form requires a constant base material")
    normals = sim.geom.bdry_normal                        # [B, dim]
    bvol = sim.geom.bdry_volume                           # [B]
    wgt = jnp.asarray(sf.integrated_shape_np(mesh.K - 1, mesh.degree),
                      dtype=bvol.dtype)                   # [nb]
    benodes = jnp.asarray(mesh.bdry_elem_nodes)           # [B, nb]
    r, c = flat_rows_cols(sim.dim)
    rows = []
    for i in range(w.shape[0]):
        wb = w[i][benodes]                                # [B, nb, dim]
        w_int = jnp.einsum("n,bnd->bd", wgt, wb) * bvol[:, None]
        nw = 0.5 * (jnp.einsum("bp,bq->bpq", w_int, normals)
                    + jnp.einsum("bq,bp->bpq", w_int, normals))
        nw_flat = jnp.sum(nw[:, r, c], axis=0)            # [fl]
        rows.append(et.double_contract(sim.D, nw_flat))
    Eh = jnp.stack(rows)
    Eh = Eh + sim.D * (jnp.sum(sim.geom.volume) / 1.0)
    return Eh / base_cell_volume


def macro_to_micro_strain(sim: ElasticitySimulator, w):
    """Per-element G tensors (minor- but not major-symmetric):
    G[e] row i = average strain of (w_i + e^i x) over element e
    (``macroStrainToMicroStrainTensors``)."""
    fl = w.shape[0]
    dim = sim.dim
    rows = []
    for i in range(fl):
        es = sim.average_strain_field(w[i])
        es = es.at[:, i].add(1.0 if i < dim else 0.5)
        rows.append(es)
    return jnp.stack(rows, axis=1)                        # [E, fl, fl]


def probe(sim: ElasticitySimulator, w, macro_strain_flat):
    """(u, strain) under a macroscopic strain: u = sum_i e_i w_i (+ macro
    part handled by the caller), strain field includes the macro strain
    (python binding ``probe``, ``periodic_homogenization.cc:159-163``)."""
    e = jnp.asarray(macro_strain_flat)
    # Decompose e in the canonical basis: shear basis elements carry 1/2, so
    # their coefficients are the shear-doubled raw components.
    coef = jnp.asarray(shear_doubler(sim.dim), dtype=e.dtype) * e
    u = jnp.einsum("i,ind->nd", coef, w)
    strain = sim.average_strain_field(u) + e[None, :]
    return u, strain


def homogenize_voxels(occupancy, E_solid: float = 1.0, nu: float = 0.3,
                      void_ratio: float = 1e-6, tol: float = 1e-9,
                      cell=None) -> "HomogenizationResult":
    """Homogenize a VOXEL/PIXEL microstructure directly: occupancy
    [nx, ny, nz] (3D) or [nx, ny] (2D), bool/0-1 -> grid cell with a
    two-phase material field (void as ``void_ratio * E_solid`` ersatz,
    the standard topology-optimization treatment) -> periodic torus
    multigrid cell problems (``ops/structured_periodic[2d].py``).  The
    voxel-design one-call entry point for the Elastic Textures
    workload."""
    from ..mesh import generators
    from ..physics.materials import MaterialField

    occ = np.asarray(occupancy)
    dim = occ.ndim
    if cell is None:
        cell = (1.0,) * dim
    if dim == 3:
        V, T = generators.grid_tet(*occ.shape, hi=tuple(cell))
        per_cell = 6
    else:
        V, T = generators.grid_tri(*occ.shape, hi=tuple(cell),
                                   diagonal="right")
        per_cell = 2
    mesh = FEMMesh(V, T, degree=2)
    E_cell = np.where(occ.reshape(-1) > 0, E_solid,
                      void_ratio * E_solid)
    E_field = np.repeat(E_cell, per_cell)
    mats = MaterialField.isotropic_field(
        dim, jnp.asarray(E_field), jnp.full(len(E_field), nu))
    return homogenize(mesh, mats, tol=tol, precond="multigrid")


def homogenize(mesh: FEMMesh, material, orthotropic_cell: bool = False,
               tol: float = 1e-11, center_fluctuations: bool = True,
               base_cell_volume: float | None = None,
               precond: str = "block") -> HomogenizationResult:
    """One-call homogenization (python binding ``homogenize``,
    ``periodic_homogenization.cc:37-90``).  ``precond`` as in
    :func:`solve_cell_problems` ('jacobi'|'block'|'chebyshev'|'twolevel'|
    'twolevel-mult'; the orthotropic path supports 'jacobi'|'twolevel')."""
    if orthotropic_cell:
        if precond.startswith("twolevel"):
            oprecond = "twolevel"
        elif precond == "multigrid":
            oprecond = "multigrid"
        else:
            oprecond = "jacobi"
        return homogenize_orthotropic(
            mesh, material, tol=tol, base_cell_volume=base_cell_volume,
            precond=oprecond)
    sim = periodic_simulator(mesh, material)
    w, iters = solve_cell_problems(sim, tol=tol, precond=precond)
    if center_fluctuations:
        w = w - jnp.mean(w, axis=1, keepdims=True)
    Ch = homogenized_tensor_stress_form(sim, w, base_cell_volume)
    strain_w = jnp.stack([sim.average_strain_field(w[i])
                          for i in range(w.shape[0])])
    return HomogenizationResult(Ch, w, strain_w, iters)


# ---------------------------------------------------------------------------
# Orthotropic base cell (OrthotropicHomogenization.hh)
# ---------------------------------------------------------------------------

def _ortho_fixed_masks(mesh: FEMMesh, eps: float = 1e-7):
    """Per-probe Dirichlet component masks on the symmetry planes.

    Returns (stretch_mask [N, dim] bool, shear_masks list of [N, dim]).
    Stretch probes w^ii: fix component c on faces with normal e_c.
    Shear probe s (plane ij): 3D fixes component s on every face, plus the
    third component on perpendicular faces; 2D fixes the tangential
    component (``OrthotropicHomogenization.hh:84-140``)."""
    dim = mesh.dim
    fm = per.face_membership(mesh.node_positions, mesh.bbox(), eps)
    on_face = fm.on_min | fm.on_max                      # [N, dim]
    stretch = np.zeros((mesh.num_nodes, dim), dtype=bool)
    for c in range(dim):
        stretch[on_face[:, c], c] = True
    shear_masks = []
    n_shear = flat_len(dim) - dim
    for s in range(n_shear):
        m = np.zeros((mesh.num_nodes, dim), dtype=bool)
        for c in range(dim):
            face_nodes = on_face[:, c]
            if dim == 3:
                m[face_nodes, s] = True
                if c != s:
                    m[face_nodes, 3 - (c + s)] = True
            else:
                m[face_nodes, 1 - c] = True
        shear_masks.append(m)
    return stretch, shear_masks


def homogenize_orthotropic(mesh: FEMMesh, material, tol: float = 1e-11,
                           base_cell_volume: float | None = None,
                           precond: str = "jacobi"
                           ) -> HomogenizationResult:
    """Homogenize using an orthotropic base cell (1/4 or 1/8 of the period
    cell): per-face normal pinning replaces periodicity, and the full-cell
    tensor follows from reflection-sign reconstruction."""
    dim = mesh.dim
    fl = flat_len(dim)
    sim = ElasticitySimulator(mesh, material)
    stretch_mask, shear_masks = _ortho_fixed_masks(mesh)
    if base_cell_volume is None:
        # The ortho cell is the full mesh bbox here; reflection
        # reconstruction divides by 2^N internally via sign averaging, so the
        # ortho-cell integrals are normalized by the ortho cell volume.
        base_cell_volume = mesh.bbox().volume()

    if precond == "multigrid":
        # Kuhn-grid ortho cells: one variable-D MG per probe mask (the
        # per-cell matrices dominate the build and could be shared;
        # factorizing the small coarse level per probe is cheap)
        from ..ops.structured_mg import (VarStructuredMG,
                                         _p1_cell_matrices_var)

        D = sim.D
        if getattr(D, "ndim", 0) == 2:
            D = jnp.broadcast_to(D, (mesh.num_elements,) + D.shape)
        # the per-cell P1 matrices depend only on (mesh, D) — compute
        # once and share across the fl probe builds (only masks, diags
        # and the coarse factorization differ per probe)
        Kc_shared = _p1_cell_matrices_var(mesh, D)
        ws, iters = [], []
        for i in range(fl):
            mask = stretch_mask if i < dim else shear_masks[i - dim]
            mg = VarStructuredMG.build(mesh, D,
                                       fixed_mask=jnp.asarray(mask),
                                       dtype=sim.Ke.dtype,
                                       Kc_fine=Kc_shared)
            rhs = sim.constant_strain_load(
                -canonical_strain(dim, i, sim.Ke.dtype))
            u, res = mg.solve(rhs, tol=tol)
            ws.append(u)
            iters.append(int(res.iters))
        w = jnp.stack(ws)
        EhO = homogenized_tensor_stress_form(sim, w, base_cell_volume)
        Ch = reconstruct_from_ortho_cell(EhO, dim)
        strain_w = jnp.stack([sim.average_strain_field(w[i])
                              for i in range(fl)])
        return HomogenizationResult(Ch, w, strain_w, iters)

    diag = sim.K_diagonal()
    safe = jnp.where(diag > 0, diag, 1.0)
    if precond == "twolevel":
        # the probes pin different faces per column; the coarse matrix is
        # masked with the UNION of all pins (intersection of free masks),
        # so its solve is well-posed (no regularized near-nullspace to
        # amplify) and every correction lies inside each column's
        # constrained subspace after the outer projector — B stays SPD
        # there, just slightly weaker at the pinned faces than per-column
        # factorizations would be
        from ..solvers.twolevel import TwoLevel

        free_all = jnp.ones((sim.num_dofs, dim), bool)
        for i in range(fl):
            m = stretch_mask if i < dim else shear_masks[i - dim]
            free_all = free_all & jnp.asarray(~m)
        tl = TwoLevel.from_simulator(sim, mode="additive",
                                     free_mask=free_all)
        M_inv = tl.M_inv
    else:
        M_inv = lambda r: r / safe[..., None]

    # ONE block CG over all fl probes with a per-column mask projector
    # (each probe pins different faces, but projection is elementwise, so
    # a [Nd, d, fl] mask stack keeps every column in its own constrained
    # subspace while the operator gathers amortize across the block —
    # same multi-RHS story as the periodic path's cell problems).
    free_cols = jnp.stack(
        [jnp.asarray(~(stretch_mask if i < dim else shear_masks[i - dim]),
                     sim.Ke.dtype) for i in range(fl)], axis=-1)
    project = lambda v: v * free_cols
    B = jnp.stack([sim.constant_strain_load(
        -canonical_strain(dim, i, sim.Ke.dtype)) for i in range(fl)],
        axis=-1)
    res = cg_mod.cg_block(sim.apply_K, B, M_inv=M_inv, project=project,
                          tol=tol, maxiter=100000)
    w = jnp.moveaxis(res.x, -1, 0)
    iters = [int(res.iters)] * fl

    EhO = homogenized_tensor_stress_form(sim, w, base_cell_volume)
    Ch = reconstruct_from_ortho_cell(EhO, dim)
    strain_w = jnp.stack([sim.average_strain_field(w[i]) for i in range(fl)])
    return HomogenizationResult(Ch, w, strain_w, iters)


def reconstruct_from_ortho_cell(EhO, dim: int):
    """Reflection-sign reconstruction
    (``homogenizedTensorFromOrthoCellQuantity``): averages sign-weighted
    copies over the 2^N reflections, zeroing non-orthotropic couplings."""
    fl = flat_len(dim)
    n_refl = 1 << dim

    def sign(ij, r):
        if ij < dim:
            return 1.0
        bits = [(r >> b) & 1 for b in range(dim)]
        if dim == 3:
            bits[ij - dim] = 0
        return -1.0 if sum(bits) == 1 else 1.0

    W = np.zeros((fl, fl))
    for r in range(n_refl):
        for kl in range(fl):
            for ij in range(fl):
                W[ij, kl] += sign(ij, r) * sign(kl, r)
    W /= n_refl
    return EhO * jnp.asarray(W, dtype=EhO.dtype)
