"""Linear elasticity simulator — the flagship module.

Parity with reference ``LinearElasticity.hh`` (``Simulator``,
``LinearElasticity.hh:435-1660``), redesigned TPU-first:

* element stiffness = constant reference tensor x batched einsum
  (``ops/element_matrices.element_elasticity`` replaces the
  ``perElementStiffness`` loop nest, ``LinearElasticity.hh:165-232``);
* assembly is matrix-free element-by-element apply + deterministic
  segment_sum (replaces TBB COO assembly, ``LinearElasticity.hh:1408-1466``);
* Dirichlet / periodic constraints by DOF-map gather + mask projection
  (replaces ``SPSDSystem`` Lagrange rows / ``fixVariables``);
* solve = Jacobi-preconditioned CG with f64 reductions, wrapped in
  ``lax.custom_linear_solve`` for implicit differentiation.

DOF layout: ``u[node, component]`` arrays; an optional ``dof_map [N] -> Nd``
identifies nodes (periodic conditions, ``PeriodicCondition``
``BoundaryConditions.hh:452-608``); reduced DOF vectors have shape [Nd, dim].
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..fem import shape_functions as sf, quadrature
from ..fem import elasticity_tensor as et
from ..fem.flattening import flat_len, shear_doubler
from ..ops import element_matrices as em
from ..sparse import assembly
from ..solvers import cg as cg_mod
from . import boundary_conditions as bc_mod
from .materials import Material, MaterialField


def von_mises(stress_flat, dim: int):
    """Von Mises stress from flattened stress [..., fl]
    (``VonMises.hh``; 2D uses the plane-stress formula)."""
    s = stress_flat
    if dim == 2:
        return jnp.sqrt(jnp.maximum(
            s[..., 0] ** 2 - s[..., 0] * s[..., 1] + s[..., 1] ** 2
            + 3.0 * s[..., 2] ** 2, 0.0))
    sxx, syy, szz, syz, sxz, sxy = (s[..., i] for i in range(6))
    return jnp.sqrt(jnp.maximum(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3.0 * (sxy ** 2 + syz ** 2 + sxz ** 2), 0.0))


class ElasticitySimulator:
    """Static linear elasticity on a FEMMesh."""

    def __init__(self, mesh: FEMMesh, material, dof_map=None,
                 node_positions=None):
        if mesh.dim != mesh.K:
            raise ValueError("elasticity requires embedding dim == K")
        self.mesh = mesh
        self.dim = mesh.dim
        if isinstance(material, Material):
            self.D = material.D
        elif isinstance(material, MaterialField):
            self.D = material.D
        else:
            self.D = jnp.asarray(material)
        g = mesh.geometry(node_positions)
        self.geom = g
        if jnp.any(g.volume <= 0):
            raise ValueError("mesh has non-positive element volumes "
                             "(reference rejects these too)")
        self.Ke = em.element_elasticity(g.grad_lambda, g.volume, self.D,
                                        mesh.degree)

        # DOF identification (identity unless periodic).
        if dof_map is None:
            self.dof_map = np.arange(mesh.num_nodes)
            self.num_dofs = mesh.num_nodes
        else:
            self.dof_map = np.asarray(dof_map)
            self.num_dofs = int(self.dof_map.max()) + 1
        self.elem_dofs = jnp.asarray(self.dof_map[mesh.elem_nodes])
        from ..sparse.ebe import EBEKernel

        self._kernel = EBEKernel.build(self.Ke, self.elem_dofs,
                                       self.num_dofs, self.dim)
        self._routed = None           # built lazily (routed_kernel)
        self._mg = None               # (fixed-mask key, StructuredMG)
        self._amg = None              # (fixed-mask key, UnstructuredMG)
        self._twolevel = {}           # (mode, mask key, ordered) -> TwoLevel

        # Boundary condition state.
        d = self.dim
        self.dirichlet_mask = np.zeros((self.num_dofs, d), dtype=bool)
        self.dirichlet_values = np.zeros((self.num_dofs, d))
        self.neumann_load = jnp.zeros((self.num_dofs, d),
                                      dtype=self.Ke.dtype)
        self.no_rigid_motion = False
        self._region_nodes: list = []   # dof ids per Dirichlet region (reports)

    # ------------------------------------------------------------------
    # Operator
    # ------------------------------------------------------------------
    def apply_K(self, u):
        """A @ u for u [Nd, dim] (or [Nd, dim, m] multi-RHS)."""
        return self._kernel(u)

    def K_diagonal(self):
        return self._kernel.diagonal()

    def routed_kernel(self, block_rhs: int | None = None):
        """The in-register routed SpMV operator (f32, internally RCB /
        first-touch reordered; ``sparse.routed_ebe``).  Built lazily —
        the host routing compile is seconds-to-tens-of-seconds at 10^5+
        elements and cached by connectivity.

        ``block_rhs``: ensure the operator carries d * block_rhs-plane
        block plans so ``apply_block`` with that many columns routes the
        whole block through one index stream (homogenization's fl cell
        problems); triggers a rebuild when the cached operator lacks
        them (cheap: the single-vector plans come from the plan cache)."""
        if (self._routed is not None and block_rhs
                and self._routed.bm != block_rhs):
            self._routed = None
        if self._routed is None:
            from ..sparse.routed_ebe import RoutedEBE
            from ..fem.elasticity_tensor import lame_parameters

            # dof coordinates: position of (a) node carrying each dof
            pos = np.zeros((self.num_dofs, self.mesh.node_positions.shape[1]))
            pos[self.dof_map] = np.asarray(self.mesh.node_positions)
            # constant isotropic material -> factored contraction: the
            # apply reads grad_lambda + vol ((K+1) dim + 1 f32/element)
            # instead of the (nd)^2 dense Ke (69x less element data).
            # OPT-IN for now: XLA lowers the factored T-contractions to
            # badly-padded batched MXU matmuls (27 ms vs 3.7 ms dense
            # apply measured on v5e at 1.17M DOF) — the win needs a fused
            # Pallas contract kernel; until then dense KeB stays default.
            import os

            factor = None
            if os.environ.get("MESHFEM_FACTORED"):
                lm = lame_parameters(self.D)
                if lm is not None:
                    factor = (self.geom.grad_lambda, self.geom.volume,
                              lm[0], lm[1], self.mesh.degree)
            self._routed = RoutedEBE.build(
                None if factor is not None else self.Ke,
                np.asarray(self.elem_dofs), self.num_dofs,
                self.dim, coords=pos, factor=factor,
                block_rhs=block_rhs)
        return self._routed

    def _routed_auto(self) -> bool:
        import os

        if jax.default_backend() != "tpu":
            return False
        return self.mesh.num_elements >= int(
            os.environ.get("MESHFEM_ROUTED_MIN_E", "16384"))

    def _twolevel_for(self, precond, free, node_order=None, project=None,
                      apply_A=None):
        """Cached TwoLevel build (host Galerkin + SuperLU factorize once
        per (mode, Dirichlet mask, ordering); the projector/operator
        closures are load-independent for a fixed mask)."""
        from ..solvers.twolevel import TwoLevel

        key = (precond, np.asarray(free).tobytes(), node_order is not None)
        tl = self._twolevel.get(key)
        if tl is None:
            tl = TwoLevel.from_simulator(
                self, mode=("multiplicative" if precond.endswith("mult")
                            else "additive"),
                free_mask=free, node_order=node_order,
                project=project, apply_A=apply_A)
            if len(self._twolevel) >= 4:
                self._twolevel.pop(next(iter(self._twolevel)))
            self._twolevel[key] = tl
        return tl

    def _structured_eligible(self) -> bool:
        """Cheap pre-filter for the structured multigrid path (the full
        Kuhn-grid validation runs inside StructuredP2Elasticity.build)."""
        return (self.dim == 3 and self.mesh.degree == 2
                and getattr(self.D, "ndim", 0) in (2, 3)  # uniform / field
                and self.num_dofs == self.mesh.num_nodes  # no periodic ids
                and not self.no_rigid_motion
                and self.dirichlet_mask.any()
                and self.mesh.num_elements >= 3000)

    def _solve_structured(self, b, fixed, vals, tol, maxiter):
        """Kuhn-grid fast path: V-cycle-preconditioned CG
        (``ops/structured_mg``), f64-refined on f32 backends.  Raises
        ValueError when the mesh fails the Kuhn-grid validation."""
        from ..ops.structured_mg import StructuredMG, VarStructuredMG
        from ..solvers import refine as refine_mod
        from .. import config

        key = self.dirichlet_mask.tobytes()
        if self._mg is None or self._mg[0] != key:
            f64_dev = config.x64_enabled() \
                and jax.default_backend() == "cpu"
            cls_mg = (VarStructuredMG if getattr(self.D, "ndim", 0) == 3
                      else StructuredMG)   # per-element material fields
            mg = cls_mg.build(
                self.mesh, self.D, fixed_mask=jnp.asarray(fixed),
                dtype=jnp.float64 if f64_dev else jnp.float32)
            self._mg = (key, mg)
        mg = self._mg[1]
        dt = mg.free_packed.dtype if hasattr(mg, "free_packed") \
            else mg.free_ch.dtype
        if dt == jnp.float64 or tol >= 1e-5:
            u, res = mg.solve(jnp.asarray(b, dt),
                              fixed_values=jnp.asarray(vals, dt),
                              tol=tol, maxiter=maxiter)
            u_dof = jnp.asarray(u, b.dtype)
            return u_dof[jnp.asarray(self.dof_map)], res

        # f32 device MG + f64 residual refinement (solvers/refine)
        free64 = (~fixed).astype(jnp.float64)
        u_d = jnp.where(fixed, vals, 0.0)
        apply_hi = lambda x: self.apply_K(x) * free64
        rhs64 = (jnp.asarray(b, jnp.float64)
                 - self.apply_K(jnp.asarray(u_d, jnp.float64))) * free64

        def solve_lo(r32):
            u, r = mg.solve(r32, tol=1e-4, maxiter=120)
            return u, r.iters

        ref = refine_mod.refine(apply_hi, solve_lo, rhs64, tol=tol)
        u_dof = ref.x + jnp.asarray(u_d, jnp.float64)
        return (u_dof[jnp.asarray(self.dof_map)],
                cg_mod.CGResult(u_dof, ref.inner_iters, ref.resnorm))

    def to_scipy(self):
        return assembly.assemble_scipy(np.asarray(self.Ke),
                                       np.asarray(self.elem_dofs),
                                       self.num_dofs, d=self.dim)

    # ------------------------------------------------------------------
    # Boundary conditions (reference applyBoundaryConditions,
    # LinearElasticity.hh:881-1027)
    # ------------------------------------------------------------------
    def apply_boundary_conditions(self, conds: bc_mod.BoundaryConditions):
        mesh = self.mesh
        env = bc_mod.expression_env(mesh)
        self.no_rigid_motion |= conds.no_rigid_motion
        load = np.zeros((self.num_dofs, self.dim))
        for region in conds.regions:
            if region.type in ("dirichlet", "target"):
                if region.kind == "elements":
                    # DirichletElementsCondition: constrain ALL nodes (incl.
                    # edge nodes) of the matched boundary elements
                    # (LinearElasticity.hh:950-965).
                    belems = bc_mod.match_boundary_elements(mesh, region)
                    nodes = np.unique(mesh.bdry_elem_nodes[belems])
                else:
                    nodes = bc_mod.match_boundary_nodes(mesh, region)
                if len(nodes) == 0:
                    raise ValueError(f"BC region matched no nodes: {region}")
                if region.type == "target":
                    continue  # targets are objectives, not constraints
                if region.kind == "nodes":
                    vals = np.asarray(region.indexed_values)
                else:
                    vals = region.eval_value(mesh.node_positions[nodes], env)
                comps = region.component_mask.components(self.dim)
                dofs = self.dof_map[nodes]
                for ci, c in enumerate(comps):
                    col = vals[:, c] if vals.shape[1] == self.dim else vals[:, ci]
                    conflict = (self.dirichlet_mask[dofs, c]
                                & (self.dirichlet_values[dofs, c] != col))
                    if conflict.any():
                        raise ValueError("conflicting Dirichlet constraints "
                                         "(reference detects these too)")
                    self.dirichlet_mask[dofs, c] = True
                    self.dirichlet_values[dofs, c] = col
                # Dirichlet region bookkeeping for surface-force reports
                # (setDirichletRegion, LinearElasticity.hh:960).
                self._region_nodes.append(np.asarray(dofs))
            elif region.type in ("traction", "force", "pressure"):
                belems = bc_mod.match_boundary_elements(mesh, region)
                if len(belems) == 0:
                    raise ValueError(f"BC region matched no boundary "
                                     f"elements: {region}")
                load += np.asarray(self._neumann_region_load(
                    region, belems, env))
            elif region.type == "delta_force":
                if region.kind == "nodes":
                    nodes = np.asarray(region.indices)
                    if nodes.max(initial=-1) >= mesh.num_nodes:
                        raise ValueError("delta_force node index out of "
                                         "bounds")
                    vals = np.asarray(region.indexed_values)
                else:
                    nodes = bc_mod.match_boundary_nodes(mesh, region)
                    vals = region.eval_value(mesh.node_positions[nodes], env)
                np.add.at(load, self.dof_map[nodes], vals)
            else:
                raise ValueError(f"unsupported BC type {region.type!r}")
        self.neumann_load = self.neumann_load + jnp.asarray(load)

    def _neumann_region_load(self, region, belems, env):
        """Consistent nodal load for constant-per-element tractions."""
        mesh = self.mesh
        centers = mesh.V[mesh.bdry_elems[belems]].mean(axis=1)
        bvol = np.asarray(self.geom.bdry_volume)[belems]
        if region.kind == "elements":
            # NeumannElementsCondition: per-element values matched by vertex
            # sets (LinearElasticity.hh:966-997); force values are divided
            # by the condition's total element area.
            vals = np.asarray(region.indexed_values)
            if region.type == "pressure":
                n = np.asarray(self.geom.bdry_normal)[belems]
                traction = -vals[:, :1] * n
            elif region.type == "traction":
                traction = vals
            else:  # force
                traction = vals / bvol.sum()
        elif region.type == "pressure":
            p = np.asarray(bc_mod.evaluate(region.value[0], centers, env))
            n = np.asarray(self.geom.bdry_normal)[belems]
            traction = -p[:, None] * n
        else:
            # truncate 3-component values on 2D meshes (truncateFrom3D)
            traction = region.eval_value(centers, env)[:, :self.dim]
            if region.type == "force":
                # Total force divided by region area -> uniform traction
                # (BoundaryConditions.hh:179-181).
                traction = traction / bvol.sum()
        w = sf.integrated_shape_np(mesh.K - 1, mesh.degree)  # [nb]
        fe = traction[:, None, :] * (bvol[:, None] * w[None, :])[:, :, None]
        nodes = self.dof_map[mesh.bdry_elem_nodes[belems]]
        load = np.zeros((self.num_dofs, self.dim))
        np.add.at(load, nodes.reshape(-1), fe.reshape(-1, self.dim))
        return load

    def report_region_surface_forces(self, u):
        """[n_regions, dim] net force transmitted through each Dirichlet
        region: sums of (K u) over the region's nodes
        (``reportRegionSurfaceForces``, ``LinearElasticity.hh:1251-1270``)."""
        ud = jnp.zeros((self.num_dofs, self.dim), dtype=self.Ke.dtype)
        ud = ud.at[jnp.asarray(self.dof_map)].set(jnp.asarray(u))
        f = np.asarray(self.apply_K(ud))
        return np.stack([f[r].sum(axis=0) for r in self._region_nodes]) \
            if self._region_nodes else np.zeros((0, self.dim))

    def analyze_dirichlet_posedness(self):
        """(needs_translations [dim] bool, needs_rotations bool): which
        rigid modes the applied Dirichlet conditions fail to suppress
        (``analyzeDirichletPosedness``, ``LinearElasticity.hh:1169-1191``).

        The reference punts on partial constraints ("analysis of partial
        Dirichlet rotational posedness not yet implemented",
        ``LinearElasticity.hh:1185``); here the analysis is EXACT: a
        rigid-mode combination survives the constraints iff it vanishes
        on every constrained dof, i.e. iff it lies in the null space of
        the rigid basis restricted to constrained rows — computed from
        the [k, k] Gram of that restriction."""
        counts = self.dirichlet_mask.sum(axis=0)       # per component
        needs_translations = counts == 0
        d = self.dim
        Z = self.rigid_modes()                         # [Nd*d, k]
        rows = self.dirichlet_mask.reshape(-1)
        if not rows.any():
            return needs_translations, True
        C = Z[rows]                                    # [nc, k]
        G = C.T @ C
        scale = max(float(np.trace(G)), 1e-300)
        w, V = np.linalg.eigh(G)
        kernel = V[:, w < 1e-12 * scale]               # surviving combos
        # rotational part: coefficients on the rotation columns (after
        # the d translation columns)
        needs_rotations = bool(kernel.shape[1]
                               and np.abs(kernel[d:]).max() > 1e-8)
        return needs_translations, needs_rotations

    def fix_nodes(self, nodes, values=0.0, components=None):
        """Programmatic Dirichlet (node indices, per-node values)."""
        nodes = np.asarray(nodes)
        values = np.broadcast_to(np.asarray(values, dtype=np.float64),
                                 (len(nodes), self.dim))
        comps = np.arange(self.dim) if components is None \
            else np.asarray(components)
        dofs = self.dof_map[nodes]
        for c in comps:
            self.dirichlet_mask[dofs, c] = True
            self.dirichlet_values[dofs, c] = values[:, c]

    def clear_boundary_conditions(self):
        self.dirichlet_mask[:] = False
        self.dirichlet_values[:] = 0.0
        self.neumann_load = jnp.zeros_like(self.neumann_load)
        self.no_rigid_motion = False
        self._region_nodes = []

    # ------------------------------------------------------------------
    # Rigid motion projection (replaces constraint rows R,
    # LinearElasticity.hh:1522-1593)
    # ------------------------------------------------------------------
    def rigid_modes(self, translations_only: bool = False) -> np.ndarray:
        """[Nd * dim, n_modes] rigid translation/rotation basis."""
        d = self.dim
        Nd = self.num_dofs
        # Representative position of each dof (any node mapping to it;
        # rotations are only meaningful for identity dof maps anyway).
        pos = np.zeros((Nd, d))
        pos[self.dof_map] = self.mesh.node_positions[:, :d]
        modes = []
        for c in range(d):
            m = np.zeros((Nd, d))
            m[:, c] = 1.0
            modes.append(m.ravel())
        if not translations_only:
            if d == 2:
                m = np.zeros((Nd, d))
                m[:, 0], m[:, 1] = -pos[:, 1], pos[:, 0]
                modes.append(m.ravel())
            else:
                for axis in range(3):
                    m = np.zeros((Nd, d))
                    a, b = (axis + 1) % 3, (axis + 2) % 3
                    m[:, a] = -pos[:, b]
                    m[:, b] = pos[:, a]
                    modes.append(m.ravel())
        return np.stack(modes, axis=1)

    # ------------------------------------------------------------------
    # Solve
    # ------------------------------------------------------------------
    def solve(self, extra_load=None, tol: float = 1e-12,
              maxiter: int = 50000, x0=None, precond: str = "jacobi",
              chebyshev_degree: int = 6, operator: str = "auto"):
        """Returns (u [N, dim] nodal displacements, CGResult).

        ``precond``: 'jacobi' (pointwise) | 'twolevel' / 'twolevel-mult'
        (P1-coarse two-level, additive / multiplicative —
        ``solvers/twolevel.py``) | 'amg' (device-resident multilevel
        hierarchy, ``solvers/amg.py`` — bounded iteration counts with no
        host callbacks; routed operator only) | 'block' (exact d x d node
        blocks) | 'chebyshev' (k-step polynomial in the block-Jacobi
        preconditioned operator — the high-contrast workhorse; see
        solvers/precond.py).  The solve runs in reduced DOF space; the
        result is expanded through the dof map (``dofToNodeField``,
        ``LinearElasticity.hh:665``).

        ``operator``: 'auto' picks the routed in-register SpMV
        (``routed_kernel``) on TPU for meshes past ~16k elements and the
        gather-pyramid EBE otherwise; 'routed' / 'ebe' force a path.  The
        routed operator is f32 — tolerances tighter than ~1e-5 run f32
        inner CG inside f64 iterative refinement (``solvers/refine``),
        which replaces the reference's all-f64 CHOLMOD solve at a
        fraction of the per-iteration cost.

        Refined-path semantics (``_solve_routed`` / ``_solve_ebe_refined``
        when tol < ~1e-5 on TPU): ``maxiter`` bounds EACH inner f32 CG
        round (up to 12 refinement rounds), so total inner iterations can
        exceed it; the returned ``CGResult.iters`` reports the CUMULATIVE
        inner-iteration count.  If the f32 floor (kappa * eps32) sits
        above ``tol`` the refinement stops honestly with a RuntimeWarning
        — check ``CGResult.resnorm`` when solving near-singular systems."""
        d = self.dim
        b = self.neumann_load
        if extra_load is not None:
            b = b + jnp.asarray(extra_load)

        fixed = jnp.asarray(self.dirichlet_mask)
        vals = jnp.asarray(self.dirichlet_values, dtype=b.dtype)
        free = ~fixed

        if operator in ("structured", "auto"):
            if x0 is not None:
                if operator == "structured":
                    raise ValueError(
                        "operator='structured' does not support x0 (the "
                        "MG-PCG solve starts from zero); drop x0 or use "
                        "operator='routed'/'ebe'")
            elif self._structured_eligible():
                # validate the Kuhn-grid hypothesis NARROWLY: only the
                # validation may redirect an auto solve — a genuine defect
                # inside the MG stack must surface, not silently reroute
                from ..ops.structured import validate_kuhn_grid

                try:
                    validate_kuhn_grid(self.mesh)
                    is_grid = True
                except ValueError:
                    if operator == "structured":
                        raise   # explicitly requested, mesh isn't a grid
                    is_grid = False
                if is_grid:
                    return self._solve_structured(b, fixed, vals, tol,
                                                  maxiter)
            elif operator == "structured":
                raise ValueError(
                    "structured solve requires a 3D P2 mesh with uniform "
                    "material, identity dof map, some Dirichlet "
                    "constraint and no rigid-mode projection")

        if (operator == "routed"
                or (operator == "auto" and x0 is None
                    and self._routed_auto())):
            return self._solve_routed(b, fixed, vals, tol, maxiter,
                                      precond, chebyshev_degree, x0=x0)

        if (operator in ("auto", "ebe") and x0 is None
                and b.dtype == jnp.float64 and tol < 1e-5
                and jax.default_backend() == "tpu"
                and precond in ("jacobi", "block", "chebyshev")):
            return self._solve_ebe_refined(b, fixed, vals, tol, maxiter,
                                           precond, chebyshev_degree)
        if precond == "amg":
            raise ValueError(
                "precond='amg' runs on the routed operator only — pass "
                "operator='routed' (or 'auto' on TPU with a large mesh)")

        if not self.no_rigid_motion and x0 is None and precond == "jacobi":
            # Fast path: fully jitted solve; operator arrays enter as
            # arguments (no giant baked constants through the compiler).
            res = cg_mod.cg_operator(
                self._kernel, b, self.K_diagonal(),
                free.astype(b.dtype), vals, tol=tol, maxiter=maxiter)
            u = res.x[jnp.asarray(self.dof_map)]
            return u, res

        projectors = [cg_mod.mask_projector(free)]
        if self.no_rigid_motion:
            Z = self.rigid_modes()
            proj_rm = cg_mod.nullspace_projector(jnp.asarray(Z))
            projectors.append(lambda v: proj_rm(v.reshape(-1)).reshape(v.shape))

        def project(v):
            for p in projectors:
                v = p(v)
            return v

        if precond == "jacobi":
            diag = self.K_diagonal()
            safe = jnp.where(diag > 0, diag, 1.0)
            M_inv = lambda r: r / safe
        elif precond in ("twolevel", "twolevel-mult"):
            # P1-coarse two-level (solvers/twolevel.py): high-contrast /
            # ill-conditioned workhorse, bounded iteration counts.
            # Cached: the host Galerkin assembly + SuperLU factorization
            # depend only on (mode, Dirichlet mask), not the load.
            tl = self._twolevel_for(precond, free, project=project)
            M_inv = tl.M_inv
        else:
            from ..solvers import precond as pc

            blocks = pc.node_block_diagonal(self.Ke, self.elem_dofs,
                                            self.num_dofs, d)
            M_inv = pc.block_jacobi_apply(
                pc.block_jacobi_inv(blocks, free.astype(self.Ke.dtype)))
            if precond == "chebyshev":
                Ap = lambda v: project(self.apply_K(v))
                Mp = lambda r: project(M_inv(r))
                lmax = pc.estimate_lambda_max(Ap, Mp, (self.num_dofs, d),
                                              dtype=self.Ke.dtype)
                M_inv = pc.chebyshev_preconditioner(
                    Ap, M_inv, lmax, degree=chebyshev_degree,
                    project=project)

        u_d = jnp.where(fixed, vals, 0.0)
        rhs = b - self.apply_K(u_d)
        res = cg_mod.cg(self.apply_K, rhs, x0=x0, M_inv=M_inv,
                        project=project, tol=tol, maxiter=maxiter)
        u_dof = res.x + u_d
        u = u_dof[jnp.asarray(self.dof_map)]
        return u, res

    def _solve_ebe_refined(self, b, fixed, vals, tol, maxiter, precond,
                           chebyshev_degree=6):
        """Tight-tolerance solve on the gather-pyramid EBE path (TPU):
        f64 residual applies around an f32 inner CG (``solvers/refine``).

        Replaces the raw f64 eager CG for sub-routed-threshold meshes on
        TPU: software-f64 EBE iterations cost ~14x the f32 ones
        (measured 0.8 s vs 58 ms per iteration at 75k DOF on v5e), and a
        1024-iteration f64 while_loop dispatch runs long enough to trip
        the relayed worker's watchdog (observed worker crash on the
        ``experiments/extrusion_validation.py`` meshes).  Same role as
        ``_solve_routed``'s refinement branch (reference: f64 CHOLMOD
        factorize+solve, ``SparseMatrices.hh:1984-2296``)."""
        from ..solvers import refine as refine_mod
        from ..solvers import precond as pc
        from ..sparse.ebe import EBEKernel

        d = self.dim
        f32 = jnp.float32
        free = ~fixed
        if getattr(self, "_kernel32", None) is None:
            self._kernel32 = EBEKernel.build(
                jnp.asarray(self.Ke, f32), self.elem_dofs, self.num_dofs,
                d)
        k32 = self._kernel32
        free32 = free.astype(f32)
        projs = [cg_mod.mask_projector(free32)]
        proj_rm_user = None
        if self.no_rigid_motion:
            Z = jnp.asarray(self.rigid_modes())
            proj_rm_user = cg_mod.nullspace_projector(Z)
            proj_rm32 = cg_mod.nullspace_projector(Z.astype(f32))
            projs.append(
                lambda v: proj_rm32(v.reshape(-1)).reshape(v.shape))

        def project(v):
            for p in projs:
                v = p(v)
            return v

        if precond == "jacobi":
            diag = k32.diagonal()
            safe = jnp.where(diag > 0, diag, 1.0)
            M_inv = lambda r: r / safe
        else:
            blocks = pc.node_block_diagonal(jnp.asarray(self.Ke, f32),
                                            self.elem_dofs,
                                            self.num_dofs, d)
            M_inv = pc.block_jacobi_apply(
                pc.block_jacobi_inv(blocks, free32))
            if precond == "chebyshev":
                Ap = lambda v: project(k32(v))
                M0 = M_inv
                Mp = lambda r: project(M0(r))
                lmax = pc.estimate_lambda_max(
                    Ap, Mp, (self.num_dofs, d), dtype=f32)
                M_inv = pc.chebyshev_preconditioner(
                    Ap, M0, lmax, degree=chebyshev_degree,
                    project=project)

        free64 = free.astype(jnp.float64)

        def proj_hi(v):
            v = v * free64
            if proj_rm_user is not None:
                v = proj_rm_user(v.reshape(-1)).reshape(v.shape)
            return v

        u_d = jnp.where(fixed, vals, 0.0)
        apply_hi = lambda x: proj_hi(self.apply_K(x))
        rhs64 = proj_hi(jnp.asarray(b, jnp.float64)
                        - self.apply_K(jnp.asarray(u_d, jnp.float64)))

        def solve_lo(r32):
            res = cg_mod.cg(k32, project(r32), M_inv=M_inv,
                            project=project, tol=1e-4, maxiter=maxiter)
            return res.x, res.iters

        ref = refine_mod.refine(apply_hi, solve_lo, rhs64, tol=tol)
        x = ref.x + u_d
        u = x[jnp.asarray(self.dof_map)]
        return u, cg_mod.CGResult(x, jnp.asarray(ref.inner_iters),
                                  jnp.asarray(ref.resnorm))

    def _solve_routed(self, b, fixed, vals, tol, maxiter, precond,
                      chebyshev_degree, x0=None):
        """Routed-SpMV solve: f32 in-register CG (``sparse.routed_ebe``),
        wrapped in f64 iterative refinement (``solvers/refine``) when the
        requested tolerance is beyond f32 reach.  Replaces the role of the
        reference's f64 CHOLMOD factorize+solve
        (``SparseMatrices.hh:1984-2296``) for large general meshes."""
        from ..solvers import refine as refine_mod
        from ..solvers import precond as pc

        rk = self.routed_kernel()
        d = self.dim
        f32 = jnp.float32
        free = ~fixed

        if precond == "amg":
            # device-resident multilevel hierarchy (solvers/amg.py): the
            # full CHOLMOD role on arbitrary meshes — bounded iterations,
            # zero host callbacks per application.
            if self.no_rigid_motion or x0 is not None:
                raise ValueError("precond='amg' does not support "
                                 "no_rigid_motion or x0 yet")
            from ..solvers.amg import UnstructuredMG

            key = self.dirichlet_mask.tobytes()
            if self._amg is None or self._amg[0] != key:
                self._amg = (key, UnstructuredMG.build(
                    self, fixed_mask=fixed, rk=rk))
            mg = self._amg[1]
            if b.dtype != jnp.float64 or tol >= 1e-5:
                u_dof, res = mg.solve(jnp.asarray(b, f32),
                                      fixed_values=jnp.asarray(vals, f32),
                                      tol=tol, maxiter=maxiter)
                u = u_dof.astype(b.dtype)[jnp.asarray(self.dof_map)]
                return u, res
            from ..solvers import refine as refine_mod

            free64 = free.astype(jnp.float64)
            u_d64 = jnp.where(fixed, vals, 0.0).astype(jnp.float64)
            apply_hi = lambda x: self.apply_K(x) * free64
            rhs64 = (jnp.asarray(b, jnp.float64)
                     - self.apply_K(u_d64)) * free64

            def solve_lo(r32):
                u, res = mg.solve(r32, tol=1e-4, maxiter=min(maxiter, 200))
                return u, res.iters

            ref = refine_mod.refine(apply_hi, solve_lo, rhs64, tol=tol)
            u_dof = ref.x + u_d64
            u = u_dof[jnp.asarray(self.dof_map)]
            return u, cg_mod.CGResult(u_dof, ref.inner_iters, ref.resnorm)
        free_i = rk.permute_in(jnp.asarray(free.astype(f32)))
        diag_i = rk.diagonal()

        # preconditioner + projectors in the operator's INTERNAL ordering
        if precond == "jacobi":
            safe = jnp.where(diag_i > 0, diag_i, 1.0)
            M_inv = lambda r: r / safe
        elif precond in ("twolevel", "twolevel-mult"):
            order = None if rk.order is None else np.asarray(rk.order)
            tl = self._twolevel_for(
                precond, free, node_order=order,
                project=lambda v: v * free_i.astype(v.dtype),
                apply_A=(rk if precond.endswith("mult") else None))
            M_inv = tl.M_inv
        else:
            blocks = pc.node_block_diagonal(
                jnp.asarray(self.Ke, f32), self.elem_dofs, self.num_dofs,
                d)
            if rk.order is not None:
                blocks = blocks[rk.order]
            M_inv = pc.block_jacobi_apply(
                pc.block_jacobi_inv(blocks, free_i))
        projs = [cg_mod.mask_projector(free_i)]
        proj_rm_user = None
        if self.no_rigid_motion:
            Z = jnp.asarray(self.rigid_modes())
            proj_rm_user = cg_mod.nullspace_projector(Z)
            Zr = Z.reshape(self.num_dofs, d, -1).astype(f32)
            if rk.order is not None:
                Zr = Zr[rk.order]
            proj_rm = cg_mod.nullspace_projector(
                Zr.reshape(self.num_dofs * d, -1))
            projs.append(
                lambda v: proj_rm(v.reshape(-1)).reshape(v.shape))

        def project(v):
            for p in projs:
                v = p(v)
            return v

        if precond == "chebyshev":
            Ap = lambda v: project(rk(v))
            M0 = M_inv
            Mp = lambda r: project(M0(r))
            lmax = pc.estimate_lambda_max(Ap, Mp, (self.num_dofs, d),
                                          dtype=f32)
            M_inv = pc.chebyshev_preconditioner(
                Ap, M0, lmax, degree=chebyshev_degree, project=project)

        u_d = jnp.where(fixed, vals, 0.0)
        x0_i = None
        if x0 is not None:
            # warm start: dof-space guess minus the Dirichlet lift, in
            # the operator's internal ordering
            x0_i = project(rk.permute_in(
                jnp.asarray(x0, f32) - jnp.asarray(u_d, f32)))
        if b.dtype != jnp.float64 or tol >= 1e-5:
            # pure f32 solve (CG in internal order, one permute each way)
            b_i = rk.permute_in(jnp.asarray(b, f32))
            ud_i = rk.permute_in(jnp.asarray(u_d, f32))
            rhs = project(b_i - rk(ud_i))
            res = cg_mod.cg(rk, rhs, x0=x0_i, M_inv=M_inv,
                            project=project, tol=tol, maxiter=maxiter)
            x = rk.permute_out(res.x + ud_i).astype(b.dtype)
            u = x[jnp.asarray(self.dof_map)]
            return u, cg_mod.CGResult(x, res.iters, res.resnorm)

        # f64 residuals (gather-pyramid EBE apply), f32 routed corrections
        free64 = free.astype(jnp.float64)

        def proj_hi(v):
            v = v * free64
            if proj_rm_user is not None:
                v = proj_rm_user(v.reshape(-1)).reshape(v.shape)
            return v

        apply_hi = lambda x: proj_hi(self.apply_K(x))
        rhs64 = proj_hi(jnp.asarray(b, jnp.float64)
                        - self.apply_K(jnp.asarray(u_d, jnp.float64)))

        def solve_lo(r32):
            r_i = project(rk.permute_in(r32))
            res = cg_mod.cg(rk, r_i, M_inv=M_inv, project=project,
                            tol=1e-4, maxiter=maxiter)
            return rk.permute_out(res.x), res.iters

        x0_64 = None if x0 is None else proj_hi(
            jnp.asarray(x0, jnp.float64) - jnp.asarray(u_d, jnp.float64))
        ref = refine_mod.refine(apply_hi, solve_lo, rhs64, tol=tol,
                                x0=x0_64)
        u_dof = ref.x + jnp.asarray(u_d, jnp.float64)
        u = u_dof[jnp.asarray(self.dof_map)]
        return u, cg_mod.CGResult(u_dof, ref.inner_iters, ref.resnorm)

    # ------------------------------------------------------------------
    # Loads for homogenization (LinearElasticity.hh:135-162, 552)
    # ------------------------------------------------------------------
    def constant_strain_load(self, e0_flat):
        """l[(i,c)] = int strain(phi_i e_c) : C : e0 dV  — pass -e0 to get the
        reference's ``constantStrainLoad(-e)`` cell-problem RHS."""
        sigma0 = et.double_contract(self.D, jnp.asarray(e0_flat,
                                                        dtype=self.Ke.dtype))
        g = self.geom
        S = jnp.asarray(em.shape_grad_table(self.mesh.K, self.mesh.degree),
                        dtype=self.Ke.dtype)
        int_grad = jnp.einsum("kn,ekd->end", S, g.grad_lambda) \
            * g.volume[:, None, None]
        sig_full = _flat_to_sym_batch(sigma0, self.dim)
        if sig_full.ndim == 2:
            fe = jnp.einsum("end,cd->enc", int_grad, sig_full)
        else:
            fe = jnp.einsum("end,ecd->enc", int_grad, sig_full)
        E, n = fe.shape[0], fe.shape[1]
        return jax.ops.segment_sum(fe.reshape(E * n, self.dim),
                                   self.elem_dofs.reshape(-1),
                                   num_segments=self.num_dofs)

    # ------------------------------------------------------------------
    # Postprocessing (LinearElasticity.hh:100-124, 512-549)
    # ------------------------------------------------------------------
    def strain_at(self, u, points=None):
        """[E, Q, fl] strains of nodal displacement u [N, dim] at barycentric
        eval points (default: element vertices — the degree-(deg-1)
        interpolant's nodes for P2, constant value for P1)."""
        mesh = self.mesh
        if points is None:
            points = np.eye(mesh.K + 1) if mesh.degree == 2 else \
                np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
        B = em.element_strain_matrix(self.geom.grad_lambda, mesh.degree,
                                     np.atleast_2d(points))
        ue = u[jnp.asarray(mesh.elem_nodes)]
        return jnp.einsum("eqanc,enc->eqa", B, ue)

    def average_strain_field(self, u):
        """[E, fl] element-average strains (centroid value: strains are
        degree <= 1 per element)."""
        mesh = self.mesh
        centroid = np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
        return self.strain_at(u, centroid)[:, 0, :]

    def average_stress_field(self, u):
        return et.double_contract(self.D, self.average_strain_field(u))

    def stress_at(self, u, points=None):
        return et.double_contract(
            self.D if self.D.ndim == 2 else self.D[:, None],
            self.strain_at(u, points))

    def von_mises_field(self, u):
        return von_mises(self.average_stress_field(u), self.dim)

    def average_strain(self, u):
        """Volume-averaged strain [fl]."""
        vol = self.geom.volume
        es = self.average_strain_field(u)
        return jnp.einsum("e,ea->a", vol, es) / jnp.sum(vol)

    def average_stress(self, u):
        vol = self.geom.volume
        ss = self.average_stress_field(u)
        return jnp.einsum("e,ea->a", vol, ss) / jnp.sum(vol)

    def strain_energy(self, u):
        """1/2 u^T K u."""
        ud = jnp.zeros((self.num_dofs, self.dim), dtype=self.Ke.dtype)
        ud = ud.at[jnp.asarray(self.dof_map)].set(u)  # node field -> dof field
        return 0.5 * jnp.vdot(ud, self.apply_K(ud))


def _flat_to_sym_batch(v, dim):
    from ..fem.flattening import flat_to_sym

    return flat_to_sym(v, dim)
