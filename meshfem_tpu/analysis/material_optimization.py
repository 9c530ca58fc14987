"""Material field optimization — fit per-element moduli to target boundary
displacements.

Parity with reference ``MaterialOptimization.hh`` (objective
1/2 int_dO ||u - t||^2 dA, ``:4-11``; adjoint solve + per-element dK/dvar
contraction, ``:294-338``; LBFGS/gradient-descent driver ``:340-394``) —
but the entire adjoint machinery is replaced by jax.grad through an
implicitly-differentiated CG solve, and the optimizer is optax."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..fem import elasticity_tensor as et
from ..fem import shape_functions as sf
from ..ops import element_matrices as em
from ..sparse.scatter import ScatterPlan
from ..solvers import cg as cg_mod
from ..solvers.implicit import solve_implicit


@dataclasses.dataclass
class MaterialOptimizationProblem:
    """Differentiable forward model u(E_field) and L2 boundary objective."""

    mesh: FEMMesh
    poisson: float
    fixed_mask: np.ndarray        # [N, d] bool
    fixed_values: np.ndarray      # [N, d]
    load: jnp.ndarray             # [N, d]
    target_nodes: np.ndarray      # boundary nodes with target displacements
    target_values: jnp.ndarray    # [len(target_nodes), d]
    bounds: tuple = (0.1, 10.0)   # reference variable bounds

    def __post_init__(self):
        mesh = self.mesh
        self.geom = mesh.geometry()
        self.elem_nodes = jnp.asarray(mesh.elem_nodes)
        self.plan = ScatterPlan.build(mesh.elem_nodes.reshape(-1),
                                      mesh.num_nodes)
        # Boundary mass weights for the L2 objective (lumped over the
        # target region).
        w = np.zeros(mesh.num_nodes)
        wgt = sf.integrated_shape_np(mesh.K - 1, mesh.degree)
        bv = np.asarray(self.geom.bdry_volume)
        np.add.at(w, mesh.bdry_elem_nodes.reshape(-1),
                  (bv[:, None] * wgt[None, :]).reshape(-1))
        mask = np.zeros(mesh.num_nodes, dtype=bool)
        mask[self.target_nodes] = True
        self.area_weight = jnp.asarray(np.where(mask, w, 0.0))
        tv = np.zeros((mesh.num_nodes, mesh.dim))
        tv[self.target_nodes] = np.asarray(self.target_values)
        self.target_field = jnp.asarray(tv)

    def displacement(self, young, tol: float = 1e-10, M_inv=None):
        """Differentiable forward solve u(young [E]).  ``M_inv``: optional
        preconditioner (e.g. a grid multigrid V-cycle rebuilt per
        optimization step — gradients are preconditioner-independent by
        the implicit function theorem)."""
        mesh = self.mesh
        d = mesh.dim
        D = et.isotropic(d, jnp.asarray(young), self.poisson)
        Ke = em.element_elasticity(self.geom.grad_lambda, self.geom.volume,
                                   D, mesh.degree)
        n = mesh.nodes_per_elem
        E_ = mesh.num_elements
        free = jnp.asarray(~self.fixed_mask)
        u_d = jnp.asarray(np.where(self.fixed_mask, self.fixed_values, 0.0))

        def matvec(u):
            ue = u[self.elem_nodes].reshape(E_, n * d)
            fe = jnp.einsum("eij,ej->ei", Ke, ue)
            return self.plan(fe.reshape(E_ * n, d))

        project = cg_mod.mask_projector(free)
        b = self.load - matvec(u_d)
        z = solve_implicit(matvec, b, project=project, tol=tol,
                           M_inv=M_inv)
        return z + u_d

    def objective(self, young, M_inv=None):
        """1/2 int_target ||u - t||^2 dA."""
        u = self.displacement(young, M_inv=M_inv)
        diff = u - self.target_field
        return 0.5 * jnp.sum(self.area_weight[:, None] * diff * diff)

    def gradient(self, young):
        return jax.grad(self.objective)(jnp.asarray(young))


def optimize(problem: MaterialOptimizationProblem, young0, *,
             steps: int = 50, learning_rate: float = 0.1,
             verbose: bool = False, precond: str = "jacobi"):
    """Projected-Adam driver (reference uses OPT++ LBFGS / gradient
    descent, ``MaterialOptimization.hh:340-394``).

    ``precond='multigrid'`` (Kuhn-grid meshes, dim 3): each step rebuilds
    a variable-material V-cycle from the CURRENT young field and passes
    it into the implicitly-differentiated solve — iteration counts stay
    MG-bounded as the design develops contrast, and gradients are exact
    regardless (the implicit function theorem is preconditioner-
    independent).  The jitted value-and-grad step takes the hierarchy as
    an ARGUMENT, so it compiles once."""
    import functools

    import optax

    lo, hi = problem.bounds
    # Optimize in log space for positivity + scale invariance.
    theta = jnp.log(jnp.asarray(young0))
    opt = optax.adam(learning_rate)
    state = opt.init(theta)
    history = []

    if precond == "multigrid":
        from ..ops.structured_mg import VarStructuredMG

        mesh = problem.mesh
        fl = 6 if mesh.dim == 3 else 3

        def make_mg(young_np):
            D = np.asarray(et.isotropic(
                mesh.dim, jnp.asarray(young_np),
                jnp.full(len(young_np), problem.poisson)))
            return VarStructuredMG.build(
                mesh, D, fixed_mask=jnp.asarray(problem.fixed_mask))

        @jax.jit
        def vg_mg(theta, mg):
            def loss(th):
                young = jnp.clip(jnp.exp(th), lo, hi)
                M_inv = lambda r: mg.fine.from_channels(
                    mg.precondition(mg.fine.to_channels(r)))
                return problem.objective(young, M_inv=M_inv)
            return jax.value_and_grad(loss)(theta)

        for it in range(steps):
            young_np = np.clip(np.exp(np.asarray(theta)), lo, hi)
            mg = make_mg(young_np)
            val, g = vg_mg(theta, mg)
            updates, state = opt.update(g, state)
            theta = optax.apply_updates(theta, updates)
            history.append(float(val))
            if verbose and it % 10 == 0:
                print(f"material-opt it {it}: J = {float(val):.6e}")
        return jnp.clip(jnp.exp(theta), lo, hi), history

    def loss(theta):
        return problem.objective(jnp.clip(jnp.exp(theta), lo, hi))

    vg = jax.value_and_grad(loss)
    for it in range(steps):
        val, g = vg(theta)
        updates, state = opt.update(g, state)
        theta = optax.apply_updates(theta, updates)
        history.append(float(val))
        if verbose and it % 10 == 0:
            print(f"material-opt it {it}: J = {float(val):.6e}")
    young = jnp.clip(jnp.exp(theta), lo, hi)
    return young, history
