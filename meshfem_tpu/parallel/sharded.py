"""Multi-chip SPMD execution over a jax.sharding.Mesh.

The reference is single-node shared-memory (TBB, SURVEY §2.13/§5.8); the
TPU-native scale-out is domain decomposition:

* **'e' axis (element sharding — the FEM data-parallel axis)**: elements and
  their Ke blocks are sharded across chips; state vectors are replicated;
  A @ u = psum over chips of the local element scatter — one ICI all-reduce
  per SpMV, which also covers the CG dot products (they are computed
  redundantly on replicated vectors).
* **'b' axis (RHS-block sharding — the model-parallel analog)**: independent
  right-hand sides (homogenization cell problems, eigensolver blocks) are
  sharded across chips; no communication beyond the shared operator.

This module builds a padded, sharded EBE operator and a pjit-able CG step.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pad_elements(Ke, elem_dofs, n_shards: int):
    """Pad element arrays to a multiple of n_shards with zero-stiffness
    dummy elements (scattering zeros into dof 0)."""
    E = Ke.shape[0]
    Ep = ((E + n_shards - 1) // n_shards) * n_shards
    if Ep != E:
        pad = Ep - E
        Ke = jnp.concatenate(
            [Ke, jnp.zeros((pad,) + Ke.shape[1:], Ke.dtype)])
        elem_dofs = jnp.concatenate(
            [elem_dofs, jnp.zeros((pad, elem_dofs.shape[1]),
                                  elem_dofs.dtype)])
    return Ke, elem_dofs


@dataclasses.dataclass
class ShardedEBE:
    """Element-sharded EBE operator: apply(u) with u replicated [Nd, d]."""

    mesh: Mesh
    axis: str
    Ke: jnp.ndarray         # [Ep, nd, nd] sharded on axis 0
    elem_dofs: jnp.ndarray  # [Ep, n] sharded on axis 0
    num_dofs: int
    vector_dim: int

    @classmethod
    def build(cls, mesh: Mesh, axis: str, Ke, elem_dofs, num_dofs: int,
              vector_dim: int = 1) -> "ShardedEBE":
        n_shards = mesh.shape[axis]
        Ke, elem_dofs = pad_elements(jnp.asarray(Ke), jnp.asarray(elem_dofs),
                                     n_shards)
        spec = jax.sharding.NamedSharding(mesh, P(axis))
        Ke = jax.device_put(Ke, spec)
        elem_dofs = jax.device_put(elem_dofs, spec)
        return cls(mesh, axis, Ke, elem_dofs, num_dofs, vector_dim)

    def apply_fn(self):
        """A pure function (Ke, elem_dofs, u) -> A u, usable under jit with
        the stored shardings; u and the result are replicated."""
        num_dofs, d, axis = self.num_dofs, self.vector_dim, self.axis
        mesh = self.mesh
        n = self.elem_dofs.shape[1]

        def local_apply(Ke, elem_dofs, u):
            E = Ke.shape[0]
            ue = u[elem_dofs]
            if d == 1:
                fe = jnp.einsum("eij,ej->ei", Ke, ue)
                out = jax.ops.segment_sum(fe.reshape(-1),
                                          elem_dofs.reshape(-1),
                                          num_segments=num_dofs)
            else:
                fe = jnp.einsum("eij,ej->ei", Ke, ue.reshape(E, n * d))
                out = jax.ops.segment_sum(fe.reshape(E * n, d),
                                          elem_dofs.reshape(-1),
                                          num_segments=num_dofs)
            return jax.lax.psum(out, axis)

        return shard_map(
            local_apply, mesh=mesh,
            in_specs=(P(self.axis), P(self.axis), P()),
            out_specs=P())

    def __call__(self, u):
        return self.apply_fn()(self.Ke, self.elem_dofs, u)


def sharded_cg_step(apply_fn):
    """One CG iteration as a pure function for lax.scan / pjit."""

    def step(state, _):
        x, r, p, gamma, Ke, ed = state
        Ap = apply_fn(Ke, ed, p)
        alpha = gamma / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        gamma_new = jnp.vdot(r, r)
        p = r + (gamma_new / gamma) * p
        return (x, r, p, gamma_new, Ke, ed), gamma_new

    return step


def sharded_elasticity_solve_multichip(
        mesh2: Mesh, sim, B, free_mask=None, iters: int = 20,
        domain_axis: str = "e", rhs_axis: str = "b"):
    """Production multi-chip solve: Jacobi-preconditioned, Dirichlet-masked
    block CG over a 2D (domain x rhs) device mesh.

    * ``domain_axis``: elements + their Ke blocks sharded (FEM domain
      decomposition); SpMV = local gather/einsum/segment-sum + one psum.
    * ``rhs_axis``: independent RHS columns (homogenization cell problems,
      eigensolver blocks) sharded on the last axis of ``B`` [Nn, d, m];
      no cross-column communication exists, so this axis is free.

    Returns (U [Nn, d, m], resnorm2 [m]) with padding columns stripped.
    Replaces the reference's single-process CHOLMOD path
    (SparseMatrices.hh:1984-2296) with an SPMD iterative solve.
    """
    import jax

    d = sim.dim
    Nn = sim.num_dofs
    e_shards = mesh2.shape[domain_axis]
    b_shards = mesh2.shape[rhs_axis]

    Ke, ed = pad_elements(jnp.asarray(sim.Ke), jnp.asarray(sim.elem_dofs),
                          e_shards)
    n = ed.shape[1]

    m = B.shape[-1]
    m_pad = ((m + b_shards - 1) // b_shards) * b_shards
    if m_pad != m:
        B = jnp.concatenate(
            [B, jnp.zeros(B.shape[:-1] + (m_pad - m,), B.dtype)], axis=-1)

    if free_mask is None:
        free = jnp.ones((Nn, d), B.dtype)
    else:
        free = jnp.asarray(free_mask, B.dtype).reshape(Nn, d)

    eP = jax.sharding.NamedSharding(mesh2, P(domain_axis))
    rP = jax.sharding.NamedSharding(mesh2, P(None, None, rhs_axis))
    repl = jax.sharding.NamedSharding(mesh2, P())
    Ke = jax.device_put(Ke, eP)
    ed = jax.device_put(ed, eP)
    B = jax.device_put(B, rP)
    free = jax.device_put(free, repl)

    def local_solve(Ke, ed, B, free):
        E = Ke.shape[0]
        mloc = B.shape[-1]

        def apply_K(u):                       # u: [Nn, d, mloc] replicated/e
            ue = u[ed].reshape(E, n * d, mloc)
            fe = jnp.einsum("eij,ejm->eim", Ke, ue)
            out = jax.ops.segment_sum(
                fe.reshape(E, n, d, mloc).reshape(E * n, d * mloc),
                ed.reshape(-1), num_segments=Nn).reshape(Nn, d, mloc)
            return jax.lax.psum(out, domain_axis)

        de = jnp.diagonal(Ke, axis1=1, axis2=2)       # [E, n*d]
        diag = jax.ops.segment_sum(
            de.reshape(E * n, d), ed.reshape(-1),
            num_segments=Nn)
        diag = jax.lax.psum(diag, domain_axis)
        safe = jnp.where(diag > 0, diag, 1.0)[..., None]
        fm = free[..., None]

        def project(v):
            return v * fm

        b = project(B)
        x = jnp.zeros_like(b)
        r = b
        z = project(r / safe)
        p = z
        gamma = jnp.sum(r * z, axis=(0, 1))

        def body(state, _):
            x, r, z, p, gamma = state
            Ap = project(apply_K(p))
            den = jnp.sum(p * Ap, axis=(0, 1))
            alpha = gamma / jnp.where(den == 0, 1.0, den)
            x = x + alpha * p
            r = r - alpha * Ap
            z = project(r / safe)
            gamma_new = jnp.sum(r * z, axis=(0, 1))
            beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
            p = z + beta * p
            return (x, r, z, p, gamma_new), None

        (x, r, *_), _ = jax.lax.scan(body, (x, r, z, p, gamma), None,
                                     length=iters)
        return x, jnp.sum(r * r, axis=(0, 1))

    fn = shard_map(
        local_solve, mesh=mesh2,
        in_specs=(P(domain_axis), P(domain_axis),
                  P(None, None, rhs_axis), P()),
        out_specs=(P(None, None, rhs_axis), P(rhs_axis)))
    U, res2 = jax.jit(fn)(Ke, ed, B, free)
    return U[..., :m], res2[:m]


def sharded_elasticity_solve(mesh: Mesh, sim, b, iters: int = 20,
                             axis: str = "e"):
    """Replicated-vector, element-sharded CG on an ElasticitySimulator.

    Demonstration/production entry for multi-chip: shards sim.Ke over the
    mesh, runs `iters` CG iterations with one psum per SpMV."""
    op = ShardedEBE.build(mesh, axis, sim.Ke, sim.elem_dofs, sim.num_dofs,
                          sim.dim)
    apply_fn = op.apply_fn()
    step = sharded_cg_step(apply_fn)

    @jax.jit
    def solve(Ke, ed, b):
        x0 = jnp.zeros_like(b)
        r0 = b
        gamma0 = jnp.vdot(r0, r0)
        state = (x0, r0, r0, gamma0, Ke, ed)
        state, _ = jax.lax.scan(step, state, None, length=iters)
        return state[0]

    return solve(op.Ke, op.elem_dofs, b)
