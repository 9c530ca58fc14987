"""Discrete differential operators over a FEMMesh.

Parity with the reference's operator layer (``Laplacian.hh``,
``MassMatrix.hh``, ``differential_operators.cc:22-79``: laplacian, mass,
mass_elasticity, bilaplacian, gradient, divergence), exposed both as
matrix-free device operators and scipy matrices for host verification.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..fem import shape_functions as sf
from . import element_matrices as em
from ..sparse import assembly


@dataclasses.dataclass
class EBEOperator:
    """Element-by-element symmetric operator A = scatter(Ke gather(.)),
    with the gather-pyramid scatter plan (sparse/scatter.py)."""

    Ke: jnp.ndarray          # [E, n, n] or [E, n*d, n*d]
    elem_nodes: jnp.ndarray  # [E, n]
    num_nodes: int
    vector_dim: int = 1

    def __post_init__(self):
        from ..sparse.ebe import EBEKernel

        self._kernel = EBEKernel.build(self.Ke, self.elem_nodes,
                                       self.num_nodes, self.vector_dim)

    def __call__(self, u):
        return self._kernel(u)

    def diagonal(self):
        return self._kernel.diagonal()

    def to_scipy(self):
        return assembly.assemble_scipy(np.asarray(self.Ke),
                                       np.asarray(self.elem_nodes),
                                       self.num_nodes, d=self.vector_dim)

    @property
    def shape(self):
        n = self.num_nodes * self.vector_dim
        return (n, n)


def laplacian(mesh: FEMMesh, node_positions=None) -> EBEOperator:
    """FEM stiffness for -Laplace (``Laplacian.hh:28-56``)."""
    g = mesh.geometry(node_positions)
    Ke = em.element_laplacian(g.grad_lambda, g.volume, mesh.degree)
    return EBEOperator(Ke, jnp.asarray(mesh.elem_nodes), mesh.num_nodes)


def mass(mesh: FEMMesh, lumped: bool = False, node_positions=None):
    """Consistent (or lumped -> [N] diagonal) mass matrix
    (``MassMatrix.hh:24-60``)."""
    g = mesh.geometry(node_positions)
    if lumped:
        Me = em.element_mass_lumped(g.volume, mesh.K, mesh.degree)
        return assembly.scatter_load(Me, jnp.asarray(mesh.elem_nodes),
                                     mesh.num_nodes)
    Ke = em.element_mass(g.volume, mesh.K, mesh.degree)
    return EBEOperator(Ke, jnp.asarray(mesh.elem_nodes), mesh.num_nodes)


def mass_elasticity(mesh: FEMMesh, node_positions=None) -> EBEOperator:
    """Vector-valued mass matrix (``MassMatrix::construct_vector_valued``)."""
    g = mesh.geometry(node_positions)
    Me = em.element_mass(g.volume, mesh.K, mesh.degree)
    d = mesh.dim
    n = mesh.nodes_per_elem
    # Kron with identity: dof = node * d + comp.
    Kv = jnp.einsum("eij,cf->eicjf", Me,
                    jnp.eye(d, dtype=Me.dtype)).reshape(-1, n * d, n * d)
    return EBEOperator(Kv, jnp.asarray(mesh.elem_nodes), mesh.num_nodes,
                       vector_dim=d)


def gradient(mesh: FEMMesh, u, node_positions=None):
    """Per-element gradient of a nodal scalar field (constant for P1,
    evaluated at the element centroid for P2): [E, dim]."""
    g = mesh.geometry(node_positions)
    centroid = np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
    dN = jnp.asarray(sf.grad_shape_np(mesh.K, mesh.degree, centroid)[0],
                     dtype=g.grad_lambda.dtype)          # [n, K+1]
    gp = jnp.einsum("nk,ekd->end", dN, g.grad_lambda)    # [E, n, dim]
    ue = u[jnp.asarray(mesh.elem_nodes)]
    return jnp.einsum("end,en->ed", gp, ue)


def divergence(mesh: FEMMesh, X, node_positions=None):
    """Nodal divergence load: b_i = -int grad(phi_i) . X for per-element
    constant vector fields X [E, dim] (geodesics-in-heat RHS,
    ``experiments/geodesic_heat/main.cc:82-88``)."""
    g = mesh.geometry(node_positions)
    S = jnp.asarray(em.shape_grad_table(mesh.K, mesh.degree),
                    dtype=g.grad_lambda.dtype)           # [K+1, n]
    # int grad phi_i = vol * sum_k S[k, i] g_k
    int_grad = jnp.einsum("kn,ekd->end", S, g.grad_lambda) * g.volume[:, None, None]
    fe = -jnp.einsum("end,ed->en", int_grad, X)
    return assembly.scatter_load(fe, jnp.asarray(mesh.elem_nodes),
                                 mesh.num_nodes)


def bilaplacian_apply(mesh: FEMMesh, node_positions=None) -> Callable:
    """B = L M^-1_lumped L as a matrix-free operator (reference
    ``differential_operators.cc`` bilaplacian)."""
    L = laplacian(mesh, node_positions)
    Ml = mass(mesh, lumped=True, node_positions=node_positions)
    inv = 1.0 / Ml

    def apply(u):
        return L(inv * L(u))

    return apply
