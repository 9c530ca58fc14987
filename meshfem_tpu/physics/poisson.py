"""Scalar Poisson solver (parity with reference ``Poisson.hh:55-135``).

-div(grad u) = f on the mesh, Dirichlet values on selected nodes, optional
Neumann flux on boundary elements.  Solves with projection-PCG (Jacobi
preconditioner) — the TPU-native replacement for the reference's
``SPSDSystem::fixVariables`` + CHOLMOD path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..ops import operators, element_matrices as em
from ..fem import shape_functions as sf
from ..sparse import assembly
from ..solvers import cg as cg_mod


class PoissonProblem:
    """Poisson problem on a FEMMesh (any K, degree, embedding dim)."""

    def __init__(self, mesh: FEMMesh, node_positions=None):
        self.mesh = mesh
        self.L = operators.laplacian(mesh, node_positions)
        self.M = operators.mass(mesh, node_positions=node_positions)
        self._geom = mesh.geometry(node_positions)

    # -- loads ------------------------------------------------------------
    def load_from_source(self, f):
        """Consistent load b_i = int f phi_i for nodal f [N] or callable."""
        if callable(f):
            f = jnp.asarray(
                np.apply_along_axis(f, 1, self.mesh.node_positions))
        return self.M(jnp.asarray(f))

    def neumann_load(self, flux_per_belem, belems=None):
        """b_i += int_bdry g phi_i for per-boundary-element constant flux g.

        flux_per_belem: [B] (or [len(belems)] if belems given)."""
        mesh = self.mesh
        if belems is None:
            belems = np.arange(mesh.num_boundary_elements)
        bvol = self._geom.bdry_volume[jnp.asarray(belems)]
        w = jnp.asarray(
            sf.integrated_shape_np(mesh.K - 1, mesh.degree),
            dtype=bvol.dtype)
        fe = jnp.asarray(flux_per_belem)[:, None] * bvol[:, None] * w[None, :]
        nodes = jnp.asarray(mesh.bdry_elem_nodes[np.asarray(belems)])
        return assembly.scatter_load(fe, nodes, mesh.num_nodes)

    # -- solve ------------------------------------------------------------
    def solve(
        self,
        dirichlet_nodes,
        dirichlet_values,
        source=None,
        extra_load=None,
        tol: float = 1e-12,
        maxiter: int = 20000,
    ):
        """Returns (u [N], CGResult)."""
        mesh = self.mesh
        b = jnp.zeros(mesh.num_nodes, dtype=self._geom.volume.dtype)
        if source is not None:
            b = b + self.load_from_source(source)
        if extra_load is not None:
            b = b + jnp.asarray(extra_load)

        fixed = jnp.zeros(mesh.num_nodes, dtype=bool)
        fixed = fixed.at[jnp.asarray(np.asarray(dirichlet_nodes))].set(True)
        vals = jnp.zeros(mesh.num_nodes, dtype=b.dtype)
        dirichlet_values = jnp.asarray(dirichlet_values)
        if dirichlet_values.ndim == 0:
            dirichlet_values = jnp.full(len(np.asarray(dirichlet_nodes)),
                                        dirichlet_values)
        vals = vals.at[jnp.asarray(np.asarray(dirichlet_nodes))].set(
            dirichlet_values.astype(b.dtype))

        diag = self.L.diagonal()
        safe = jnp.where(diag > 0, diag, 1.0)
        M_inv = lambda r: r / safe

        res = cg_mod.solve_dirichlet(
            self.L, b, fixed, vals, M_inv=M_inv, tol=tol, maxiter=maxiter)
        return res.x, res

    # -- postprocessing -----------------------------------------------------
    def gradient(self, u):
        """Per-element gradient [E, dim] (``Poisson.hh`` averageGradient
        building block)."""
        return operators.gradient(self.mesh, u)

    def average_gradient(self, u):
        g = self.gradient(u)
        vol = self._geom.volume
        return jnp.einsum("e,ed->d", vol, g) / jnp.sum(vol)

    def energy(self, u):
        """Dirichlet energy 1/2 u^T L u."""
        return 0.5 * jnp.vdot(u, self.L(u))
