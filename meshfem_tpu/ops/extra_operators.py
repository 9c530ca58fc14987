"""Additional discrete operators.

Parity with reference ``BoundaryLaplacian.hh`` (boundary-restricted
Laplace-Beltrami with periodic-face exclusion), ``UniformLaplacian.hh``
(graph Laplacian), and ``GridFunction.hh`` (scalar fields on uniform grids
with FD Laplacian/smoothing)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..mesh.geometry import simplex_geometry
from . import element_matrices as em
from .operators import EBEOperator


def boundary_laplacian(mesh: FEMMesh, exclude_cell_faces: bool = False):
    """FEM Laplacian on the boundary surface (K-1 simplices embedded in
    R^dim), optionally excluding periodic cell faces
    (``BoundaryLaplacian.hh:1-18``).  Operates on boundary-node-indexed
    vectors of length mesh.num_nodes (zero off-boundary rows)."""
    belems = mesh.bdry_elem_nodes
    if exclude_cell_faces:
        from ..mesh.periodic import cell_face_boundary_elements

        keep = ~cell_face_boundary_elements(mesh)
        belems = belems[keep]
        corners = mesh.bdry_elems[keep]
    else:
        corners = mesh.bdry_elems
    X = jnp.asarray(mesh.V)[jnp.asarray(corners)]
    grad_lam, vol = simplex_geometry(X, mesh.K - 1)
    Ke = em.element_laplacian(grad_lam, vol, mesh.degree)
    return EBEOperator(Ke, jnp.asarray(belems), mesh.num_nodes)


def uniform_laplacian(V, edges):
    """Graph Laplacian on vertices (``UniformLaplacian.hh``): returns a
    scipy CSR (host-side smoothing / mesh perturbation uses)."""
    import scipy.sparse as sp

    n = len(V)
    e = np.asarray(edges)
    i = np.concatenate([e[:, 0], e[:, 1]])
    j = np.concatenate([e[:, 1], e[:, 0]])
    A = sp.coo_matrix((np.ones(len(i)), (i, j)), shape=(n, n)).tocsr()
    d = np.asarray(A.sum(axis=1)).ravel()
    return sp.diags(d) - A


def perturb_mesh(mesh: FEMMesh, boundary_velocity, steps: float = 1.0):
    """Move boundary vertices by a velocity field and extend to the
    interior harmonically via the uniform Laplacian
    (``PerturbMesh.hh:1-7``)."""
    import scipy.sparse.linalg as spla

    edges = mesh.cell.edges()
    L = uniform_laplacian(mesh.V, edges).tolil()
    bverts = (mesh.cell.boundary_vertices() if mesh.K == 2
              else mesh.cell.boundary_vertices())
    rhs = np.zeros_like(mesh.V)
    rhs[bverts] = steps * np.asarray(boundary_velocity)
    for v in bverts:
        L.rows[v] = [v]
        L.data[v] = [1.0]
    delta = np.column_stack([
        spla.spsolve(L.tocsc(), rhs[:, d]) for d in range(mesh.V.shape[1])])
    return mesh.V + delta


class GridFunction:
    """Scalar field on a uniform N-d grid with FD Laplacian and smoothing
    (``GridFunction.hh``)."""

    def __init__(self, values, spacing=1.0):
        self.values = jnp.asarray(values)
        self.spacing = spacing

    @staticmethod
    def _shifts(v):
        """Edge-clamped neighbor shifts (no wrap-around) along every axis."""
        p = jnp.pad(v, 1, mode="edge")
        center = tuple(slice(1, -1) for _ in range(v.ndim))
        for ax in range(v.ndim):
            lo = list(center)
            hi = list(center)
            lo[ax] = slice(0, -2)
            hi[ax] = slice(2, None)
            yield p[tuple(lo)], p[tuple(hi)]

    def laplacian(self):
        v = self.values
        out = jnp.zeros_like(v)
        for lo, hi in self._shifts(v):
            out = out + (lo + hi - 2 * v)
        return out / self.spacing ** 2

    def smoothed(self, iterations: int = 1, weight: float = 0.5):
        v = self.values
        for _ in range(iterations):
            nb = jnp.zeros_like(v)
            for lo, hi in self._shifts(v):
                nb = nb + lo + hi
            v = (1 - weight) * v + weight * nb / (2 * v.ndim)
        return GridFunction(v, self.spacing)

    def sample(self, points):
        """Multilinear interpolation at fractional grid coordinates."""
        from jax.scipy.ndimage import map_coordinates

        p = jnp.asarray(points).T / self.spacing
        return map_coordinates(self.values, list(p), order=1)
