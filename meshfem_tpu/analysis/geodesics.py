"""Geodesics in heat (Crane-Weischedel-Wardetzky).

Parity with reference ``experiments/geodesic_heat/main.cc:25-92`` /
``GeodesicsInHeat.ipynb``: heat-kernel step (M + t L), normalized negative
gradient, divergence Poisson solve — all operator-layer composition on
device."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..ops import operators
from ..solvers import cg as cg_mod


def geodesic_distances(mesh: FEMMesh, source_nodes, t: float | None = None,
                       tol: float = 1e-11):
    """Approximate geodesic distance from `source_nodes` to every node."""
    source_nodes = np.asarray(source_nodes).reshape(-1)
    L = operators.laplacian(mesh)
    M = operators.mass(mesh)
    if t is None:
        # t = mean edge length squared (the paper's recommendation; the
        # reference uses bbox-scaled steps).
        if mesh.K == 2:
            edges = mesh.cell.edges()
        else:
            edges = mesh.cell.edges()
        el = np.linalg.norm(mesh.V[edges[:, 0]] - mesh.V[edges[:, 1]],
                            axis=1)
        t = float(np.mean(el) ** 2)

    A = lambda u: M(u) + t * L(u)
    fixed = np.zeros(mesh.num_nodes, dtype=bool)
    fixed[source_nodes] = True
    fixedj = jnp.asarray(fixed)
    vals = jnp.where(fixedj, 1.0, 0.0)

    diagA = M.diagonal() + t * L.diagonal()
    M_inv = lambda r: r / diagA
    # Heat step: A u = 0 with u = 1 at sources (fixVariables equivalent).
    res = cg_mod.solve_dirichlet(A, jnp.zeros(mesh.num_nodes), fixedj, vals,
                                 M_inv=M_inv, tol=tol)
    u = res.x

    # Normalized negative gradient per element.
    g = operators.gradient(mesh, u)
    nrm = jnp.linalg.norm(g, axis=1, keepdims=True)
    X = -g / jnp.maximum(nrm, 1e-300)

    # Divergence Poisson solve with distance 0 at the source:
    # L d = int grad(phi) . X  (weak form of  Laplace d = div X);
    # operators.divergence returns -int grad(phi) . X, hence the sign.
    b = -operators.divergence(mesh, X)
    diagL = L.diagonal()
    res2 = cg_mod.solve_dirichlet(
        lambda d: L(d), b, fixedj, jnp.zeros(mesh.num_nodes),
        M_inv=lambda r: r / jnp.where(diagL > 0, diagL, 1.0), tol=tol)
    d = res2.x
    return d - jnp.min(d)
