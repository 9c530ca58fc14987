"""Vibrational mode analysis (parity with
``python/compute_vibrational_modes.py``): smallest nonzero eigenpairs of
K x = lambda M x with rigid modes deflated, via generalized LOBPCG."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..physics.elasticity import ElasticitySimulator
from ..ops import operators
from ..solvers import eigen


def compute_vibrational_modes(sim: ElasticitySimulator, n_modes: int = 6,
                              fixed_mask=None, tol: float = 1e-7,
                              maxiter: int = 300, seed: int = 0):
    """Returns (lambdas [n_modes], modes [N, dim, n_modes]).

    With no Dirichlet constraints the 3 (2D) / 6 (3D) rigid modes are
    deflated (the reference passes sigma=-1e-6 shift-invert to scipy and
    discards near-zero modes)."""
    mesh = sim.mesh
    d = sim.dim
    Nd = sim.num_dofs
    Mv = operators.mass_elasticity(mesh)

    free = None
    if fixed_mask is not None:
        free = jnp.asarray(~np.asarray(fixed_mask)).reshape(Nd, d)

    def K_apply(V):
        # V: [Nd*d, m] -> reshape to [Nd, d, m]
        m = V.shape[1]
        U = V.reshape(Nd, d, m)
        if free is not None:
            U = U * free[:, :, None]
        out = sim.apply_K(U)
        if free is not None:
            out = out * free[:, :, None]
        return out.reshape(Nd * d, m)

    def M_apply(V):
        m = V.shape[1]
        U = V.reshape(Nd, d, m)
        if free is not None:
            U = U * free[:, :, None]
        out = Mv(U)
        if free is not None:
            out = out * free[:, :, None]
        return out.reshape(Nd * d, m)

    deflate = None
    if fixed_mask is None:
        deflate = sim.rigid_modes()

    rng = np.random.default_rng(seed)
    X0 = jnp.asarray(rng.standard_normal((Nd * d, n_modes)))
    lam, X, hist = eigen.lobpcg_generalized(
        K_apply, M_apply, X0, maxiter=maxiter, tol=tol, deflate=deflate)
    modes = np.asarray(X).reshape(Nd, d, n_modes)[sim.dof_map]
    return np.asarray(lam), modes
