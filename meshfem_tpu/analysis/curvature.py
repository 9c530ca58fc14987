"""Discrete curvature on triangle surfaces.

Parity with reference ``Curvature.hh`` (``GaussianCurvatureSensitivity``):
angle-deficit Gaussian curvature with Voronoi / mixed-Voronoi vertex areas —
all expressed as differentiable jnp functions of the vertex positions, so
the reference's hand-derived (AD-verified) shape derivatives come from
jax.grad for free."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _corner_angles(V, F):
    """[E, 3] interior angles at each corner."""
    X = V[F]
    out = []
    for c in range(3):
        a = X[:, (c + 1) % 3] - X[:, c]
        b = X[:, (c + 2) % 3] - X[:, c]
        na = jnp.linalg.norm(a, axis=1)
        nb = jnp.linalg.norm(b, axis=1)
        cosang = jnp.sum(a * b, axis=1) / jnp.maximum(na * nb, 1e-300)
        out.append(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    return jnp.stack(out, axis=1)


def angle_deficits(V, F, boundary_vertices=None):
    """[n] angle deficit: 2 pi - sum angles (pi - sum on the boundary)."""
    V = jnp.asarray(V)
    F = np.asarray(F)
    ang = _corner_angles(V, F)
    total = jnp.zeros(V.shape[0], V.dtype).at[
        jnp.asarray(F.reshape(-1))].add(ang.reshape(-1))
    full = jnp.full(V.shape[0], 2 * np.pi, dtype=V.dtype)
    if boundary_vertices is not None:
        full = full.at[jnp.asarray(boundary_vertices)].set(np.pi)
    return full - total


def mixed_voronoi_areas(V, F):
    """[n] mixed Voronoi vertex areas (obtuse triangles clamped,
    Meyer et al.)."""
    V = jnp.asarray(V)
    F = np.asarray(F)
    X = V[F]
    ang = _corner_angles(V, F)
    area = 0.5 * jnp.linalg.norm(
        jnp.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]), axis=-1) \
        if X.shape[-1] == 3 else 0.5 * jnp.abs(
            jnp.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0]))
    cot = 1.0 / jnp.tan(jnp.clip(ang, 1e-9, np.pi - 1e-9))
    obtuse = jnp.max(ang, axis=1) > np.pi / 2
    contrib = jnp.zeros_like(ang)
    for c in range(3):
        j, k = (c + 1) % 3, (c + 2) % 3
        l2j = jnp.sum((X[:, k] - X[:, c]) ** 2, axis=1)
        l2k = jnp.sum((X[:, j] - X[:, c]) ** 2, axis=1)
        vor = 0.125 * (l2j * cot[:, j] + l2k * cot[:, k])
        obtuse_at_c = ang[:, c] > np.pi / 2
        clamped = jnp.where(obtuse_at_c, area / 2.0, area / 4.0)
        contrib = contrib.at[:, c].set(jnp.where(obtuse, clamped, vor))
    out = jnp.zeros(V.shape[0], V.dtype).at[
        jnp.asarray(F.reshape(-1))].add(contrib.reshape(-1))
    return out


def gaussian_curvature(V, F, boundary_vertices=None):
    """Pointwise Gaussian curvature K = deficit / mixed area."""
    d = angle_deficits(V, F, boundary_vertices)
    a = mixed_voronoi_areas(V, F)
    return d / jnp.maximum(a, 1e-300)


def gaussian_curvature_sensitivity(V, F, boundary_vertices=None):
    """d(total integrated deficit)/dV — shape derivative via autodiff
    (replaces the hand-coded deltas of ``Curvature.hh:19``)."""
    f = lambda V_: jnp.sum(angle_deficits(V_, F, boundary_vertices))
    return jax.grad(f)(jnp.asarray(V))
