"""Geometric primitives: bounding boxes and batched simplex embedding.

The embedding formulas replace ``EmbeddedElement.hh:44-241``'s per-element
objects with one vectorized (and differentiable) computation over all
elements: constant barycentric gradients, volumes, and boundary normals.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import linalg as small_linalg


@dataclasses.dataclass(frozen=True)
class BBox:
    """Axis-aligned bounding box (reference ``Geometry.hh`` BBox)."""

    min: np.ndarray
    max: np.ndarray

    @classmethod
    def of(cls, points) -> "BBox":
        p = np.asarray(points)
        return cls(p.min(axis=0), p.max(axis=0))

    @property
    def dimensions(self) -> np.ndarray:
        return self.max - self.min

    @property
    def center(self) -> np.ndarray:
        return 0.5 * (self.min + self.max)

    def volume(self) -> float:
        return float(np.prod(self.dimensions))

    def union(self, other: "BBox") -> "BBox":
        return BBox(np.minimum(self.min, other.min),
                    np.maximum(self.max, other.max))

    def contains(self, points, tol: float = 0.0) -> np.ndarray:
        p = np.asarray(points)
        return np.all((p >= self.min - tol) & (p <= self.max + tol), axis=-1)


def simplex_geometry(X, K: int):
    """Batched embedding of K-simplices with corner positions X [..., K+1, dim].

    Returns (grad_lambda [..., K+1, dim], volume [...]).

    * ``grad_lambda[i]`` is the (tangential, if dim > K) spatial gradient of
      barycentric coordinate lambda_i — constant over the element
      (``EmbeddedElement.hh:119-241``).
    * ``volume`` is the signed volume for dim == K (positive for positively
      oriented elements; the reference rejects negative volumes,
      ``LinearElasticity.hh:465-472``) and the unsigned area/length for
      codimension >= 1 embeddings.
    """
    X = jnp.asarray(X)
    dim = X.shape[-1]
    J = X[..., 1:, :] - X[..., :1, :]              # [..., K, dim] rows = edges
    if dim == K:
        det = small_linalg.det(J) if K > 1 else J[..., 0, 0]
        volume = det / math.factorial(K)
        # grad lambda_j (j >= 1) are rows of J^{-1} transposed:
        # lambda_j(x) = (J^{-T} (x - x0))_j  =>  grad lambda_j = (J^{-1})_{:, j}^T
        Jinv = small_linalg.inv(J) if K > 1 else 1.0 / J
        grads = jnp.swapaxes(Jinv, -1, -2)          # [..., K, dim]
    else:
        # Gram-based tangential gradients: G = J J^T (K x K),
        # grad lambda_{j>=1} = (G^{-1} J)_j rows; volume from sqrt(det G).
        G = jnp.einsum("...id,...jd->...ij", J, J)
        detG = small_linalg.det(G) if K > 1 else G[..., 0, 0]
        volume = jnp.sqrt(jnp.maximum(detG, 0.0)) / math.factorial(K)
        Ginv = small_linalg.inv(G) if K > 1 else 1.0 / G
        grads = jnp.einsum("...ij,...jd->...id", Ginv, J)
    grad0 = -jnp.sum(grads, axis=-2, keepdims=True)
    return jnp.concatenate([grad0, grads], axis=-2), volume


def boundary_normals(Xb, vol_centroids=None):
    """Outward unit normals + measures of codim-1 boundary simplices.

    Xb: [..., K, dim] corner positions of (K-1)-simplices living in R^dim
    (K = dim).  Returns (normal [..., dim], measure [...]).
    Orientation follows the stored winding (boundary elements are stored
    outward-wound); `vol_centroids` optionally flips toward outside."""
    Xb = jnp.asarray(Xb)
    dim = Xb.shape[-1]
    if dim == 2:
        # Edge (a, b): outward normal = rotate (b - a) by -90 deg.
        t = Xb[..., 1, :] - Xb[..., 0, :]
        measure = jnp.linalg.norm(t, axis=-1)
        n = jnp.stack([t[..., 1], -t[..., 0]], axis=-1)
        n = n / jnp.maximum(measure[..., None], 1e-300)
    elif dim == 3:
        e1 = Xb[..., 1, :] - Xb[..., 0, :]
        e2 = Xb[..., 2, :] - Xb[..., 0, :]
        c = jnp.cross(e1, e2)
        nrm = jnp.linalg.norm(c, axis=-1)
        measure = 0.5 * nrm
        n = c / jnp.maximum(nrm[..., None], 1e-300)
    else:
        raise ValueError("boundary normals only for dim 2/3")
    if vol_centroids is not None:
        face_c = jnp.mean(Xb, axis=-2)
        flip = jnp.sum(n * (jnp.asarray(vol_centroids) - face_c), axis=-1) > 0
        n = jnp.where(flip[..., None], -n, n)
    return n, measure
