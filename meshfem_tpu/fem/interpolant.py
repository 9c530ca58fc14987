"""Polynomial interpolants on simplices.

Parity with reference ``Functions.hh:357-672`` (``Interpolant<T, K, Deg>``):
nodal-value containers supporting evaluation, exact integration, degree
promotion, arithmetic, and construction by sampling functions — batched over
arbitrary leading axes (per-element interpolant fields) and over arbitrary
value shapes (scalar/vector/symmetric-matrix values, replacing
``SymmetricMatrixInterpolant``)."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from . import shape_functions as sf
from . import simplex


@dataclasses.dataclass
class Interpolant:
    """values[..., n_nodes, *value_shape] nodal values of a degree-`deg`
    polynomial on a K-simplex."""

    K: int
    deg: int
    values: jnp.ndarray
    value_ndim: int = 0     # trailing axes belonging to the value

    @property
    def n_nodes(self) -> int:
        return simplex.num_nodes(self.K, self.deg)

    @classmethod
    def from_function(cls, K: int, deg: int, f, value_ndim: int = 0):
        """Sample f(barycentric) at the element nodes
        (``Interpolation<K,Deg>::interpolant``, ``Functions.hh:357-444``)."""
        pts = sf.node_positions_barycentric(K, deg)
        vals = jnp.stack([jnp.asarray(f(p)) for p in pts])
        return cls(K, deg, vals, value_ndim)

    def __call__(self, lambdas):
        """Evaluate at barycentric coordinates [..., K+1]."""
        phi = sf.eval_shape(self.K, self.deg, lambdas)   # [..., n]
        v = self.values
        # contract over the node axis (= -1 - value_ndim of v)
        node_axis = v.ndim - 1 - self.value_ndim
        return jnp.tensordot(phi, jnp.moveaxis(v, node_axis, 0),
                             axes=[[-1], [0]]) if v.ndim == 1 + self.value_ndim \
            else jnp.einsum("...n,...n" + "abcd"[:self.value_ndim] + "->..."
                            + "abcd"[:self.value_ndim], phi, v)

    def integrate(self, volume=1.0):
        """Exact integral over an element of the given volume
        (``Functions.hh:239-318`` closed forms)."""
        w = jnp.asarray(sf.integrated_shape_np(self.K, self.deg),
                        dtype=self.values.dtype)
        return volume * jnp.einsum(
            "n,...n" + "abcd"[:self.value_ndim] + "->..."
            + "abcd"[:self.value_ndim], w, self.values)

    def average(self):
        return self.integrate(1.0)

    def promoted(self, deg: int) -> "Interpolant":
        """Degree promotion (``Functions.hh:566``) — resample at the
        higher-degree nodes (exact: the polynomial is unchanged)."""
        if deg < self.deg:
            raise ValueError("can only promote to a higher degree")
        pts = sf.node_positions_barycentric(self.K, deg)
        vals = self(jnp.asarray(pts))
        return Interpolant(self.K, deg, vals, self.value_ndim)

    def _binary(self, other, op):
        if isinstance(other, Interpolant):
            deg = max(self.deg, other.deg)
            a = self.promoted(deg) if self.deg < deg else self
            b = other.promoted(deg) if other.deg < deg else other
            return Interpolant(self.K, deg, op(a.values, b.values),
                               self.value_ndim)
        return Interpolant(self.K, self.deg, op(self.values, other),
                           self.value_ndim)

    def __add__(self, o):
        return self._binary(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._binary(o, lambda a, b: a - b)

    def __mul__(self, s):
        return Interpolant(self.K, self.deg, self.values * s,
                           self.value_ndim)

    __rmul__ = __mul__


def restrict_to_boundary(K: int, deg: int, face: int):
    """Index map restricting a volume interpolant to boundary sub-simplex
    `face` (node indices of the (K-1)-simplex within the volume element),
    replacing ``InterpolantRestriction.hh`` with static index arithmetic."""
    from ..mesh.simplicial import TRI_FACE_CORNERS, TET_FACE_CORNERS

    corners = (TRI_FACE_CORNERS if K == 2 else TET_FACE_CORNERS)[face]
    idx = list(corners)
    if deg == 2:
        pairs = simplex.simplex_edges(K)
        bpairs = simplex.simplex_edges(K - 1)
        for a, b in bpairs:
            va, vb = corners[a], corners[b]
            for ei, (s, e) in enumerate(pairs):
                if {s, e} == {va, vb}:
                    idx.append(K + 1 + ei)
                    break
    return np.asarray(idx)
