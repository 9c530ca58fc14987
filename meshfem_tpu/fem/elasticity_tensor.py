"""Rank-4 elasticity tensors in flattened (Voigt) form.

Parity with reference ``ElasticityTensor.hh:49-715``.  A tensor is stored as a
``flat_len(d) x flat_len(d)`` matrix ``D`` of *raw* tensor components
(no engineering-shear scaling baked in); contraction with a flattened strain
inserts the shear-doubling matrix S: ``stress = D @ (S * strain)``
(``ElasticityTensor.hh:460-466``).

Everything here is functional and batch-friendly: ``D`` may carry arbitrary
leading batch axes (per-element material fields), and all ops are
differentiable JAX code.  The thin :class:`ElasticityTensor` wrapper provides
the reference's object API on top.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import linalg as small_linalg
from .flattening import (
    flat_len,
    flat_rows_cols,
    full_to_flat_map,
    shear_doubler,
    sqrt_shear_doubler,
)


def _dim_of(D) -> int:
    return {1: 1, 3: 2, 6: 3}[D.shape[-1]]


# ---------------------------------------------------------------------------
# Constructors (reference ElasticityTensor.hh:100-170).
# ---------------------------------------------------------------------------

def isotropic_lame(dim: int, lam, mu, dtype=jnp.float64):
    """D for lambda tr(e) I + 2 mu e  (``setIsotropicLame``)."""
    fl = flat_len(dim)
    lam = jnp.asarray(lam, dtype=dtype)
    mu = jnp.asarray(mu, dtype=dtype)
    batch = jnp.broadcast_shapes(lam.shape, mu.shape)
    lam = jnp.broadcast_to(lam, batch)
    mu = jnp.broadcast_to(mu, batch)
    D = jnp.zeros(batch + (fl, fl), dtype=dtype)
    for i in range(dim):
        for j in range(dim):
            D = D.at[..., i, j].add(lam)
        D = D.at[..., i, i].add(2.0 * mu)
    for s in range(dim, fl):
        D = D.at[..., s, s].add(mu)
    return D


def isotropic(dim: int, E, nu, dtype=jnp.float64):
    """D from Young's modulus / Poisson ratio; 2D uses the plane-stress
    lambda (``setIsotropic``, ``ElasticityTensor.hh:100-118``)."""
    E = jnp.asarray(E, dtype=dtype)
    nu = jnp.asarray(nu, dtype=dtype)
    mu = E / (2.0 + 2.0 * nu)
    if dim == 2:
        lam = (nu * E) / (1.0 - nu * nu)
    else:
        lam = (nu * E) / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return isotropic_lame(dim, lam, mu, dtype=dtype)


def identity(dim: int, dtype=jnp.float64):
    """Symmetric rank-4 identity: lambda = 0, mu = 1/2."""
    return isotropic_lame(dim, 0.0, 0.5, dtype=dtype)


def lame_parameters(D, rtol: float = 1e-9):
    """(lam, mu) floats if the constant flat tensor ``D`` has the
    isotropic Lame structure (:func:`isotropic_lame` — covers plane
    stress too, via its effective lambda), else ``None``.  Used to route
    applies onto the factored isotropic fast path."""
    Dn = np.asarray(D, dtype=np.float64)
    if Dn.ndim != 2:
        return None
    fl = Dn.shape[-1]
    dim = {1: 1, 3: 2, 6: 3}.get(fl)
    if dim is None or dim == 1:
        return None
    lam = float(Dn[0, 1])
    mu = float(Dn[fl - 1, fl - 1])
    ref = np.asarray(isotropic_lame(dim, lam, mu))
    scale = max(abs(lam) + abs(mu), 1e-300)
    if np.abs(Dn - ref).max() <= rtol * scale:
        return lam, mu
    return None


def orthotropic_3d(Ex, Ey, Ez, nu_yx, nu_zx, nu_zy, mu_yz, mu_zx, mu_xy,
                   dtype=jnp.float64):
    """``setOrthotropic3D`` (``ElasticityTensor.hh:136-153``): build the
    matrix-inverse-of-D (NOT the flattened compliance tensor) and invert."""
    args = [jnp.asarray(a, dtype=dtype) for a in
            (Ex, Ey, Ez, nu_yx, nu_zx, nu_zy, mu_yz, mu_zx, mu_xy)]
    Ex, Ey, Ez, nu_yx, nu_zx, nu_zy, mu_yz, mu_zx, mu_xy = args
    batch = jnp.broadcast_shapes(*(a.shape for a in args))
    z = jnp.zeros(batch, dtype=dtype)
    row = lambda *es: jnp.stack([jnp.broadcast_to(e, batch) for e in es], axis=-1)
    Dinv = jnp.stack([
        row(1.0 / Ex, -nu_yx / Ey, -nu_zx / Ez, z, z, z),
        row(-nu_yx / Ey, 1.0 / Ey, -nu_zy / Ez, z, z, z),
        row(-nu_zx / Ez, -nu_zy / Ez, 1.0 / Ez, z, z, z),
        row(z, z, z, 1.0 / mu_yz, z, z),
        row(z, z, z, z, 1.0 / mu_zx, z),
        row(z, z, z, z, z, 1.0 / mu_xy),
    ], axis=-2)
    return small_linalg.inv(Dinv)


def orthotropic_2d(Ex, Ey, nu_yx, mu_xy, dtype=jnp.float64):
    """``setOrthotropic2D`` (``ElasticityTensor.hh:154-162``)."""
    args = [jnp.asarray(a, dtype=dtype) for a in (Ex, Ey, nu_yx, mu_xy)]
    Ex, Ey, nu_yx, mu_xy = args
    batch = jnp.broadcast_shapes(*(a.shape for a in args))
    z = jnp.zeros(batch, dtype=dtype)
    row = lambda *es: jnp.stack([jnp.broadcast_to(e, batch) for e in es], axis=-1)
    Dinv = jnp.stack([
        row(1.0 / Ex, -nu_yx / Ey, z),
        row(-nu_yx / Ey, 1.0 / Ey, z),
        row(z, z, 1.0 / mu_xy),
    ], axis=-2)
    return small_linalg.inv(Dinv)


def orthotropic(dim: int, moduli, dtype=jnp.float64):
    """Moduli order matches ``getOrthotropicParameters``: 2D (Ex Ey nuYX muXY),
    3D (Ex Ey Ez nuYX nuZX nuZY muYZ muZX muXY)."""
    if dim == 2:
        return orthotropic_2d(*moduli, dtype=dtype)
    return orthotropic_3d(*moduli, dtype=dtype)


# ---------------------------------------------------------------------------
# Contractions (ElasticityTensor.hh:440-515).
# ---------------------------------------------------------------------------

def apply_D(D, flat):
    """D @ flat — `flat` must already be engineering (shear-doubled) strain."""
    return jnp.einsum("...ab,...b->...a", D, flat)


def double_contract(D, strain_flat):
    """stress = C : strain for flattened raw-component symmetric strain."""
    S = jnp.asarray(shear_doubler(_dim_of(D)), dtype=D.dtype)
    return jnp.einsum("...ab,...b->...a", D, S * strain_flat)


def double_contract_tensor(DA, DB):
    """F(A : B) = F(A) S F(B) (result generally lacks major symmetry)."""
    S = jnp.asarray(shear_doubler(_dim_of(DA)), dtype=DA.dtype)
    return jnp.einsum("...ab,...bc->...ac", DA * S[..., :], DB)


def double_double_contract(DA, DB):
    """F(A : B : A) = F(A) S F(B) S F(A) (``doubleDoubleContract``)."""
    return double_contract_tensor(DA, double_contract_tensor(DB, DA))


def quadruple_contract(DA, DB):
    """A :: B = A_ijkl B_ijkl (shear slots weighted by S on both axes)."""
    S = jnp.asarray(shear_doubler(_dim_of(DA)), dtype=DA.dtype)
    W = S[:, None] * S[None, :]
    return jnp.sum(W * DA * DB, axis=(-2, -1))


def frobenius_norm_sq(D):
    return quadruple_contract(D, D)


def inverse(D):
    """Tensor inverse: F(E^-1) = S^-1 F(E)^-1 S^-1 (``ElasticityTensor.hh:315``)."""
    Sinv = 1.0 / jnp.asarray(shear_doubler(_dim_of(D)), dtype=D.dtype)
    Dinv = small_linalg.inv(D)
    return Sinv[..., :, None] * Dinv * Sinv[..., None, :]


def to_full(D):
    """[..., fl, fl] -> [..., d, d, d, d] full rank-4 components."""
    dim = _dim_of(D)
    f2f = full_to_flat_map(dim)
    return D[..., f2f[:, :, None, None], f2f[None, None, :, :]]


def from_full(C):
    """[..., d, d, d, d] -> [..., fl, fl] (assumes minor symmetries)."""
    dim = C.shape[-1]
    r, c = flat_rows_cols(dim)
    return C[..., r[:, None], c[:, None], r[None, :], c[None, :]]


def transform(D, R):
    """Coordinate change E'_ijkl = E_pqrs R_ip R_jq R_kr R_ls
    (``ElasticityTensor.hh:515-545``)."""
    C = to_full(D)
    C2 = jnp.einsum("...pqrs,...ip,...jq,...kr,...ls->...ijkl", C, R, R, R, R)
    return from_full(C2)


def eigenstrains(D):
    """Eigen-decomposition E : s = lambda s via the symmetric ordinary problem
    S^1/2 F(E) S^1/2 (``computeEigenstrains``, ``ElasticityTensor.hh:555+``).

    Returns (eigenstrains [..., fl, n] as flattened raw strains, lambdas)."""
    dim = _dim_of(D)
    sq = jnp.asarray(sqrt_shear_doubler(dim), dtype=D.dtype)
    M = sq[..., :, None] * D * sq[..., None, :]
    lam, Q = small_linalg.eigh_jacobi(M)
    strains = Q / sq[..., :, None]
    return strains, lam


def pseudoinverse(D, tol: float = 1e-8):
    """Moore-Penrose pseudoinverse in the tensor sense
    (``ElasticityTensor.hh:pseudoinverse``)."""
    strains, lam = eigenstrains(D)
    inv_lam = jnp.where(jnp.abs(lam) > tol, 1.0 / jnp.where(lam == 0, 1.0, lam), 0.0)
    return jnp.einsum("...an,...n,...bn->...ab", strains, inv_lam, strains)


def d_row_as_sym_flat(D, i):
    """Row i of D viewed as a flattened symmetric matrix (``DRowAsSymMatrix``)."""
    return D[..., i, :]


# ---------------------------------------------------------------------------
# Object wrapper with the reference's API surface.
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ElasticityTensor:
    """Object facade over a flattened D matrix (reference class parity)."""

    D: jnp.ndarray

    @property
    def dim(self) -> int:
        return _dim_of(self.D)

    # Constructors -----------------------------------------------------
    @classmethod
    def zero(cls, dim: int, dtype=jnp.float64):
        fl = flat_len(dim)
        return cls(jnp.zeros((fl, fl), dtype=dtype))

    @classmethod
    def isotropic(cls, dim: int, E, nu, dtype=jnp.float64):
        return cls(isotropic(dim, E, nu, dtype=dtype))

    @classmethod
    def isotropic_lame(cls, dim: int, lam, mu, dtype=jnp.float64):
        return cls(isotropic_lame(dim, lam, mu, dtype=dtype))

    @classmethod
    def identity(cls, dim: int, dtype=jnp.float64):
        return cls(identity(dim, dtype=dtype))

    @classmethod
    def orthotropic(cls, dim: int, *moduli, dtype=jnp.float64):
        return cls(orthotropic(dim, moduli, dtype=dtype))

    @classmethod
    def anisotropic(cls, D):
        D = jnp.asarray(D)
        return cls(0.5 * (D + jnp.swapaxes(D, -1, -2)))

    # Operations -------------------------------------------------------
    def double_contract(self, other):
        if isinstance(other, ElasticityTensor):
            return ElasticityTensor(double_contract_tensor(self.D, other.D))
        return double_contract(self.D, other)

    def double_double_contract(self, other):
        DB = other.D if isinstance(other, ElasticityTensor) else other
        return ElasticityTensor(double_double_contract(self.D, DB))

    def quadruple_contract(self, other):
        DB = other.D if isinstance(other, ElasticityTensor) else other
        return quadruple_contract(self.D, DB)

    def frobenius_norm_sq(self):
        return frobenius_norm_sq(self.D)

    def inverse(self):
        return ElasticityTensor(inverse(self.D))

    def pseudoinverse(self, tol: float = 1e-8):
        return ElasticityTensor(pseudoinverse(self.D, tol))

    def transform(self, R):
        return ElasticityTensor(transform(self.D, jnp.asarray(R, dtype=self.D.dtype)))

    def eigenstrains(self):
        return eigenstrains(self.D)

    def to_full(self):
        return to_full(self.D)

    def component(self, i, j, k, l):
        f2f = full_to_flat_map(self.dim)
        return self.D[..., f2f[i, j], f2f[k, l]]

    def get_orthotropic_parameters(self):
        """2D: (Ex, Ey, nuYX, muXY); 3D: (Ex..Ez, nuYX, nuZX, nuZY, muYZ, muZX,
        muXY) — from the tensor inverse like ``getOrthotropic3D``."""
        Einv = inverse(self.D)
        d = self.dim
        if d == 2:
            Ex = 1.0 / Einv[..., 0, 0]
            Ey = 1.0 / Einv[..., 1, 1]
            nu_yx = -Einv[..., 0, 1] * Ey
            mu_xy = 0.25 / Einv[..., 2, 2]
            return Ex, Ey, nu_yx, mu_xy
        Ex = 1.0 / Einv[..., 0, 0]
        Ey = 1.0 / Einv[..., 1, 1]
        Ez = 1.0 / Einv[..., 2, 2]
        nu_yx = -Einv[..., 0, 1] * Ey
        nu_zx = -Einv[..., 0, 2] * Ez
        nu_zy = -Einv[..., 1, 2] * Ez
        mu_yz = 0.25 / Einv[..., 3, 3]
        mu_zx = 0.25 / Einv[..., 4, 4]
        mu_xy = 0.25 / Einv[..., 5, 5]
        return Ex, Ey, Ez, nu_yx, nu_zx, nu_zy, mu_yz, mu_zx, mu_xy

    # Vector-space ops ---------------------------------------------------
    def __add__(self, o):
        return ElasticityTensor(self.D + o.D)

    def __sub__(self, o):
        return ElasticityTensor(self.D - o.D)

    def __mul__(self, s):
        return ElasticityTensor(self.D * s)

    __rmul__ = __mul__

    # pytree -------------------------------------------------------------
    def tree_flatten(self):
        return (self.D,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])
