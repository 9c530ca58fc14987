"""Nonlinear energy densities as pure JAX functions.

Parity with reference ``EnergyDensities/`` (corotated linear elasticity,
NeoHookean with volumetric term + plane-stress variant, St. Venant-
Kirchhoff, F-based/C-based adaptors, tangent elasticity tensor) — but
derivatives come from jax.grad/jvp instead of hand-coded
``denergy/delta_denergy`` members, and all densities are batched over
elements.

Conventions: F is the deformation gradient [..., d, d]; energies are per
unit reference volume; material parameters are Lame (lambda, mu).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import linalg as small_linalg


def green_lagrange(F):
    """E = 1/2 (F^T F - I)."""
    d = F.shape[-1]
    return 0.5 * (jnp.einsum("...ki,...kj->...ij", F, F)
                  - jnp.eye(d, dtype=F.dtype))


def stvk_energy(F, lam, mu):
    """St. Venant-Kirchhoff: mu E:E + lam/2 tr(E)^2
    (``StVenantKirchhoff.hh``)."""
    E = green_lagrange(F)
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    return mu * jnp.sum(E * E, axis=(-2, -1)) + 0.5 * lam * trE ** 2


def neo_hookean_energy(F, lam, mu):
    """Compressible NeoHookean: mu/2 (I1 - d) - mu ln J + lam/2 (ln J)^2
    (``NeoHookeanEnergy.hh``)."""
    d = F.shape[-1]
    I1 = jnp.sum(F * F, axis=(-2, -1))
    J = small_linalg.det(F)
    lnJ = jnp.log(jnp.maximum(J, 1e-12))
    return 0.5 * mu * (I1 - d) - mu * lnJ + 0.5 * lam * lnJ ** 2


def corotated_energy(F, lam, mu, sweeps: int = 8):
    """Corotated linear elasticity: mu ||S - I||_F^2 + lam/2 tr(S - I)^2
    with S from the polar decomposition F = R S
    (``CorotatedLinearElasticity.hh``).  Polar via eigendecomposition of
    F^T F (TPU-safe Jacobi)."""
    d = F.shape[-1]
    C = jnp.einsum("...ki,...kj->...ij", F, F)
    w, V = small_linalg.eigh_jacobi(C, sweeps=sweeps)
    s = jnp.sqrt(jnp.maximum(w, 1e-14))
    S = jnp.einsum("...ik,...k,...jk->...ij", V, s, V)
    D = S - jnp.eye(d, dtype=F.dtype)
    trD = jnp.trace(D, axis1=-2, axis2=-1)
    return mu * jnp.sum(D * D, axis=(-2, -1)) + 0.5 * lam * trD ** 2


def linear_elasticity_energy(F, lam, mu):
    """Small-strain quadratic energy: mu e:e + lam/2 tr(e)^2,
    e = sym(F) - I."""
    d = F.shape[-1]
    e = 0.5 * (F + jnp.swapaxes(F, -1, -2)) - jnp.eye(d, dtype=F.dtype)
    tre = jnp.trace(e, axis1=-2, axis2=-1)
    return mu * jnp.sum(e * e, axis=(-2, -1)) + 0.5 * lam * tre ** 2


ENERGY_DENSITIES = {
    "stvk": stvk_energy,
    "neo_hookean": neo_hookean_energy,
    "corotated": corotated_energy,
    "linear": linear_elasticity_energy,
}


def pk1_stress(energy_fn):
    """First Piola-Kirchhoff stress P = dPsi/dF via autodiff (replaces the
    hand-coded ``denergy`` members)."""
    def P(F, *params):
        return jax.grad(lambda F_: jnp.sum(energy_fn(F_, *params)))(F)

    return P


def tangent_apply(energy_fn):
    """delta-P operator dP = d2Psi/dF2 : dF via jvp-over-grad (replaces
    ``delta_denergy`` / ``TangentElasticityTensor.hh``)."""
    P = pk1_stress(energy_fn)

    def dP(F, dF, *params):
        return jax.jvp(lambda F_: P(F_, *params), (F,), (dF,))[1]

    return dP


# ---------------------------------------------------------------------------
# Total potential energy over a mesh (drives solvers/newton.py).
# ---------------------------------------------------------------------------

def deformation_gradients(mesh, x, geometry=None):
    """F [E, d, d] of a deformed nodal position field x [N, d] (P1 exact /
    P2 centroid), using the reference-configuration barycentric gradients."""
    import numpy as np
    from ..fem import shape_functions as sf

    g = geometry or mesh.geometry()
    centroid = np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
    dN = jnp.asarray(sf.grad_shape_np(mesh.K, mesh.degree, centroid)[0],
                     dtype=g.grad_lambda.dtype)
    gp = jnp.einsum("nk,ekd->end", dN, g.grad_lambda)     # [E, n, dim]
    xe = x[jnp.asarray(mesh.elem_nodes)]                  # [E, n, d]
    return jnp.einsum("enc,end->ecd", xe, gp)


def total_energy(mesh, energy: str, lam, mu, geometry=None):
    """Returns a function x [N, d] -> scalar total strain energy
    (one-point quadrature: exact for P1)."""
    density = ENERGY_DENSITIES[energy]
    g = geometry or mesh.geometry()
    vol = g.volume

    def E(x):
        F = deformation_gradients(mesh, x, g)
        return jnp.sum(vol * density(F, lam, mu))

    return E


def principal_stretches_2d(F, sweeps: int = 8):
    """Singular values of the (possibly 3x2) membrane deformation gradient."""
    C = jnp.einsum("...ki,...kj->...ij", F, F)   # [.., 2, 2]
    tr = C[..., 0, 0] + C[..., 1, 1]
    det = C[..., 0, 0] * C[..., 1, 1] - C[..., 0, 1] * C[..., 1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = jnp.sqrt(jnp.maximum(tr / 2 + disc, 1e-30))
    l2 = jnp.sqrt(jnp.maximum(tr / 2 - disc, 1e-30))
    return l1, l2


def membrane_stvk_energy(F, lam, mu):
    """Plane-stress StVK membrane energy (``EnergyDensities`` membrane
    variants): F [..., 3or2, 2].  Written in smooth invariants of the 2x2
    Green strain (a principal-stretch form is not differentiable at equal
    stretches)."""
    C = jnp.einsum("...ki,...kj->...ij", F, F)
    Eg = 0.5 * (C - jnp.eye(2, dtype=F.dtype))
    trE = Eg[..., 0, 0] + Eg[..., 1, 1]
    lam_ps = 2.0 * lam * mu / (lam + 2.0 * mu)
    return mu * jnp.sum(Eg * Eg, axis=(-2, -1)) + 0.5 * lam_ps * trE ** 2


def tension_field_stvk_energy(F, lam, mu):
    """Relaxed (tension-field-theory) membrane StVK energy
    (``TensionFieldTheory.hh``, after Pipkin 1994): wrinkling regimes
    replace compressive states by their relaxed envelope.

    Regimes (principal strains e1 >= e2):
      taut    e2 >= -nu* e1:  full membrane energy
      wrinkle e1 > 0 > relax: W = mu (1+nu*)/ (1) * e1^2 (uniaxial envelope)
      slack   e1 <= 0:        W = 0
    """
    l1, l2 = principal_stretches_2d(F)
    e1 = 0.5 * (l1 ** 2 - 1.0)
    e2 = 0.5 * (l2 ** 2 - 1.0)
    lam_ps = 2.0 * lam * mu / (lam + 2.0 * mu)
    nu_star = lam_ps / (lam_ps + 2.0 * mu)
    E_star = 2.0 * mu * (1.0 + nu_star)   # plane-stress Young's modulus
    full = mu * (e1 ** 2 + e2 ** 2) + 0.5 * lam_ps * (e1 + e2) ** 2
    uni = 0.5 * E_star * e1 ** 2
    taut = e2 >= -nu_star * e1
    slack = e1 <= 0.0
    return jnp.where(slack, 0.0, jnp.where(taut, full, uni))


ENERGY_DENSITIES["membrane_stvk"] = membrane_stvk_energy
ENERGY_DENSITIES["tension_field_stvk"] = tension_field_stvk_energy
