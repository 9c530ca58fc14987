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


# ---------------------------------------------------------------------------
# F-based / C-based adaptors + tangent elasticity tensor
# (reference ``EnergyDensities/EDensityAdaptors.hh``,
# ``TangentElasticityTensor.hh``) — higher-order functions instead of CRTP
# wrapper classes: densities are plain jax callables, so "adapting" is
# composing, and every derivative member (PK2Stress, delta_PK2Stress,
# delta_denergy) is one autodiff transform.
# ---------------------------------------------------------------------------

def spd_sqrt(C, iters: int = 18):
    """Principal square root of an SPD matrix [..., n, n]
    (``spdMatrixSqrt``) via the Denman-Beavers iteration.

    NOT an eigendecomposition: autodiff through Jacobi rotations is
    undefined at repeated eigenvalues (exactly the C = I point every
    tangent-elasticity-tensor evaluation differentiates around), while
    Denman-Beavers is a smooth composition of inverses — safe under
    jvp everywhere C is SPD."""
    d = C.shape[-1]
    I = jnp.broadcast_to(jnp.eye(d, dtype=C.dtype), C.shape)
    # trace normalization keeps the iteration well-scaled for stiff C
    s = jnp.trace(C, axis1=-2, axis2=-1)[..., None, None] / d
    Y = C / s
    Z = I
    for _ in range(iters):
        Yn = 0.5 * (Y + small_linalg.inv(Z))
        Z = 0.5 * (Z + small_linalg.inv(Y))
        Y = Yn
    return Y * jnp.sqrt(s)


def f_based_from_c_based(psi_C):
    """C-based density Psi(C, *params) -> F-based density Psi(F, *params)
    (``EnergyDensityFBasedFromCBased``).  F may be [..., 3, 2] — the
    membrane case: C = F^T F is still 2x2, exactly the reference's
    ``EmbeddingDimension = 3`` specialization."""
    def psi_F(F, *params):
        C = jnp.einsum("...ki,...kj->...ij", F, F)
        return psi_C(C, *params)

    return psi_F


def c_based_from_f_based(psi_F):
    """F-based density -> C-based density via the principal square root
    F = sqrt(C) (``EnergyDensityCBasedFromFBased``; valid for isotropic /
    rotation-invariant densities, same caveat as the reference)."""
    def psi_C(C, *params):
        return psi_F(spd_sqrt(C), *params)

    return psi_C


def pk2_stress(psi_C):
    """Second Piola-Kirchhoff stress S = 2 dPsi/dC of a C-based density
    (the reference's ``PK2Stress`` member)."""
    def S(C, *params):
        return 2.0 * jax.grad(
            lambda C_: jnp.sum(psi_C(C_, *params)))(C)

    return S


def delta_pk2_stress(psi_C):
    """Directional derivative dS = 2 d2Psi/dC2 : dC (``delta_PK2Stress``)."""
    S = pk2_stress(psi_C)

    def dS(C, dC, *params):
        return jax.jvp(lambda C_: S(C_, *params), (C,), (dC,))[1]

    return dS


def tangent_elasticity_tensor(psi, dim: int, *params, F=None, C=None,
                              c_based: bool = False):
    """Tangent elasticity tensor dS/dE (flattened [fl, fl]) of a density
    around a deformation (``tangentElasticityTensor``,
    ``TangentElasticityTensor.hh:21-45``).  Around the identity this is
    the linearized model's elasticity tensor.

    psi: F-based density (default) or C-based (``c_based=True``).
    Returns a :class:`~meshfem_tpu.fem.elasticity_tensor.ElasticityTensor`.
    """
    from ..fem import elasticity_tensor as et
    from ..fem.flattening import flat_len, flat_rows_cols

    psi_C = psi if c_based else c_based_from_f_based(psi)
    if C is None:
        if F is not None:
            C = jnp.einsum("ki,kj->ij", F, F)
        else:
            C = jnp.eye(dim, dtype=jnp.result_type(float))
    dS = delta_pk2_stress(psi_C)
    fl = flat_len(dim)
    r, c = flat_rows_cols(dim)
    cols = []
    for kl in range(fl):
        # dC = 2 * dE; canonical strain basis kl has 1 on a diagonal slot
        # or 1/2 on the two symmetric shear slots
        dC = jnp.zeros((dim, dim)).at[r[kl], c[kl]].set(1.0)
        dC = 0.5 * (dC + dC.T) * 2.0
        cols.append(dS(C, dC, *params)[r, c])
    D = jnp.stack(cols, axis=-1)
    return et.ElasticityTensor(D)


def projected_tangent_apply(energy_fn, sweeps: int = 10):
    """PSD-projected delta-P operator (``AutoHessianProjection``,
    ``EDensityAdaptors.hh``): the per-element d2Psi/dF2 — a
    [d*d, d*d] symmetric matrix — is eigendecomposed (batched TPU-safe
    Jacobi) and its negative eigenvalues clamped to zero before
    contracting with dF.  The brute-force projection the reference uses
    as ground truth for analytic per-energy projections; with autodiff it
    IS the implementation."""
    P = pk1_stress(energy_fn)

    def dP_proj(F, dF, *params):
        shape = F.shape
        d2 = shape[-2] * shape[-1]

        def pk1_flat(Ff):
            return P(Ff.reshape(shape), *params).reshape(
                Ff.shape[:-1] + (d2,))

        Ff = F.reshape(shape[:-2] + (d2,))
        # batched dense Hessian: jacfwd of PK1 over the flattened F
        basis = jnp.eye(d2, dtype=F.dtype)
        cols = [jax.jvp(pk1_flat, (Ff,),
                        (jnp.broadcast_to(basis[i], Ff.shape),))[1]
                for i in range(d2)]
        H = jnp.stack(cols, axis=-1)                  # [..., d2, d2]
        H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        w, V = small_linalg.eigh_jacobi(H, sweeps=sweeps)
        w = jnp.maximum(w, 0.0)
        dFf = dF.reshape(shape[:-2] + (d2,))
        out = jnp.einsum("...ik,...k,...jk,...j->...i", V, w, V, dFf)
        return out.reshape(shape)

    return dP_proj


def stvk_energy_C(C, lam, mu):
    """C-based St. Venant-Kirchhoff (the reference's native StVK form,
    ``StVenantKirchhoff.hh``): E = (C - I)/2."""
    d = C.shape[-1]
    E = 0.5 * (C - jnp.eye(d, dtype=C.dtype))
    trE = jnp.trace(E, axis1=-2, axis2=-1)
    return mu * jnp.sum(E * E, axis=(-2, -1)) + 0.5 * lam * trE ** 2
