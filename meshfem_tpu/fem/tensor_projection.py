"""Tensor symmetrization projections.

Parity with reference ``TensorProjection.hh`` (closest isotropic tensor in
the Frobenius metric — the isotropy-distance report of the homogenization
CLI) and ``VonMises.hh`` extractor building blocks."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .flattening import flat_len
from . import elasticity_tensor as et


def closest_isotropic_tensor(D):
    """Frobenius-closest isotropic tensor to D [..., fl, fl].

    Projection onto span{P_hydro, P_dev}: the hydrostatic projector
    P_h = (1/d) I x I and deviatoric P_d = I_s - P_h are orthogonal
    idempotents, so the projection coefficients are
    <C, P>/<P, P> (quadruple contractions)."""
    dim = {1: 1, 3: 2, 6: 3}[D.shape[-1]]
    I_s = et.identity(dim, dtype=D.dtype)
    # hydrostatic projector: (1/d) delta_ij delta_kl
    Ph = jnp.zeros_like(I_s)
    Ph = Ph.at[..., :dim, :dim].set(1.0 / dim)
    Pd = I_s - Ph
    ch = et.quadruple_contract(D, Ph) / et.quadruple_contract(Ph, Ph)
    cd = et.quadruple_contract(D, Pd) / et.quadruple_contract(Pd, Pd)
    proj = ch[..., None, None] * Ph + cd[..., None, None] * Pd
    return proj, ch, cd


def isotropy_distance(D):
    """Relative Frobenius distance to the closest isotropic tensor
    (the homogenization CLI's anisotropy report)."""
    proj, _, _ = closest_isotropic_tensor(D)
    diff = D - proj
    return jnp.sqrt(et.frobenius_norm_sq(diff) / et.frobenius_norm_sq(D))
