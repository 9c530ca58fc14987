"""Differential one-forms — linear functionals of vector fields.

Parity with reference ``OneForm.hh`` (``ScalarOneForm<N>``, used for shape
derivatives, ``LinearElasticity.hh:448,721``): a one-form is just its
coefficient field dJ/dX [N, dim]; pairing with a velocity field is an inner
product.  Autodiff produces these directly (``jax.grad`` w.r.t. node
positions), so this is a thin algebra + composition layer."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class OneForm:
    """coefficients[..., N, dim]; leading axes for tensor-valued forms
    (e.g. a one-form per entry of the homogenized tensor)."""

    coeffs: jnp.ndarray

    def __call__(self, velocity):
        """Pair with a velocity field [N, dim] -> [...] values."""
        v = jnp.asarray(velocity)
        return jnp.einsum("...nd,nd->...", self.coeffs, v)

    def __add__(self, o):
        return OneForm(self.coeffs + o.coeffs)

    def __sub__(self, o):
        return OneForm(self.coeffs - o.coeffs)

    def __mul__(self, s):
        return OneForm(self.coeffs * s)

    __rmul__ = __mul__

    @classmethod
    def of(cls, scalar_fn, X):
        """One-form of a scalar function of node positions via autodiff."""
        return cls(jax.grad(scalar_fn)(jnp.asarray(X)))


def compose(fn, form: OneForm) -> OneForm:
    """Push a linear map through a (tensor-valued) one-form
    (reference ``compose`` on OneForms)."""
    flat = form.coeffs.reshape((-1,) + form.coeffs.shape[-2:])
    # apply fn to the leading (value) axes via jacobian-vector products is
    # only valid for linear fn; evaluate by linearity on basis slices.
    mapped = fn(form.coeffs)
    return OneForm(jnp.asarray(mapped))
