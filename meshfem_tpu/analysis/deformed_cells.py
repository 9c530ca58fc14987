"""Homogenization of linearly deformed cells + shape derivatives of the
homogenized tensor.

Parity with reference ``DeformedCells_cli.cc`` (``--jacobian`` warps the
cell; ``--transformVersion`` transforms the base tensor instead of the
mesh; ``--parametrizedTransform`` streams transforms) and
``PeriodicHomogenization.hh:226-492`` (homogenized tensor gradients /
discrete differentials) — the latter via autodiff of the energy-form
tensor with frozen fluctuations (valid because w is the stationary point
of the cell-problem energy, so the partial derivative IS the total
derivative; this replaces ~300 lines of hand-derived shape calculus)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..mesh.geometry import simplex_geometry
from ..fem import elasticity_tensor as et
from ..fem.flattening import flat_len, shear_doubler
from ..ops import element_matrices as em
from . import homogenization as hom


def homogenize_deformed(mesh: FEMMesh, material, jacobian,
                        transform_version: bool = False, tol: float = 1e-11):
    """Effective tensor of the cell warped by the linear map ``jacobian``.

    transform_version=False: warp the mesh vertices (DeformedCells default).
    transform_version=True: keep the mesh, transform the base tensor by the
    rotation part and scale like the reference's --transformVersion."""
    F = np.asarray(jacobian, dtype=np.float64)
    if transform_version:
        # Transform the base tensor by the rotation part of F instead of
        # warping the mesh (reference --transformVersion semantics).
        U, s, Vt = np.linalg.svd(F)
        R = U @ Vt
        D = material.D if hasattr(material, "D") else jnp.asarray(material)
        D2 = et.transform(jnp.asarray(D), jnp.asarray(R))
        from ..physics.materials import Material

        mat2 = Material(mesh.dim, D2)
        return hom.homogenize(mesh, mat2, tol=tol)
    # General jacobians (shear/rotation) break axis-aligned periodic matching
    # on the warped vertices, so match periodic pairs on the ORIGINAL cell and
    # re-embed the same mesh at the warped positions (the linear map commutes
    # with edge-node construction).  Cell volume = |det F| * |Y|.
    from ..mesh import periodic as per

    dof_map, _, _ = per.match_periodic_nodes(mesh.node_positions, mesh.bbox())
    X2 = jnp.asarray(np.asarray(mesh.node_positions) @ F.T)
    from ..physics.elasticity import ElasticitySimulator

    sim = ElasticitySimulator(mesh, material, dof_map=dof_map,
                              node_positions=X2)
    w, iters = hom.solve_cell_problems(sim, tol=tol)
    w = w - jnp.mean(w, axis=1, keepdims=True)
    vol_cell = abs(np.linalg.det(F)) * mesh.bbox().volume()
    Ch = hom.homogenized_tensor_stress_form(sim, w, base_cell_volume=vol_cell)
    strain_w = jnp.stack([sim.average_strain_field(w[i])
                          for i in range(w.shape[0])])
    return hom.HomogenizationResult(Ch, w, strain_w, iters)


def _energy_form_tensor(mesh: FEMMesh, D, w, node_positions):
    """[fl, fl] energy-form homogenized tensor at given node positions with
    FROZEN fluctuation displacements w [fl, N, dim]:
        Ehat(i, j) = 1/|Y| int (eps(w_i) + B_i) : C : (eps(w_j) + B_j)
    equal to the stress-form tensor (the 1/2-normalized canonical basis
    makes the two coincide entry-by-entry)."""
    fl = w.shape[0]
    dim = mesh.dim
    X = node_positions
    corners = X[jnp.asarray(mesh.F)]
    grad_lambda, volume = simplex_geometry(corners, mesh.K)
    # average strain of each w_i on each element (degree<=1 strains).
    from ..fem import shape_functions as sf

    centroid = np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
    B = em.element_strain_matrix(grad_lambda, mesh.degree, centroid)[:, 0]
    en = jnp.asarray(mesh.elem_nodes)
    eps_w = jnp.stack([
        jnp.einsum("eanc,enc->ea", B, w[i][en]) for i in range(fl)
    ])                                                   # [fl, E, fl]
    # add macro canonical strains
    basis = jnp.stack([hom.canonical_strain(dim, i, X.dtype)
                       for i in range(fl)])              # [fl, fl]
    total = eps_w + basis[:, None, :]
    S = jnp.asarray(shear_doubler(dim), dtype=X.dtype)
    if jnp.ndim(D) == 2:
        sig = jnp.einsum("ab,jeb->jea", D * S[None, :], total)
    else:
        sig = jnp.einsum("eab,jeb->jea", D * S[None, :], total)
    Ehat = jnp.einsum("iea,a,jea,e->ij", total, S, sig, volume)
    vol_cell = mesh.bbox().volume()
    return Ehat / vol_cell


def homogenized_tensor_shape_gradient(sim, w, weights):
    """d(sum_ij weights_ij Eh_ij)/d(node positions) — the shape derivative
    of a functional of the homogenized tensor (replaces
    ``homogenizedElasticityTensorDiscreteDifferential``).

    Uses the energy form with frozen w (total = partial at the stationary
    point) and the S-scaling between energy and stress forms."""
    mesh = sim.mesh

    def J(X):
        Ehat = _energy_form_tensor(mesh, sim.D, w, X)
        return jnp.sum(jnp.asarray(np.asarray(weights)) * Ehat)

    X0 = jnp.asarray(mesh.node_positions)
    return jax.grad(J)(X0)


def homogenized_tensor_at(sim, w, node_positions=None):
    """Stress-form-normalized tensor from the energy form (autodiff-ready
    path used by the shape-gradient machinery; agrees with
    ``homogenized_tensor_stress_form`` for converged w)."""
    mesh = sim.mesh
    X = jnp.asarray(mesh.node_positions if node_positions is None
                    else node_positions)
    return _energy_form_tensor(mesh, sim.D, w, X)
