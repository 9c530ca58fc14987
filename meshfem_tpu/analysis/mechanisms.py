"""Linkage-microstructure mechanisms: opening analysis and optimization.

Parity with the reference's research binaries
``src/bin/mechanisms/OpenLinkage.cc`` and ``OptimizeLinkage.cc``: both
iterate periodic homogenization of a linkage cell, extract the softest
deformation mode (minimum eigenstrain of Eh), and advect the mesh along a
per-node displacement field — OpenLinkage along the opening displacement
itself, OptimizeLinkage along a shape derivative of the mode.

The shape derivative ``dEh/dx`` (per-vertex ElasticityTensor one-form,
reference ``homogenizedElasticityTensorDiscreteDifferential``,
``PeriodicHomogenization.hh:383-484``) is obtained here by autodiff: the
energy form

    Eh_ij,kl |Y| = int_Y (e^ij + e(w^ij)) : C : (e^kl + e(w^kl)) dV

is stationary in the fluctuation fields w (they solve the cell problems),
so its Lagrangian derivative with NODAL w VALUES HELD FIXED equals the
total derivative — exactly what the reference computes by hand with
per-element quadrature.  ``jax.jacrev`` through the differentiable
re-embedding (``FEMMesh.node_positions_from_vertices``) and element
stiffness replaces the manual ``mutualEnergy``/``dstrainTerm`` loop nest.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..fem import elasticity_tensor as et
from ..fem.flattening import flat_len, flat_rows_cols, shear_doubler
from ..ops import element_matrices as em
from . import homogenization as hom


def energy_form_Eh(mesh: FEMMesh, D, w, Xv=None,
                   base_cell_volume: float | None = None):
    """Homogenized tensor via the mutual-energy form, differentiable in the
    vertex positions ``Xv`` with nodal fluctuations ``w`` [fl, N, dim]
    held fixed (reference ``PeriodicHomogenization.hh:383-484`` computes
    the same quantity's vertex derivative by hand).

    Eh |Y| = sum_e [ w_i Ke w_j + int e^i:C:e(w_j) + int e^j:C:e(w_i)
                     + e^i:C:e^j vol_e ].
    """
    dim = mesh.dim
    fl = flat_len(dim)
    D = jnp.asarray(D)
    if Xv is None:
        Xv = jnp.asarray(mesh.V)
    X = mesh.node_positions_from_vertices(Xv)
    g = mesh.geometry(X)
    dt = g.grad_lambda.dtype
    D = D.astype(dt)
    w = jnp.asarray(w, dt)
    vol = g.volume
    Ke = em.element_elasticity(g.grad_lambda, vol, D, mesh.degree)
    en = jnp.asarray(mesh.elem_nodes)
    we = w[:, en, :]                                   # [fl, E, n, dim]
    wef = we.reshape(fl, we.shape[1], -1)              # node-major dofs
    term_ww = jnp.einsum("iea,eab,jeb->ij", wef, Ke, wef)
    centroid = np.full((1, mesh.K + 1), 1.0 / (mesh.K + 1))
    B = em.element_strain_matrix(g.grad_lambda, mesh.degree, centroid)[:, 0]
    sa = jnp.einsum("eanc,ienc->iea", B, we)           # [fl, E, fl] strains
    stress = et.double_contract(D, sa)                 # [fl, E, fl]
    # int e^i : C : e(w_j) over element = stress_j[e, i] * vol_e
    cross = jnp.einsum("e,jei->ij", vol, stress)
    canon = jnp.stack([hom.canonical_strain(dim, i, dt) for i in range(fl)])
    Sc = et.double_contract(D, canon)                  # [fl(j), fl(i)]
    const = Sc.T * jnp.sum(vol)
    if base_cell_volume is None:
        base_cell_volume = mesh.bbox().volume()
    Y = jax.lax.stop_gradient(jnp.asarray(base_cell_volume, dt))
    return (term_ww + cross + cross.T + const) / Y


def eh_vertex_differential(mesh: FEMMesh, D, w,
                           base_cell_volume: float | None = None):
    """dEh/d(vertex positions): [Nv, dim, fl, fl] per-vertex-component
    elasticity tensors (reference OneForm<ETensor, N>,
    ``homogenizedElasticityTensorDiscreteDifferential``)."""
    Xv = jnp.asarray(mesh.V)
    J = jax.jacrev(
        lambda X: energy_form_Eh(mesh, D, w, X, base_cell_volume))(Xv)
    return jnp.moveaxis(J, (2, 3), (0, 1))             # [Nv, dim, fl, fl]


def sum_identified_vertex_field(mesh: FEMMesh, dof_map, v):
    """Sum values over periodically identified VERTICES and redistribute
    (reference ``sumIdentifiedValues``, ``OptimizeLinkage.cc:87-101``)."""
    v = np.asarray(v)
    dofs = np.asarray(dof_map)[np.asarray(mesh.vertex_nodes)]
    num = int(dofs.max()) + 1
    acc = np.zeros((num,) + v.shape[1:])
    np.add.at(acc, dofs, v)
    return acc[dofs]


def _oriented_eigenstrains(Eh):
    """Eigenstrains sorted ascending by eigenvalue, each flipped so its
    first raw component is positive (``OpenLinkage.cc:160-171``)."""
    strains, lam = et.eigenstrains(Eh)                 # [fl, n], ascending
    sign = jnp.where(strains[0] < 0, -1.0, 1.0)
    return strains * sign[None, :], lam


def _max_column_normalize(field):
    """Divide by the largest per-node vector norm
    (``Fields.hh maxColumnNormalize``)."""
    nrm = jnp.sqrt(jnp.max(jnp.sum(field ** 2, axis=-1)))
    return field / jnp.where(nrm > 0, nrm, 1.0)


@dataclasses.dataclass
class LinkageStep:
    """Per-iteration record of an open/optimize run."""

    Eh: np.ndarray                # [fl, fl]
    min_eigenvalue: float
    opening_strain: np.ndarray    # [fl] raw flat components
    step_field: np.ndarray        # [Nv, dim] applied vertex displacement


@dataclasses.dataclass
class LinkageResult:
    steps: list
    vertices: np.ndarray          # final vertex positions
    max_rel_edge_change: float
    Eh: np.ndarray                # final homogenized tensor


def _unique_edges(mesh: FEMMesh) -> np.ndarray:
    from ..fem import simplex

    pairs = np.asarray(simplex.simplex_edges(mesh.K))
    e = mesh.F[:, pairs].reshape(-1, 2)
    e.sort(axis=1)
    return np.unique(e, axis=0)


def open_linkage(mesh: FEMMesh, material, num_steps: int = 20,
                 opening_speed: float = 0.01, orthotropic_cell: bool = False,
                 tol: float = 1e-7, permit_mismatch: bool = False,
                 callback=None) -> LinkageResult:
    """Iteratively open a linkage microstructure along its softest mode
    (``OpenLinkage.cc:106-252``).

    Each step: homogenize -> min eigenstrain of Eh = opening strain ->
    opening displacement = strain-driven affine part + matching
    combination of fluctuation fields (boundary-face average translation
    removed) -> normalize, scale by ``opening_speed``, advect vertices.
    Periodic vertex identification is computed ONCE on the input mesh and
    held (the reference's manualPeriodicVertices semantics — re-matching a
    deformed cell needs its mismatch escape hatch anyway)."""
    D0 = material.D if hasattr(material, "D") else jnp.asarray(material)
    if mesh.node_order != "reference":
        # node numbering must be position-independent: the mesh is rebuilt
        # after each advection step and dof_map must keep meaning
        mesh = FEMMesh(np.asarray(mesh.V), mesh.F, degree=mesh.degree)
    dim = mesh.dim
    fl = flat_len(dim)
    edges = _unique_edges(mesh)
    V0 = np.asarray(mesh.V, np.float64)
    orig_len = np.linalg.norm(V0[edges[:, 0]] - V0[edges[:, 1]], axis=1)

    from ..mesh import periodic as per

    cell = mesh.bbox()
    dof_map, _, _ = per.match_periodic_nodes(
        mesh.node_positions, cell, 1e-7, permit_mismatch=permit_mismatch)

    V = V0.copy()
    steps: list[LinkageStep] = []
    max_rel = 0.0
    Eh = None
    m = mesh
    for it in range(num_steps):
        if orthotropic_cell:
            res = hom.homogenize_orthotropic(m, D0, tol=tol)
            w = res.w
            Eh = res.Ch
            sim = None
        else:
            from ..physics.elasticity import ElasticitySimulator

            sim = ElasticitySimulator(m, D0, dof_map=dof_map)
            w, _ = hom.solve_cell_problems(sim, tol=tol)
            Eh = hom.homogenized_tensor_displacement_form(
                sim, w, base_cell_volume=cell.volume())
        strains, lam = _oriented_eigenstrains(Eh)
        opening = strains[:, 0]                        # min eigenstrain

        # keep boundary vertices on the cell faces in the average sense:
        # per component, subtract the mean of w over nodes on the min face
        bb = m.bbox()
        pos = m.node_positions
        w_c = w
        for dcomp in range(dim):
            on_face = np.abs(pos[:, dcomp] - bb.min[dcomp]) < 1e-9
            on_face &= m.is_bdry_node
            if on_face.any():
                tr = jnp.mean(w[:, jnp.asarray(np.nonzero(on_face)[0]),
                                dcomp], axis=1)
                w_c = w_c.at[:, :, dcomp].add(-tr[:, None])

        center = 0.5 * (np.asarray(bb.min) + np.asarray(bb.max))
        r, c = flat_rows_cols(dim)
        S = np.zeros((dim, dim))
        S[r, c] = np.asarray(opening)
        S[c, r] = np.asarray(opening)
        affine = (np.asarray(pos) - center) @ S.T      # [N, dim]
        coef = jnp.asarray(shear_doubler(dim), w.dtype) * \
            jnp.asarray(opening, w.dtype)
        disp = jnp.asarray(affine, w.dtype) + jnp.einsum("i,ind->nd", coef,
                                                         w_c)
        step = _max_column_normalize(disp) * opening_speed
        step_v = np.asarray(step)[np.asarray(m.vertex_nodes)]
        steps.append(LinkageStep(np.asarray(Eh), float(lam[0]),
                                 np.asarray(opening), step_v))
        if callback is not None:
            callback(it, m, steps[-1])
        V = V + step_v
        m = FEMMesh(V, mesh.F, degree=mesh.degree)
        new_len = np.linalg.norm(V[edges[:, 0]] - V[edges[:, 1]], axis=1)
        max_rel = max(max_rel, float(
            np.max(np.abs(new_len - orig_len) / orig_len)))
    return LinkageResult(steps, V, max_rel, np.asarray(Eh))


def optimize_linkage(mesh: FEMMesh, material, num_steps: int = 20,
                     step_size: float = 0.01, tol: float = 1e-7,
                     objective_component: int = 1,
                     callback=None) -> LinkageResult:
    """Steer the softest mode's eigenstrain by moving mesh vertices along
    the shape derivative of its component (``OptimizeLinkage.cc:106-202``:
    descent along dMinEigenstrainC1 = d/dx of the min eigenstrain's
    component via first-order eigen-perturbation
    ``-pinv(Eh) : (dEh : s_min)``)."""
    D0 = material.D if hasattr(material, "D") else jnp.asarray(material)
    if mesh.node_order != "reference":
        mesh = FEMMesh(np.asarray(mesh.V), mesh.F, degree=mesh.degree)
    dim = mesh.dim
    edges = _unique_edges(mesh)
    V0 = np.asarray(mesh.V, np.float64)
    orig_len = np.linalg.norm(V0[edges[:, 0]] - V0[edges[:, 1]], axis=1)

    from ..mesh import periodic as per
    from ..physics.elasticity import ElasticitySimulator

    cell = mesh.bbox()
    dof_map, _, _ = per.match_periodic_nodes(mesh.node_positions, cell,
                                             1e-7)
    V = V0.copy()
    steps: list[LinkageStep] = []
    Eh = None
    m = mesh
    for it in range(num_steps):
        sim = ElasticitySimulator(m, D0, dof_map=dof_map)
        w, _ = hom.solve_cell_problems(sim, tol=tol)
        Eh = hom.homogenized_tensor_displacement_form(
            sim, w, base_cell_volume=cell.volume())
        strains, lam = _oriented_eigenstrains(Eh)
        s_min = strains[:, 0]
        dEh = eh_vertex_differential(m, D0, w,
                                     base_cell_volume=cell.volume())
        # d(s_min)/dx ~ -pinv(Eh) (dEh : s_min): [Nv, dim, fl]
        Eh_pinv = et.pseudoinverse(Eh)
        dstrain = -jnp.einsum("ab,vcbd,d->vca",
                              Eh_pinv * jnp.asarray(
                                  shear_doubler(dim), Eh.dtype)[None, :],
                              dEh * jnp.asarray(
                                  shear_doubler(dim), Eh.dtype)[None, None,
                                                                None, :],
                              s_min)
        desc = dstrain[:, :, objective_component]      # [Nv, dim]
        desc = jnp.asarray(sum_identified_vertex_field(m, dof_map, desc))
        step = np.asarray(_max_column_normalize(desc) * step_size)
        steps.append(LinkageStep(np.asarray(Eh), float(lam[0]),
                                 np.asarray(s_min), step))
        if callback is not None:
            callback(it, m, steps[-1])
        V = V + step
        m = FEMMesh(V, mesh.F, degree=mesh.degree)
    new_len = np.linalg.norm(V[edges[:, 0]] - V[edges[:, 1]], axis=1)
    max_rel = float(np.max(np.abs(new_len - orig_len) / orig_len))
    return LinkageResult(steps, V, max_rel, np.asarray(Eh))
