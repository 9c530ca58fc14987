"""Surface parametrization: harmonic, LSCM, SCP.

Parity with reference ``Parametrization.hh/.cc`` (``harmonic :39``,
``lscm :35``, spectral conformal ``scp :60`` after Mullen et al. 2008,
plus ``scaleFactor``/``conformalDistortion`` analysis).

The conformal (LSCM) energy is E_C(z) = E_Dirichlet(z) - Area(z):
  H = [L 0; 0 L] - S,  with S the boundary area pairing
  Area(u, v) = 1/2 sum_bdry_edges (u_i v_j - u_j v_i).
LSCM pins two vertices and solves H z = b by CG; SCP finds the smallest
generalized eigenvector of (H, M) orthogonal to the trivial kernel via our
LOBPCG."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh.femmesh import FEMMesh
from ..ops import operators
from ..solvers import cg as cg_mod
from ..solvers import eigen as eigen_mod


def _conformal_operator(mesh: FEMMesh):
    """Returns H(z) operator on z [N, 2] plus the boundary edge list."""
    L = operators.laplacian(mesh)
    edges = mesh.cell.boundary_edges()          # [B, 2] CCW

    i = jnp.asarray(edges[:, 0])
    j = jnp.asarray(edges[:, 1])
    N = mesh.num_nodes

    def area_pair(z):
        """Gradient of Area(u, v) = 1/2 sum (u_i v_j - u_j v_i)."""
        u, v = z[:, 0], z[:, 1]
        gu = jnp.zeros(N, z.dtype).at[i].add(0.5 * v[j]).at[j].add(-0.5 * v[i])
        gv = jnp.zeros(N, z.dtype).at[j].add(0.5 * u[i]).at[i].add(-0.5 * u[j])
        return jnp.stack([gu, gv], axis=1)

    def H(z):
        return jnp.stack([L(z[:, 0]), L(z[:, 1])], axis=1) - area_pair(z)

    return H, L, edges


def harmonic(mesh: FEMMesh, tol: float = 1e-11):
    """Boundary mapped to the unit circle by arclength; interior harmonic
    (``Parametrization.hh:39``)."""
    L = operators.laplacian(mesh)
    loops = mesh.cell.boundary_loops()
    loop = max(loops, key=len)
    pts = mesh.V[loop]
    seg = np.linalg.norm(np.roll(pts, -1, axis=0) - pts, axis=1)
    s = np.concatenate([[0], np.cumsum(seg)[:-1]]) / seg.sum()
    theta = 2 * np.pi * s
    uv_b = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    fixed = np.zeros(mesh.num_nodes, dtype=bool)
    fixed[loop] = True
    vals = np.zeros((mesh.num_nodes, 2))
    vals[loop] = uv_b
    fixedj = jnp.asarray(fixed)
    diag = L.diagonal()
    Minv = lambda r: r / jnp.where(diag > 0, diag, 1.0)
    cols = []
    for c in range(2):
        res = cg_mod.solve_dirichlet(lambda u: L(u),
                                     jnp.zeros(mesh.num_nodes), fixedj,
                                     jnp.asarray(vals[:, c]), M_inv=Minv,
                                     tol=tol)
        cols.append(res.x)
    return jnp.stack(cols, axis=1)


def lscm(mesh: FEMMesh, pin_nodes=None, tol: float = 1e-11):
    """Least-squares conformal map with two pinned vertices
    (``Parametrization.hh:35``)."""
    H, L, edges = _conformal_operator(mesh)
    if pin_nodes is None:
        # Pin the two farthest-apart boundary vertices.
        bverts = mesh.cell.boundary_vertices()
        p = mesh.V[bverts]
        d2 = ((p[:, None] - p[None, :]) ** 2).sum(-1)
        a, b = np.unravel_index(np.argmax(d2), d2.shape)
        pin_nodes = [int(bverts[a]), int(bverts[b])]
    fixed = np.zeros((mesh.num_nodes, 2), dtype=bool)
    fixed[pin_nodes] = True
    vals = np.zeros((mesh.num_nodes, 2))
    vals[pin_nodes[0]] = [0.0, 0.0]
    vals[pin_nodes[1]] = [1.0, 0.0]
    fixedj = jnp.asarray(fixed)
    valsj = jnp.asarray(vals)
    project = cg_mod.mask_projector(~fixedj)
    z_d = jnp.where(fixedj, valsj, 0.0)
    rhs = project(-H(z_d))
    res = cg_mod.cg(H, rhs, project=project, tol=tol, maxiter=20000)
    return res.x + z_d


def scp(mesh: FEMMesh, tol: float = 1e-8, maxiter: int = 300):
    """Spectral conformal parametrization (``Parametrization.hh:60``):
    smallest nontrivial eigenvector of (H, M) — M the scalar mass matrix on
    both coordinates — deflating constants and the trivial rotation."""
    H, L, edges = _conformal_operator(mesh)
    M = operators.mass(mesh)
    N = mesh.num_nodes

    def K_apply(Z):   # [2N, m]
        m = Z.shape[1]
        z = Z.reshape(N, 2, m)
        out = jnp.stack([H(z[:, :, k]) for k in range(m)], axis=-1)
        return out.reshape(2 * N, m)

    def M_apply(Z):
        m = Z.shape[1]
        z = Z.reshape(N, 2, m)
        out = jnp.stack(
            [jnp.stack([M(z[:, 0, k]), M(z[:, 1, k])], axis=1)
             for k in range(m)], axis=-1)
        return out.reshape(2 * N, m)

    # Trivial kernel: constant u, constant v, and the rotation (v, -u)?
    # Constants in each coordinate span the translations.
    Z = np.zeros((2 * N, 2))
    Z[0::2, 0] = 1.0
    Z[1::2, 1] = 1.0
    # note: interleave (u, v) pairs row-major -> index 2*i / 2*i+1
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((2 * N, 2)))
    lam, X, _ = eigen_mod.lobpcg_generalized(
        K_apply, M_apply, X0, deflate=Z, tol=tol, maxiter=maxiter)
    z = np.asarray(X[:, 0]).reshape(N, 2)
    return jnp.asarray(z), lam


def scale_factor(mesh: FEMMesh, uv):
    """Per-element area scale factor sqrt(det(g)) of the parametrization
    (``Parametrization.hh:70``)."""
    J = _param_jacobian(mesh, uv)
    det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    return jnp.abs(det)


def conformal_distortion(mesh: FEMMesh, uv):
    """Per-element quasi-conformal distortion sigma_max / sigma_min."""
    J = _param_jacobian(mesh, uv)
    a = jnp.sum(J * J, axis=(1, 2))
    det = jnp.abs(J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0])
    # singular values from invariants
    s = jnp.sqrt(jnp.maximum(a * a / 4 - det * det, 0.0))
    smax2 = a / 2 + s
    smin2 = jnp.maximum(a / 2 - s, 1e-300)
    return jnp.sqrt(smax2 / smin2)


def _param_jacobian(mesh: FEMMesh, uv):
    """[E, 2, 2] Jacobian of the uv map w.r.t. a local surface frame."""
    g = mesh.geometry()
    gp = g.grad_lambda                                   # [E, 3, dim]
    X = mesh.V[mesh.F]
    e1 = X[:, 1] - X[:, 0]
    e1 = e1 / np.linalg.norm(e1, axis=1, keepdims=True)
    n = np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0])
    if X.shape[-1] == 2:
        e2 = np.stack([-e1[:, 1], e1[:, 0]], axis=1)
        frame = np.stack([e1, e2], axis=1)               # [E, 2, 2]
    else:
        n = n / np.linalg.norm(n, axis=1, keepdims=True)
        e2 = np.cross(n, e1)
        frame = np.stack([e1, e2], axis=1)               # [E, 2, 3]
    uve = uv[jnp.asarray(mesh.F)]                        # [E, 3, 2]
    duv = jnp.einsum("enc,end->ecd", uve, gp)            # [E, 2(uv), dim]
    return jnp.einsum("ecd,efd->ecf", duv, jnp.asarray(frame))  # [E,2,2]
