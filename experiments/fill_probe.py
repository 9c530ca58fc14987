"""Host-side fill-in probe for the blocked-ELL general SpMV format.

Round-3 design question: assembled block formats were measured (round 2)
at >= 12x fill-in "at any block size" — but the measurement used square
node-blocks.  The round-3 candidate is a DOF-space format tuned to the
measured gather cost model (row-count-bound gathers, ~5 ns/row regardless
of width; value streaming at HBM BW):

  * row-groups of R nodes (3R DOF rows), col-tiles of C DOFs (C % 128 == 0
    keeps every array lane-aligned, no relayout copies);
  * per group, the set of col-tiles its rows touch, ELL-padded;
  * apply = wide row-gather of x tiles [G*K rows of width C]
          + one elementwise-mult/reduce over values [G, 3R, K*C].

This probe computes, for real meshes and candidate (ordering, R, C):
  fill scalars  = sum_g 3R * K_g * C        (value stream per SpMV)
  gather rows   = sum_g K_g
  est ms        = fill * 4B / 819 GB/s + rows * 5 ns   (+ x-stream, small)

Run: python experiments/fill_probe.py [n]
"""
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
from meshfem_tpu.mesh import FEMMesh, generators  # noqa: E402
from meshfem_tpu.mesh.reorder import _morton_codes  # noqa: E402


def node_adjacency(mesh):
    en = mesh.elem_nodes
    E, n = en.shape
    r = np.repeat(en, n, axis=1).ravel()
    c = np.tile(en, (1, n)).ravel()
    A = sp.coo_matrix((np.ones(len(r), np.int8), (r, c)),
                      shape=(mesh.num_nodes, mesh.num_nodes)).tocsr()
    A.data[:] = 1
    return A


def fill_for(A, perm, R, C):
    """A: node adjacency csr; perm: new ordering (perm[i] = old node at new
    slot i). Returns (K per group, fill scalars, gather rows)."""
    N = A.shape[0]
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    Ap = A[perm][:, perm].tocsr()
    G = (N + R - 1) // R
    indptr, indices = Ap.indptr, Ap.indices
    Ks = np.zeros(G, np.int64)
    for g in range(G):
        lo, hi = indptr[g * R], indptr[min((g + 1) * R, N)]
        cols = indices[lo:hi]
        # node j occupies DOFs 3j..3j+2 -> tiles (3j)//C and (3j+2)//C
        t0 = (3 * cols) // C
        t1 = (3 * cols + 2) // C
        Ks[g] = len(np.unique(np.concatenate([t0, t1])))
    fill = int((3 * R) * C * Ks.sum())
    return Ks, fill, int(Ks.sum())


def orderings(mesh, A):
    N = mesh.num_nodes
    out = {"natural": np.arange(N)}
    out["morton"] = np.argsort(_morton_codes(mesh.node_positions),
                               kind="stable")
    try:
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        out["rcm"] = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                                np.int64)
    except Exception:
        pass
    return out


def report(name, mesh):
    t0 = time.time()
    A = node_adjacency(mesh)
    nnz_pairs = A.nnz
    nnz_scalars = nnz_pairs * 9
    print(f"== {name}: N={mesh.num_nodes} E={mesh.num_elements} "
          f"node-pairs={nnz_pairs/1e6:.2f}M scalars={nnz_scalars/1e6:.0f}M "
          f"exact-stream={nnz_scalars*4/819e9*1e3:.2f}ms "
          f"(adj {time.time()-t0:.1f}s)")
    for oname, perm in orderings(mesh, A).items():
        for R, C in [(8, 128), (8, 256), (16, 128), (4, 128), (8, 64),
                     (16, 256), (32, 256), (32, 512)]:
            t0 = time.time()
            Ks, fill, rows = fill_for(A, perm, R, C)
            est = fill * 4 / 819e9 * 1e3 + rows * 5e-9 * 1e3
            estb = fill * 2 / 819e9 * 1e3 + rows * 5e-9 * 1e3
            print(f"  {oname:8s} R={R:2d} C={C:3d}: K mean={Ks.mean():5.2f} "
                  f"p90={np.percentile(Ks, 90):4.0f} max={Ks.max():4d} "
                  f"fill={fill*4/1e9:5.2f}GB ({fill/nnz_scalars:4.1f}x) "
                  f"rows={rows/1e3:6.0f}k est_f32={est:5.2f}ms "
                  f"bf16={estb:5.2f}ms ({time.time()-t0:.1f}s)")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    V, T = generators.grid_tet(n, n, n)
    report(f"grid_tet {n}^3 P2", FEMMesh(V, T, degree=2))


if __name__ == "__main__":
    main()
