"""Checkpoint / resume of solver state and simulation results.

The reference's persistence primitives (SURVEY §5.4): matrix binary
dump/read (``TripletMatrix::dumpBinary``), ``.msh`` field round trips, numpy
dumps of Hessians/modes.  TPU equivalents here:

* ``save_solver_state`` / ``load_solver_state`` — npz snapshots of CG/
  Newton/LOBPCG iterates for long-run resume;
* orbax checkpointing when available (trees of device arrays);
* ``.msh`` interop lives in ``io.msh_fields`` (writer+parser = full
  simulation state, like the reference).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax


def save_solver_state(path, state: dict) -> None:
    """Save a dict of arrays (CG x/r/p, eigenvector blocks, ...) to npz."""
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in state.items()})


def load_solver_state(path) -> dict:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_tree(path, tree) -> None:
    """Checkpoint an arbitrary pytree (orbax when available, npz fallback)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(Path(path).absolute(), tree)
        ckptr.wait_until_finished()
    except Exception:
        leaves, treedef = jax.tree.flatten(tree)
        np.savez_compressed(
            str(path) + ".npz",
            treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
            **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})


def dump_matrix(path, A) -> None:
    """Binary triplet dump of a scipy sparse matrix
    (``TripletMatrix::dumpBinary``, ``SparseMatrices.hh:629``)."""
    A = A.tocoo()
    with open(path, "wb") as f:
        np.asarray([A.shape[0], A.shape[1], A.nnz],
                   dtype=np.int64).tofile(f)
        A.row.astype(np.int64).tofile(f)
        A.col.astype(np.int64).tofile(f)
        A.data.astype(np.float64).tofile(f)


def read_matrix(path):
    """Read a binary triplet dump back to scipy COO."""
    import scipy.sparse as sp

    with open(path, "rb") as f:
        m, n, nnz = np.fromfile(f, dtype=np.int64, count=3)
        row = np.fromfile(f, dtype=np.int64, count=nnz)
        col = np.fromfile(f, dtype=np.int64, count=nnz)
        data = np.fromfile(f, dtype=np.float64, count=nnz)
    return sp.coo_matrix((data, (row, col)), shape=(int(m), int(n)))
