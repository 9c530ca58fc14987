"""RPN field-processing calculator over MSH fields (parity with
``tools/msh_processor.cc``):

    python -m meshfem_tpu.cli.msh_processor in.msh \\
        -e 'u' norm max print \\
        -e 'stress' vonmises mean print \\
        [-o out.msh --name processed]

Stack ops: field names push fields; scalars push constants;
add sub mul div neg abs sqrt | norm vonmises eigenvalues |
min max sum mean | smooth | print | dup pop swap.
"""

from __future__ import annotations

import argparse

import numpy as np


def _apply_op(stack, op, ctx):
    from ..physics.elasticity import von_mises
    import jax.numpy as jnp

    def pop():
        return stack.pop()

    binops = {"add": np.add, "sub": np.subtract, "mul": np.multiply,
              "div": np.divide}
    if op in binops:
        b, a = pop(), pop()
        stack.append(binops[op](a, b))
    elif op == "neg":
        stack.append(-pop())
    elif op == "abs":
        stack.append(np.abs(pop()))
    elif op == "sqrt":
        stack.append(np.sqrt(pop()))
    elif op == "norm":
        a = pop()
        stack.append(np.linalg.norm(a, axis=-1) if a.ndim > 1 else np.abs(a))
    elif op == "vonmises":
        a = pop()
        dim = 2 if a.shape[-1] == 3 else 3
        stack.append(np.asarray(von_mises(jnp.asarray(a), dim)))
    elif op == "eigenvalues":
        from ..fem.flattening import flat_to_sym

        a = pop()
        full = np.asarray(flat_to_sym(a))
        stack.append(np.linalg.eigvalsh(full))
    elif op in ("min", "max", "sum", "mean"):
        stack.append(getattr(np, op)(pop()))
    elif op == "smooth":
        a = pop()
        stack.append(ctx["smooth"](a))
    elif op == "print":
        top = stack[-1]
        if np.ndim(top) == 0:
            print(float(top))
        else:
            print(f"field shape {np.shape(top)}, "
                  f"range [{np.min(top):.6g}, {np.max(top):.6g}]")
    elif op == "dup":
        stack.append(stack[-1])
    elif op == "pop":
        pop()
    elif op == "swap":
        stack[-1], stack[-2] = stack[-2], stack[-1]
    else:
        try:
            stack.append(float(op))
        except ValueError as exc:
            raise ValueError(f"unknown op/field {op!r}") from exc


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mesh")
    ap.add_argument("-e", "--expr", nargs="+", action="append",
                    default=[], help="RPN expression (repeatable)")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--name", default="processed")
    args = ap.parse_args(argv)

    from ..io import meshio, msh_fields
    from ..mesh import FEMMesh

    V, F = meshio.load(args.mesh)
    fields = msh_fields.read_fields(args.mesh)

    def smooth(a):
        """One Jacobi smoothing pass over nodal fields."""
        K = F.shape[1] - 1 if F.shape[1] <= 4 else None
        import scipy.sparse as sp

        n = len(V)
        i = np.repeat(F[:, :1], F.shape[1] - 1, axis=1).ravel()
        adj = sp.coo_matrix(
            (np.ones(F.size), (np.repeat(np.arange(len(F)), F.shape[1]),
                               F.ravel())), shape=(len(F), n)).tocsr()
        A = (adj.T @ adj > 0).astype(float)
        deg = np.asarray(A.sum(axis=1)).ravel()
        return (A @ a) / deg if a.ndim == 1 else (A @ a) / deg[:, None]

    ctx = {"smooth": smooth}
    results = []
    for expr in args.expr:
        stack = []
        for tok in expr:
            if tok in fields:
                stack.append(fields[tok]["data"].squeeze())
            else:
                _apply_op(stack, tok, ctx)
        if stack:
            results.append(stack[-1])

    if args.output and results:
        out_fields = []
        for i, r in enumerate(results):
            if np.ndim(r) == 0:
                continue
            where = "node" if len(r) == len(V) else "element"
            out_fields.append({"name": f"{args.name}_{i}", "data": r,
                               "where": where,
                               "kind": "scalar" if r.ndim == 1 else "vector"})
        meshio.save_msh(args.output, V, F, fields=out_fields)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
