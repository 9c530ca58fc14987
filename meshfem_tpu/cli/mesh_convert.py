"""Mesh conversion + filter pipeline CLI (parity with ``mesh_convert.cc``):

    python -m meshfem_tpu.cli.mesh_convert in.obj out.msh \\
        [--subdivide N] [--reflect] [--extrude H] [--clean] [--reorient] \\
        [--keepLargestComponent] [--binary]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--subdivide", type=int, default=0)
    ap.add_argument("--reflect", action="store_true",
                    help="reflect into 2^d periodic tiling")
    ap.add_argument("--extrude", type=float, default=None,
                    help="extrude 2D mesh to a tet mesh of this height")
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--clean", action="store_true",
                    help="merge duplicate + remove dangling vertices")
    ap.add_argument("--reorient", action="store_true")
    ap.add_argument("--keepLargestComponent", action="store_true")
    ap.add_argument("--binary", action="store_true", help="binary MSH")
    args = ap.parse_args(argv)

    from ..io import meshio
    from ..mesh import filters

    V, F = meshio.load(args.input)
    if F.shape[1] == 3 and np.allclose(V[:, 2], 0):
        V = V[:, :2]
    if args.clean:
        V, F = filters.merge_duplicate_vertices(V, F, eps=1e-12)
        V, F = filters.remove_dangling_vertices(V, F)
    if args.keepLargestComponent:
        V, F = filters.remove_small_components(V, F)
    if args.reorient:
        V, F = filters.reorient_negative_elements(V, F)
    if args.subdivide:
        V, F = filters.subdivide(V, F, args.subdivide)
    if args.reflect:
        V, F = filters.reflect(V, F)
    if args.extrude is not None:
        V, F = filters.extrude(V, F, args.extrude, args.layers)
    if args.output.endswith(".msh") and args.binary:
        meshio.save_msh(args.output, V, F, binary=True)
    else:
        meshio.save(args.output, V, F)
    print(f"{args.input} -> {args.output}: {len(V)} vertices, "
          f"{len(F)} elements")


if __name__ == "__main__":
    main()
