"""In-register lane-routing gather/scatter kernels (Pallas/Mosaic).

The unstructured-mesh SpMV bottleneck on TPU is irregular addressing: XLA's
gather costs ~5 ns per gathered ROW regardless of width (measured,
experiments/probe_tpu.py), so the element-by-element apply's ~6M narrow
rows/iteration are a ~40 ms wall.  This module replaces every narrow
gather/scatter with *in-register routing*:

  * the flat f32 source vector is viewed as rows of 128 lanes ("windows"),
    paged through VMEM in large blocks;
  * each output vreg [8, 128] routes its 1024 values from a small CHAIN of
    source windows: broadcast window row -> per-lane dynamic gather
    (``jnp.take_along_axis`` on axis 1, which Mosaic lowers to
    ``tpu.dynamic_gather``) -> masked accumulate;
  * a host-side routing compiler (:func:`plan_copy`, :func:`plan_reduce`)
    sorts work into chain-depth buckets (one compiled kernel per depth),
    pages the source, and spills the rare far-away source to a tiny XLA
    fix-up list.

Measured on v5e: ~48 Gvalues/s routed — 0.16 ms for the 7.7M-value gather
of a 257k-tet P2 elasticity apply, vs ~13 ms for the XLA gather.  This is
the difference between 18 and several hundred PCG iterations/s on general
meshes.

Replaces the irregular-access half of the reference's CSC SpMV
(``SparseMatrices.hh:1577`` ``applyRaw``) and its thread-local scatter
assembly (``ParallelAssembly.hh:42-100``).  Summation order is fixed by
the plan, so results are bit-for-bit deterministic run to run.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

try:  # pallas import kept non-fatal for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

BUCKETS = (1, 2, 4, 8, 12, 16, 24, 32, 48)  # chain depths (kernel variants)
_Z = np.int32(0)              # int32 literal for index maps: a bare 0
                              # becomes an i64 constant under x64,
                              # which Mosaic cannot legalize
B_VREGS = 64                  # output vregs (or tasks) per grid step
U_UNROLL = 8                  # vregs unrolled per inner fori_loop iteration
PAD_WIDX = 255                # widx that matches no chain slot -> routes 0.0
YBLOCK = 64                   # reduce: output windows per y-block
_SMEM_BUDGET = 512 * 1024     # bytes of scalar-prefetch (win) per call;
                              # SMEM is ~1 MB and win is its largest tenant


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

_GATHER_DNUMS = None


def _lane_gather(rowb, lidx):
    """out[i, j] = rowb[i, lidx[i, j]] — the dim-1 in-register gather that
    Mosaic lowers to ``tpu.dynamic_gather``.  Calls ``lax.gather`` directly
    with int32 indices: ``jnp.take_along_axis`` would promote them to int64
    under ``jax_enable_x64``, which Mosaic cannot lower."""
    global _GATHER_DNUMS
    if _GATHER_DNUMS is None:
        _GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        rowb, lidx[:, :, None], _GATHER_DNUMS, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _route_vreg(x_ref, win_ref, widx, lidx, base, chain):
    acc = jnp.zeros((8, 128), jnp.float32)
    for k in range(chain):
        w = win_ref[base + k]
        row = x_ref[pl.ds(w, 1), :]                    # [1, 128]
        rowb = jnp.broadcast_to(row, (8, 128))
        g = _lane_gather(rowb, lidx)
        acc = acc + jnp.where(widx == k, g, 0.0)
    return acc


def _route_vreg_planes(x_ref, win_ref, widx, lidx, base, chain, planes):
    """Planes-mode routing: ONE index stream (widx/lidx/win) routes
    ``planes`` value planes that share the routing pattern (vector
    components, multi-RHS columns).  The index decode and the per-chain
    mask are computed once and reused for every plane — index traffic
    and chain bookkeeping amortize ``planes``-fold, which matters because
    pidx is as large as one plane of routed output."""
    accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(planes)]
    for k in range(chain):
        w = win_ref[base + k]
        mask = widx == k
        for p in range(planes):
            row = x_ref[p, pl.ds(w, 1), :]             # [1, 128]
            rowb = jnp.broadcast_to(row, (8, 128))
            g = _lane_gather(rowb, lidx)
            accs[p] = accs[p] + jnp.where(mask, g, 0.0)
    return accs


def _u_unroll(planes):
    """Vregs unrolled per inner iteration: scale down with planes to keep
    the live accumulator count (planes * U) near 16."""
    u = max(1, 16 // planes)
    while B_VREGS % u:
        u -= 1
    return min(u, U_UNROLL)


def _route_vreg_tiles(x_ref, win_ref, widx, lidx, base, chain, planes):
    """Tile-chain routing: each chain step reads an 8-ROW tile (win holds
    block-relative TILE indices) and one dynamic_gather pulls row
    (tile*8 + i) at sublane i — 8 source rows per step instead of one
    broadcast row.  Output cell (i, j) must source from a row ≡ i (mod 8);
    the slab packer places contributions accordingly.  This is what makes
    the scatter-ladder rungs cheap: a rung's sources live in a handful of
    consecutive rows, so chains collapse to 1-3 tiles."""
    accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(planes)]
    for k in range(chain):
        w = win_ref[base + k]
        mask = widx == k
        for p in range(planes):
            tile = x_ref[p, pl.ds(w * 8, 8), :]          # [8, 128]
            g = _lane_gather(tile, lidx)
            accs[p] = accs[p] + jnp.where(mask, g, 0.0)
    return accs


def _copy_kernel_p(blk_ref, win_ref, pidx_ref, x_ref, o_ref, *,
                   chain, planes, u_unroll, tiles=False):
    pid = pl.program_id(0)
    route = _route_vreg_tiles if tiles else _route_vreg_planes

    def body(t, carry):
        slab = pidx_ref[pl.ds(t * u_unroll, u_unroll)]  # [U,8,128] int32
        outs = [[] for _ in range(planes)]
        for u in range(u_unroll):
            v = t * u_unroll + u
            accs = route(
                x_ref, win_ref, slab[u] >> 7, slab[u] & 127,
                (pid * B_VREGS + v) * chain, chain, planes)
            for p in range(planes):
                outs[p].append(accs[p])
        for p in range(planes):
            o_ref[p, pl.ds(t * u_unroll, u_unroll)] = jnp.stack(outs[p])
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B_VREGS // u_unroll), body,
                      jnp.int32(0))


def _reduce_kernel_p(blk_ref, init_ref, obk_ref, relw_ref, win_ref,
                     pidx_ref, x_ref, o_ref, *, chain, planes, u_unroll):
    pid = pl.program_id(0)

    @pl.when(init_ref[pid] == 1)
    def _():
        o_ref[:] = jnp.zeros((planes, YBLOCK, 128), jnp.float32)

    def body(t, carry):
        slab = pidx_ref[pl.ds(t * u_unroll, u_unroll)]
        for u in range(u_unroll):
            v = t * u_unroll + u
            accs = _route_vreg_planes(
                x_ref, win_ref, slab[u] >> 7, slab[u] & 127,
                (pid * B_VREGS + v) * chain, chain, planes)
            rw = relw_ref[pid * B_VREGS + v]
            for p in range(planes):
                part = jnp.sum(accs[p], axis=0)[None]   # [1, 128]
                o_ref[p, pl.ds(rw, 1)] = o_ref[p, pl.ds(rw, 1)] + part
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B_VREGS // u_unroll), body,
                      jnp.int32(0))


def _copy_kernel(blk_ref, win_ref, pidx_ref, x_ref, o_ref, *, chain):
    pid = pl.program_id(0)

    def body(t, carry):
        slab = pidx_ref[pl.ds(t * U_UNROLL, U_UNROLL)]  # [U,8,128] int32
        outs = []
        for u in range(U_UNROLL):
            v = t * U_UNROLL + u
            outs.append(_route_vreg(
                x_ref, win_ref, slab[u] >> 7, slab[u] & 127,
                (pid * B_VREGS + v) * chain, chain))
        o_ref[pl.ds(t * U_UNROLL, U_UNROLL)] = jnp.stack(outs)
        return carry

    # int32 bounds: under jax_enable_x64 a default fori_loop counts in
    # int64, whose conversions Mosaic cannot lower (infinite recursion)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B_VREGS // U_UNROLL), body,
                      jnp.int32(0))


def _reduce_kernel(blk_ref, init_ref, obk_ref, relw_ref, win_ref,
                   pidx_ref, x_ref, o_ref, *, chain):
    # arg order matches num_scalar_prefetch=5 in _reduce_call
    pid = pl.program_id(0)

    @pl.when(init_ref[pid] == 1)
    def _():
        o_ref[:] = jnp.zeros((YBLOCK, 128), jnp.float32)

    def body(t, carry):
        slab = pidx_ref[pl.ds(t * U_UNROLL, U_UNROLL)]
        for u in range(U_UNROLL):
            v = t * U_UNROLL + u
            acc = _route_vreg(
                x_ref, win_ref, slab[u] >> 7, slab[u] & 127,
                (pid * B_VREGS + v) * chain, chain)
            part = jnp.sum(acc, axis=0)[None]           # [1, 128]
            rw = relw_ref[pid * B_VREGS + v]
            o_ref[pl.ds(rw, 1)] = o_ref[pl.ds(rw, 1)] + part
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(B_VREGS // U_UNROLL), body,
                      jnp.int32(0))


@functools.lru_cache(maxsize=None)
def _copy_call(chain, n_vregs, blk_rows, src_rows, interpret):
    return pl.pallas_call(
        functools.partial(_copy_kernel, chain=chain),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,                     # blk, win
            grid=(n_vregs // B_VREGS,),
            in_specs=[
                pl.BlockSpec((B_VREGS, 8, 128), lambda i, *_: (i, _Z, _Z)),
                pl.BlockSpec((blk_rows, 128),
                             lambda i, blk, win: (blk[i], _Z)),
            ],
            out_specs=pl.BlockSpec((B_VREGS, 8, 128),
                                   lambda i, *_: (i, _Z, _Z)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_vregs, 8, 128), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _copy_call_p(chain, n_vregs, blk_rows, src_rows, planes, interpret,
                 tiles=False):
    u = _u_unroll(planes)
    return pl.pallas_call(
        functools.partial(_copy_kernel_p, chain=chain, planes=planes,
                          u_unroll=u, tiles=tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,                     # blk, win
            grid=(n_vregs // B_VREGS,),
            in_specs=[
                pl.BlockSpec((B_VREGS, 8, 128), lambda i, *_: (i, _Z, _Z)),
                pl.BlockSpec((planes, blk_rows, 128),
                             lambda i, blk, win: (_Z, blk[i], _Z)),
            ],
            out_specs=pl.BlockSpec((planes, B_VREGS, 8, 128),
                                   lambda i, *_: (_Z, i, _Z, _Z)),
        ),
        out_shape=jax.ShapeDtypeStruct((planes, n_vregs, 8, 128),
                                       jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _reduce_call_p(chain, n_steps, n_blocks, blk_rows, src_rows, planes,
                   interpret):
    u = _u_unroll(planes)
    return pl.pallas_call(
        functools.partial(_reduce_kernel_p, chain=chain, planes=planes,
                          u_unroll=u),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,            # blk, init, obk, relw, win
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((B_VREGS, 8, 128), lambda i, *_: (i, _Z, _Z)),
                pl.BlockSpec((planes, blk_rows, 128),
                             lambda i, blk, *_: (_Z, blk[i], _Z)),
            ],
            out_specs=pl.BlockSpec(
                (planes, YBLOCK, 128),
                lambda i, blk, init, obk, relw, win: (_Z, obk[i], _Z)),
        ),
        out_shape=jax.ShapeDtypeStruct((planes, n_blocks * YBLOCK, 128),
                                       jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _reduce_call(chain, n_steps, n_blocks, blk_rows, src_rows, interpret):
    return pl.pallas_call(
        functools.partial(_reduce_kernel, chain=chain),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,            # blk, init, obk, relw, win
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((B_VREGS, 8, 128), lambda i, *_: (i, _Z, _Z)),
                pl.BlockSpec((blk_rows, 128),
                             lambda i, blk, *_: (blk[i], _Z)),
            ],
            out_specs=pl.BlockSpec(
                (YBLOCK, 128),
                lambda i, blk, init, obk, relw, win: (obk[i], _Z)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * YBLOCK, 128),
                                       jnp.float32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Plan containers (pytrees: index arrays are leaves, passed as jit args)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _CopyBucket:
    chain: int
    blk: jnp.ndarray      # [steps] int32 source block per grid step
    win: jnp.ndarray      # [n_vregs * chain] int32 block-relative rows
    pidx: jnp.ndarray     # [n_vregs, 8, 128] int32 (widx << 7 | lidx)

    def tree_flatten(self):
        return (self.blk, self.win, self.pidx), (self.chain,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(aux[0], *ch)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _ReduceBucket:
    chain: int
    n_blocks: int
    blk: jnp.ndarray      # [steps] int32
    init: jnp.ndarray     # [steps] int32 1 = zero the out block first
    obk: jnp.ndarray      # [steps] int32 local out block per step
    relw: jnp.ndarray     # [steps * B_VREGS] int32 out row within block
    win: jnp.ndarray
    pidx: jnp.ndarray

    def tree_flatten(self):
        return ((self.blk, self.init, self.obk, self.relw, self.win,
                 self.pidx), (self.chain, self.n_blocks))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(aux[0], aux[1], *ch)


def _pad_to_rows(src_flat, src_rows):
    pad = src_rows * 128 - src_flat.shape[0]
    x = src_flat.astype(jnp.float32)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
    return x.reshape(src_rows, 128)


def _pad_to_rows_p(src, planes, src_rows):
    """[planes, n_src] -> [planes, src_rows, 128] zero-padded planes."""
    src = src.reshape(planes, -1).astype(jnp.float32)
    pad = src_rows * 128 - src.shape[1]
    if pad:
        src = jnp.concatenate(
            [src, jnp.zeros((planes, pad), jnp.float32)], axis=1)
    return src.reshape(planes, src_rows, 128)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CopyPlan:
    """Routed gather: ``copy(src)[i] == src[src_ids[i]]`` (0.0 where -1).

    With ``planes > 1`` the SAME per-plane routing serves ``planes``
    stacked value planes (src ``[planes, n_src]`` -> out
    ``[planes, n_out]``): vector components / multi-RHS columns share one
    index stream (see :func:`_route_vreg_planes`)."""

    buckets: tuple
    restore: jnp.ndarray        # [NV] int32: original vreg -> compact pos
    fix_pos: jnp.ndarray        # [F] int32 output positions for XLA fix-up
    fix_src: jnp.ndarray        # [F] int32 source ids
    n_out: int
    src_rows: int
    blk_rows: int
    planes: int = 1
    tiles: bool = False         # tile-chain cells (see _route_vreg_tiles)

    def tree_flatten(self):
        return ((self.buckets, self.restore, self.fix_pos, self.fix_src),
                (self.n_out, self.src_rows, self.blk_rows, self.planes,
                 self.tiles))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[2], ch[3], *aux)

    def __call__(self, src, *, interpret=False):
        if self.planes == 1 and not self.tiles:
            return self._call1(src, interpret)
        src2 = src.reshape(self.planes, -1)
        x2 = _pad_to_rows_p(src2, self.planes, self.src_rows)
        outs = []
        for b in self.buckets:
            call = _copy_call_p(b.chain, b.pidx.shape[0], self.blk_rows,
                                self.src_rows, self.planes, interpret,
                                self.tiles)
            outs.append(call(b.blk, b.win, b.pidx, x2))
        if not outs:
            out = jnp.zeros((self.planes, 1, 8, 128), src2.dtype)
        else:
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs,
                                                                 axis=1)
        out = out[:, self.restore]
        flat = out.reshape(self.planes, -1)[:, : self.n_out]
        if self.fix_pos.shape[0]:
            flat = flat.at[:, self.fix_pos].set(
                jnp.where(self.fix_src[None, :] >= 0,
                          src2[:, jnp.maximum(self.fix_src, 0)], 0.0)
                .astype(flat.dtype), mode="drop")
        return flat

    def _call1(self, src_flat, interpret):
        src_flat = src_flat.reshape(-1)
        x2 = _pad_to_rows(src_flat, self.src_rows)
        outs = []
        for b in self.buckets:
            call = _copy_call(b.chain, b.pidx.shape[0], self.blk_rows,
                              self.src_rows, interpret)
            outs.append(call(b.blk, b.win, b.pidx, x2))
        if not outs:  # all-padding map: nothing routed, all zeros
            out = jnp.zeros((1, 8, 128), src_flat.dtype)
        else:
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        out = out[self.restore]
        flat = out.reshape(-1)[: self.n_out]
        if self.fix_pos.shape[0]:
            flat = flat.at[self.fix_pos].set(
                jnp.where(self.fix_src >= 0,
                          src_flat[jnp.maximum(self.fix_src, 0)], 0.0)
                .astype(flat.dtype), mode="drop")
        return flat


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ReducePlan:
    """Routed deterministic segment-sum:
    ``reduce(src)[d] == sum_{i: dst_ids[i]==d} src[i]``.

    With ``planes > 1``: src ``[planes, n_src]`` -> out
    ``[planes, n_out]`` through one shared index stream."""

    buckets: tuple
    block_pos: jnp.ndarray      # [NBL] int32 -> row into concat blocks (or -1)
    fix_dst: jnp.ndarray        # [F] int32 dof ids for XLA fix-up adds
    fix_src: jnp.ndarray        # [F] int32 source slot ids
    n_out: int
    src_rows: int
    blk_rows: int
    planes: int = 1

    def tree_flatten(self):
        return ((self.buckets, self.block_pos, self.fix_dst, self.fix_src),
                (self.n_out, self.src_rows, self.blk_rows, self.planes))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[2], ch[3], *aux)

    def __call__(self, src, *, interpret=False):
        if self.planes == 1:
            return self._call1(src, interpret)
        src2 = src.reshape(self.planes, -1)
        x2 = _pad_to_rows_p(src2, self.planes, self.src_rows)
        outs = []
        for b in self.buckets:
            call = _reduce_call_p(b.chain, b.blk.shape[0], b.n_blocks,
                                  self.blk_rows, self.src_rows,
                                  self.planes, interpret)
            outs.append(
                call(b.blk, b.init, b.obk, b.relw, b.win, b.pidx,
                     x2).reshape(self.planes, b.n_blocks, YBLOCK, 128))
        if not outs:
            blocks = jnp.zeros((self.planes, 0, YBLOCK, 128), src2.dtype)
        else:
            blocks = outs[0] if len(outs) == 1 \
                else jnp.concatenate(outs, axis=1)
        zero = jnp.zeros((self.planes, 1, YBLOCK, 128), blocks.dtype)
        blocks = jnp.concatenate([blocks, zero], axis=1)
        y = blocks[:, self.block_pos]          # [planes, NBL, YBLOCK, 128]
        flat = y.reshape(self.planes, -1)[:, : self.n_out]
        if self.fix_dst.shape[0]:
            flat = flat.at[:, self.fix_dst].add(
                src2[:, self.fix_src].astype(flat.dtype))
        return flat

    def _call1(self, src_flat, interpret):
        src_flat = src_flat.reshape(-1)
        x2 = _pad_to_rows(src_flat, self.src_rows)
        outs = []
        for b in self.buckets:
            call = _reduce_call(b.chain, b.blk.shape[0], b.n_blocks,
                                self.blk_rows, self.src_rows, interpret)
            outs.append(
                call(b.blk, b.init, b.obk, b.relw, b.win, b.pidx,
                     x2).reshape(b.n_blocks, YBLOCK, 128))
        if not outs:  # all-padding map: nothing routed, all zeros
            blocks = jnp.zeros((0, YBLOCK, 128), src_flat.dtype)
        else:
            blocks = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        zero = jnp.zeros((1, YBLOCK, 128), blocks.dtype)
        blocks = jnp.concatenate([blocks, zero])
        y = blocks[self.block_pos]                     # [NBL, YBLOCK, 128]
        flat = y.reshape(-1)[: self.n_out]
        if self.fix_dst.shape[0]:
            flat = flat.at[self.fix_dst].add(
                src_flat[self.fix_src].astype(flat.dtype))
        return flat


# ---------------------------------------------------------------------------
# Host-side routing compiler
# ---------------------------------------------------------------------------

def pack_to_device(tree):
    """Ship a plan's index arrays to the device in ONE batched transfer.

    The builders below leave every pytree leaf as host numpy; naive
    per-leaf ``jnp.asarray`` costs one relay round trip each (~0.2 s on
    the axon tunnel — 651 s total for the 1.17M-DOF bench plans,
    profiled).  Here all int32 leaves are concatenated into two streams
    (one int16 for leaves whose values fit, halving the bytes on the
    wire) and device-sliced back into place."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for l in leaves:
        a = np.asarray(l)
        # every plan leaf today is an int32-safe index array; a float or
        # >int32 leaf added later must fail HERE, not be silently
        # truncated into garbage routing indices
        assert np.issubdtype(a.dtype, np.integer), \
            f"pack_to_device: non-integer plan leaf dtype {a.dtype}"
        assert a.size == 0 or (a.min() >= np.iinfo(np.int32).min
                               and a.max() <= np.iinfo(np.int32).max), \
            "pack_to_device: plan leaf value exceeds int32 range"
    arrs = [np.ascontiguousarray(np.asarray(l, np.int32)) for l in leaves]
    is16 = [a.size > 0 and a.min() >= -32768 and a.max() <= 32767
            for a in arrs]
    s16 = [a.reshape(-1).astype(np.int16) for a, t in zip(arrs, is16) if t]
    s32 = [a.reshape(-1) for a, t in zip(arrs, is16) if not t]
    d16 = jnp.asarray(np.concatenate(s16)) if s16 else None
    d32 = jnp.asarray(np.concatenate(s32)) if s32 else None
    o16 = o32 = 0
    out = []
    for a, t in zip(arrs, is16):
        if t:
            out.append(d16[o16:o16 + a.size].astype(jnp.int32)
                       .reshape(a.shape))
            o16 += a.size
        else:
            out.append(d32[o32:o32 + a.size].reshape(a.shape))
            o32 += a.size
    return jax.tree_util.tree_unflatten(treedef, out)


def _emit_tables(sid, step_blk_of_vreg, chain, blk_rows):
    """Build win/pidx tables for vregs [NV, 8, 128] given each vreg's
    assigned source block and a common chain budget.  Vectorized: one
    global sort-unique over (vreg, window) pairs; only vregs exceeding the
    chain budget fall back to a per-vreg fix-up loop.  Returns
    (win [NV, chain] int32, pidx [NV,8,128] int32, (spill_pos, spill_src))."""
    NV = sid.shape[0]
    sflat = sid.reshape(NV, 1024)
    win_of = np.where(sflat >= 0, sflat >> 7, np.int64(-1))
    lidx = np.where(sflat >= 0, sflat & 127, 0).astype(np.int32)
    lo = (step_blk_of_vreg * blk_rows)[:, None]
    ok = (win_of >= lo) & (win_of < lo + blk_rows)
    vid = np.broadcast_to(np.arange(NV, dtype=np.int64)[:, None],
                          (NV, 1024))
    BIG = np.int64(1) << 40
    keys = vid[ok] * BIG + win_of[ok]
    uniq, inv = np.unique(keys, return_inverse=True)
    u_vreg = (uniq // BIG).astype(np.int64)
    u_win = (uniq % BIG).astype(np.int64)
    nwin = np.bincount(u_vreg, minlength=NV)
    starts = np.concatenate([[0], np.cumsum(nwin)])
    widx_flat = np.full((NV, 1024), PAD_WIDX, np.int64)
    widx_flat[ok] = inv - starts[vid[ok]]
    win = np.zeros((NV, chain), np.int32)
    fits = nwin <= chain
    fit_u = fits[u_vreg]
    win[u_vreg[fit_u],
        (np.arange(len(uniq)) - starts[u_vreg])[fit_u]] = \
        (u_win - step_blk_of_vreg[u_vreg] * blk_rows)[fit_u]
    # over-budget vregs: keep the most-used windows, spill the rest
    for v in np.nonzero(~fits)[0]:
        sel = ok[v]
        w = win_of[v][sel]
        wins, invv, counts = np.unique(w, return_inverse=True,
                                       return_counts=True)
        keep = np.sort(np.argsort(-counts, kind="stable")[:chain])
        keep_mask = np.zeros(len(wins), bool)
        keep_mask[keep] = True
        new_pos = np.cumsum(keep_mask) - 1
        wi = np.where(keep_mask[invv], new_pos[invv], PAD_WIDX)
        widx_flat[v][sel] = wi
        drop = np.zeros(1024, bool)
        drop[sel] = ~keep_mask[invv]
        ok[v] &= ~drop
        win[v, : keep_mask.sum()] = (wins[keep_mask]
                                     - step_blk_of_vreg[v] * blk_rows)
    far = (sflat >= 0) & ~ok
    if far.any():
        sp_pos = np.nonzero(far.reshape(-1))[0]
        sp_src = sflat.reshape(-1)[sp_pos]
    else:
        sp_pos = np.zeros(0, np.int64)
        sp_src = np.zeros(0, np.int64)
    pidx = ((widx_flat.astype(np.int32) << 7) | lidx).reshape(NV, 8, 128)
    return win, pidx, (sp_pos, sp_src)


def _chain_bucket(n):
    return int(np.searchsorted(BUCKETS, max(min(n, BUCKETS[-1]), 1)))


def _round_rows(n_src, blk_rows_req):
    rows = max(-(-n_src // 128), 8)
    rows = -(-rows // 8) * 8
    blk = min(blk_rows_req, rows)
    rows = -(-rows // blk) * blk
    return rows, blk


def _default_blk_rows(blk_rows, planes):
    """Per-plane VMEM source-block rows: the resident block is
    [planes, blk_rows, 128] f32 and DOUBLE-BUFFERED, and small bucket
    outputs get stack-allocated in VMEM too — at planes > 4 a 12288-row
    total budget measured 16.5 M scoped vmem (OOM at 16 M); shrink the
    many-plane budget so block + output headroom fits."""
    if blk_rows is not None:
        return blk_rows
    budget = 12288 if planes <= 4 else 7168
    return max(8, (budget // planes) // 8 * 8)


def plan_copy(src_ids, n_src: int, blk_rows: int | None = None,
              planes: int = 1, force_structure=None) -> CopyPlan:
    """Compile a routed gather (out[i] = src[src_ids[i]]; -1 -> 0.0).

    ``planes``: bake the plan for planes-mode dispatch — ``src_ids`` are
    PLANE-LOCAL (in [0, n_src)); at call time ``planes`` stacked value
    planes of length ``n_src`` route through the shared index stream.

    ``force_structure``: ``({chain: n_steps}, n_fix)`` from
    :func:`copy_plan_structure` — emit a plan with EXACTLY that bucket
    layout and fix-up length (padded with route-0 work) so plans built
    for different shards stack into one SPMD program (shard_map)."""
    blk_rows = _default_blk_rows(blk_rows, planes)
    src_ids = np.ascontiguousarray(np.asarray(src_ids, np.int64).reshape(-1))
    n_out = len(src_ids)
    NV = max(-(-n_out // 1024), 1)
    padded = np.full(NV * 1024, -1, np.int64)
    padded[:n_out] = src_ids
    src_rows, blk_rows = _round_rows(n_src, blk_rows)
    sid = padded.reshape(NV, 8, 128)
    force = force_structure[0] if force_structure else None
    buckets, pos_of, sp_pos, sp_src = _copy_bucket_pipeline(
        sid, blk_rows, force)
    keep = sp_pos < n_out
    sp_pos, sp_src = sp_pos[keep], sp_src[keep]
    if force_structure is not None:
        n_fix = force_structure[1]
        assert len(sp_pos) <= n_fix, "forced fix-up list too small"
        pad = n_fix - len(sp_pos)
        # pad fix-ups with out-of-bounds positions: dropped by the
        # mode='drop' scatter in CopyPlan.__call__
        sp_pos = np.concatenate([sp_pos, np.full(pad, n_out, np.int64)])
        sp_src = np.concatenate([sp_src, np.full(pad, -1, np.int64)])
    return pack_to_device(CopyPlan(
        tuple(buckets), np.asarray(pos_of, np.int32),
        np.asarray(sp_pos, np.int32),
        np.asarray(sp_src, np.int32),
        n_out, src_rows, blk_rows, planes))


def copy_plan_structure(plans) -> tuple:
    """Union structure of several CopyPlans: ``({chain: n_steps}, n_fix)``
    with per-chain step counts and fix-up length maxed across plans —
    feed back into :func:`plan_copy` (force_structure=...) to rebuild
    each plan with identical shapes."""
    chains: dict = {}
    n_fix = 0
    for p in plans:
        per = {}
        for b in p.buckets:
            per[b.chain] = per.get(b.chain, 0) + int(
                np.asarray(b.blk).shape[0])
        for c, s in per.items():
            chains[c] = max(chains.get(c, 0), s)
        n_fix = max(n_fix, int(np.asarray(p.fix_pos).shape[0]))
    return chains, n_fix


def plan_copy_cells(sid, n_src: int, planes: int = 1,
                    blk_rows: int | None = None) -> CopyPlan:
    """Compile a TILE-CHAIN routed copy from an explicit cell map
    ``sid [NV, 8, 128]`` (plane-local source position per output cell,
    -1 = 0.0), requiring cell (v, i, j) to source from a row ≡ i (mod 8)
    — each chain step then reads an 8-row tile and one dynamic_gather
    serves 8 source rows (see :func:`_route_vreg_tiles`)."""
    blk_rows = _default_blk_rows(blk_rows, planes)
    blk_rows = max(8, blk_rows // 8 * 8)
    sid = np.ascontiguousarray(np.asarray(sid, np.int64))
    NV = sid.shape[0]
    assert sid.shape == (NV, 8, 128)
    live = sid >= 0
    rows = np.where(live, sid >> 7, 0)
    sub = np.broadcast_to(np.arange(8)[None, :, None], sid.shape)
    assert np.all((rows % 8 == sub) | ~live), \
        "plan_copy_cells: cell sublane must equal source row % 8"
    src_rows, blk_rows = _round_rows(n_src, blk_rows)
    if src_rows % 8:
        src_rows = -(-src_rows // 8) * 8
    # tile-granular ids: "row" = tile index, lane unchanged
    sid_t = np.where(live, ((sid >> 10) << 7) | (sid & 127), np.int64(-1))
    buckets, pos_of, sp_pos, _ = _copy_bucket_pipeline(
        sid_t, blk_rows // 8)
    n_out = NV * 1024
    # spill fix-up needs ORIGINAL positions (the pipeline saw tile ids)
    sp_src = sid.reshape(-1)[sp_pos]
    return pack_to_device(CopyPlan(
        tuple(buckets), np.asarray(pos_of, np.int32),
        np.asarray(sp_pos, np.int32), np.asarray(sp_src, np.int32),
        n_out, src_rows, blk_rows, planes, True))


def _pad_bucket_steps(b, n_steps):
    """Pad a (numpy) _CopyBucket with dummy route-0 steps/vregs so every
    shard's bucket of a given chain class has IDENTICAL shapes (SPMD
    requirement for shard_map-stacked plans)."""
    cur = b.blk.shape[0]
    if cur == n_steps:
        return b
    extra = n_steps - cur
    blk = np.concatenate([b.blk, np.zeros(extra, np.int64)])
    win = np.concatenate(
        [b.win, np.zeros(extra * B_VREGS * b.chain, np.int64)])
    pad_pidx = np.full((extra * B_VREGS, 8, 128),
                       np.int64(PAD_WIDX) << 7, np.int64)
    pidx = np.concatenate([b.pidx, pad_pidx])
    return _CopyBucket(b.chain, blk, win, pidx)


def _copy_bucket_pipeline(sid, blk_units, force=None):
    """Bucket/step emission shared by :func:`plan_copy` (row-granular
    windows) and :func:`plan_copy_cells` (tile-granular windows): sid
    values encode (window_unit << 7 | lane).

    ``force``: ``{chain: n_steps}`` — emit EXACTLY one bucket per listed
    chain, padded to n_steps grid steps, lifting each vreg to the
    smallest forced chain that covers its provisional chain (uniform
    structure across shard_map shards)."""
    NV = sid.shape[0]
    win_of = np.where(sid >= 0, sid >> 7, np.iinfo(np.int64).max)
    vmin = win_of.reshape(NV, -1).min(axis=1)
    vmin = np.where(vmin == np.iinfo(np.int64).max, 0, vmin)
    vblk = vmin // blk_units
    # provisional chains (own block) for bucketing — one global
    # sort-unique over (vreg, window) pairs instead of a per-vreg loop
    wf = win_of.reshape(NV, 1024)
    lo = (vblk * blk_units)[:, None]
    inb = (sid.reshape(NV, 1024) >= 0) & (wf >= lo) & (wf < lo + blk_units)
    vv = np.broadcast_to(np.arange(NV, dtype=np.int64)[:, None],
                         (NV, 1024))
    BIGW = np.int64(1) << 40
    uniq_vw = np.unique(vv[inb] * BIGW + wf[inb])
    prov = np.maximum(
        np.bincount((uniq_vw // BIGW).astype(np.int64), minlength=NV), 1)
    bucket_of = np.array([_chain_bucket(c) for c in prov])
    if force is not None:
        fchains = sorted(force)
        fidx = {c: BUCKETS.index(c) for c in fchains}
        lift = {}
        for bi, ch in enumerate(BUCKETS):
            cands = [c for c in fchains if c >= ch]
            lift[bi] = fidx[cands[0] if cands else fchains[-1]]
        bucket_of = np.array([lift[b] for b in bucket_of])
    order = np.lexsort((np.arange(NV), vblk, bucket_of))
    # steps: consecutive groups of B_VREGS within a bucket share a block
    buckets = []
    pos_of = np.zeros(NV, np.int64)
    all_sp_pos, all_sp_src = [], []
    base = 0
    for bi, ch in enumerate(BUCKETS):
        sel_all = order[bucket_of[order] == bi]
        if force is not None:
            if ch not in force:
                assert len(sel_all) == 0
                continue
            n_steps = force[ch]
            assert n_steps * B_VREGS * ch * 4 <= _SMEM_BUDGET, \
                "forced bucket exceeds the SMEM win budget"
            n_bk = len(buckets)
            base = _emit_copy_bucket(sel_all, sid, vblk, ch, blk_units,
                                     buckets, pos_of, all_sp_pos,
                                     all_sp_src, base)
            if len(buckets) == n_bk:     # empty class: emit all-pad bucket
                buckets.append(_CopyBucket(
                    ch, np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros((0, 8, 128), np.int64)))
            assert len(buckets) == n_bk + 1, \
                "forced bucket split by SMEM chunking"
            cur_steps = buckets[-1].blk.shape[0]
            assert cur_steps <= n_steps, "forced n_steps too small"
            buckets[-1] = _pad_bucket_steps(buckets[-1], n_steps)
            base += (n_steps - cur_steps) * B_VREGS
            continue
        if len(sel_all) == 0:
            continue
        # scalar-prefetch operands (win) live in SMEM (~1 MB): cap each
        # pallas call's vreg count so win + blk fit comfortably
        max_vregs = max(_SMEM_BUDGET // (4 * ch), B_VREGS)
        max_vregs = max_vregs // B_VREGS * B_VREGS
        chunks = [sel_all[i: i + max_vregs]
                  for i in range(0, len(sel_all), max_vregs)]
        for sel in chunks:
            base = _emit_copy_bucket(sel, sid, vblk, ch, blk_units,
                                     buckets, pos_of, all_sp_pos,
                                     all_sp_src, base)
    sp_pos = (np.concatenate(all_sp_pos) if all_sp_pos
              else np.zeros(0, np.int64))
    sp_src = (np.concatenate(all_sp_src) if all_sp_src
              else np.zeros(0, np.int64))
    return buckets, pos_of, sp_pos, sp_src


def _emit_copy_bucket(sel, sid, vblk, ch, blk_rows, buckets, pos_of,
                      all_sp_pos, all_sp_src, base):
    # split vregs into steps of B_VREGS sharing a source block: runs of
    # equal vblk are padded to step boundaries (dummy vregs route 0).
    if len(sel):
        slot_vreg = []          # original vreg id or -1 (pad)
        step_blk = []
        i = 0
        while i < len(sel):
            b0 = vblk[sel[i]]
            j = i
            while j < len(sel) and j - i < B_VREGS and vblk[sel[j]] == b0:
                j += 1
            slot_vreg.extend(sel[i:j].tolist())
            slot_vreg.extend([-1] * (B_VREGS - (j - i)))
            step_blk.append(int(b0))
            i = j
        slot_vreg = np.asarray(slot_vreg, np.int64)
        nv_pad = len(slot_vreg)
        sid_b = np.full((nv_pad, 8, 128), -1, np.int64)
        real = slot_vreg >= 0
        sid_b[real] = sid[slot_vreg[real]]
        blk_of_vreg = np.repeat(np.asarray(step_blk, np.int64), B_VREGS)
        win_l, pidx, (sp_p, sp_s) = _emit_tables(
            sid_b, blk_of_vreg, ch, blk_rows)
        win = win_l.reshape(-1)
        # map spill positions (local to this bucket's padded sid) back to
        # original flat slot positions
        if len(sp_p):
            lv = sp_p // 1024
            off = sp_p % 1024
            orig = slot_vreg[lv]
            keep = orig >= 0
            all_sp_pos.append(orig[keep] * 1024 + off[keep])
            all_sp_src.append(sp_s[keep])
        pos_of[slot_vreg[real]] = base + np.nonzero(real)[0]
        base += nv_pad
        buckets.append(_CopyBucket(
            ch, np.asarray(step_blk, np.int32),
            np.asarray(win, np.int32), np.asarray(pidx, np.int32)))
    return base


def plan_reduce(dst_ids, n_out: int, n_src: int,
                blk_rows: int | None = None,
                chain_budget: int = BUCKETS[-1],
                planes: int = 1) -> ReducePlan:
    """Compile a routed deterministic segment-sum over ``src[i] -> dst_ids[i]``.

    Work layout: output window w covers dofs [128w, 128w + 128); each task
    vreg routes up to 8 contributions per dof (sublanes) for one window and
    is sublane-summed in-kernel; tasks accumulate into a resident
    [YBLOCK, 128] output block.  Chunks of 8 contributions are packed into
    tasks by occurrence rank under a per-window min-source-window sort
    (fully vectorized — no per-chunk host loop); tasks whose chain exceeds
    the bucket ladder spill their far slots to the XLA fix-up list.

    ``planes``: as in :func:`plan_copy` — plane-local ids, planes-mode
    dispatch at call time."""
    blk_rows = _default_blk_rows(blk_rows, planes)
    dst_ids = np.ascontiguousarray(np.asarray(dst_ids, np.int64).reshape(-1))
    S = len(dst_ids)
    valid = np.nonzero(dst_ids >= 0)[0]
    order = valid[np.argsort(dst_ids[valid], kind="stable")]
    dsts = dst_ids[order]
    src_rows, blk_rows = _round_rows(n_src, blk_rows)
    # chunk decomposition: per dof, groups of up to 8 source slots
    counts = np.bincount(dsts, minlength=n_out)
    offs = np.concatenate([[0], np.cumsum(counts)])
    n_win = -(-n_out // 128)
    NBL = -(-n_win // YBLOCK)

    # Chunk decomposition (vectorized): per dof, groups of up to 8 slots,
    # each annotated with its minimum source window for locality sorting.
    nch = -(-counts // 8)
    chunk_dof = np.repeat(np.arange(n_out), nch)
    within = np.arange(len(chunk_dof)) - np.repeat(
        np.concatenate([[0], np.cumsum(nch)])[:-1], nch)
    chunk_start = offs[chunk_dof] + within * 8
    chunk_end = np.minimum(chunk_start + 8, offs[chunk_dof + 1])
    src_win = order >> 7
    chunk_minwin = (np.minimum.reduceat(src_win, chunk_start)
                    if len(chunk_start) else np.zeros(0, np.int64))
    chunk_win_out = chunk_dof >> 7                 # output window per chunk
    cw_offs = np.concatenate(
        [[0], np.cumsum(np.bincount(chunk_win_out, minlength=n_win))])

    # Vectorized occurrence-rank packing: within each output window, chunks
    # sort by their min source window (locality); chunks of the same dof
    # (lane) must land in distinct tasks, so a chunk's task is its
    # occurrence rank within (window, lane) under that sort.  Chains are
    # whatever the grouping yields — structurally small for
    # locality-preserving orderings — and over-budget tasks spill through
    # ``_emit_tables``'s keep-most-used fallback.
    n_chunks = len(chunk_dof)
    lane = chunk_dof & 127
    o = np.lexsort((chunk_minwin, lane, chunk_win_out))
    gkey = chunk_win_out[o] * 128 + lane[o]
    first = np.ones(n_chunks, dtype=bool)
    first[1:] = gkey[1:] != gkey[:-1]
    starts_idx = np.nonzero(first)[0]
    grp_len = np.diff(np.concatenate([starts_idx, [n_chunks]]))
    occ = np.arange(n_chunks) - np.repeat(starts_idx, grp_len)
    # task key = (window, occurrence); dense task indices in that order
    tkey = chunk_win_out[o] * np.int64(max(occ.max(initial=0) + 1, 1)) \
        + occ
    uniq_t, task_of_chunk = np.unique(tkey, return_inverse=True)
    n_tasks = len(uniq_t)
    tasks_win_a = np.zeros(n_tasks, np.int64)
    tasks_win_a[task_of_chunk] = chunk_win_out[o]
    # fill [n_tasks, 8, 128] source-id slabs
    tasks_sid = np.full((n_tasks, 8, 128), -1, np.int64)
    cs, ce = chunk_start[o], chunk_end[o]
    clen = ce - cs
    flat_rows = np.repeat(np.arange(n_chunks), clen)
    within_c = np.arange(clen.sum()) - np.repeat(np.cumsum(clen) - clen,
                                                clen)
    slot_vals = order[np.repeat(cs, clen) + within_c]
    tasks_sid[task_of_chunk[flat_rows], within_c, lane[o][flat_rows]] = \
        slot_vals
    # per-task chain depth = distinct source windows
    t_rep = task_of_chunk[flat_rows]
    wkey = np.unique(t_rep * np.int64(src_rows + 1) + (slot_vals >> 7))
    task_nwin = np.bincount(wkey // np.int64(src_rows + 1),
                            minlength=n_tasks)
    task_minwin = np.full(n_tasks, np.iinfo(np.int64).max)
    np.minimum.at(task_minwin, t_rep, slot_vals >> 7)
    task_minwin[task_minwin == np.iinfo(np.int64).max] = 0
    task_block = tasks_win_a // YBLOCK
    # block bucket = chain bucket of its worst task
    blk_bucket = np.zeros(NBL, np.int64)
    np.maximum.at(blk_bucket, task_block,
                  np.searchsorted(BUCKETS,
                                  np.clip(task_nwin, 1, BUCKETS[-1])))
    # order blocks bucket-major (stable), tasks by (block order, window)
    blocks_order = np.lexsort((np.arange(NBL), blk_bucket))
    block_rank = np.empty(NBL, np.int64)
    block_rank[blocks_order] = np.arange(NBL)
    task_order = np.lexsort((tasks_win_a, block_rank[task_block]))
    # tasks of one block are contiguous in task_order (block_rank is the
    # primary sort key): O(1) per-block slices instead of O(n_tasks) scans
    tb_sorted = block_rank[task_block[task_order]]
    blk_task_lo = np.searchsorted(tb_sorted, np.arange(NBL))
    blk_task_hi = np.searchsorted(tb_sorted, np.arange(NBL) + 1)

    buckets = []
    block_pos = np.full(NBL, -1, np.int64)
    all_fix_dst, all_fix_src = [], []
    concat_base = 0
    for bi, ch in enumerate(BUCKETS):
        bsel = blocks_order[blk_bucket[blocks_order] == bi]
        # blocks with no tasks at all land in bucket 0 via blk_bucket == 0;
        # drop empty ones (no tasks -> stay -1 -> zeros)
        bsel = [b for b in bsel
                if blk_task_hi[block_rank[b]] > blk_task_lo[block_rank[b]]]
        if len(bsel) == 0:
            continue
        state = dict(sid_rows=[], relw=[], stepblk=[], init=[], obk=[],
                     gblocks=[])

        def _flush():
            if not state["gblocks"]:
                return
            # sid_rows holds TASK INDICES (-1 = pad row); gather the
            # [NV, 8, 128] slab in one fancy-index instead of stacking
            # hundreds of thousands of tiny arrays
            tidx = np.asarray(state["sid_rows"], np.int64)
            sid_b = np.empty((len(tidx), 8, 128), np.int64)
            real = tidx >= 0
            sid_b[real] = tasks_sid[tidx[real]]
            sid_b[~real] = -1
            stepblk = np.asarray(state["stepblk"], np.int64)
            win_l, pidx, (sp_p, sp_s) = _emit_tables(
                sid_b, np.repeat(stepblk, B_VREGS), ch, blk_rows)
            if len(sp_p):
                lv = sp_p // 1024
                lane = sp_p % 128
                step_of = lv // B_VREGS
                ob = np.asarray(state["obk"], np.int64)[step_of]
                rw = np.asarray(state["relw"], np.int64)[lv]
                gb = np.asarray(state["gblocks"], np.int64)[ob]
                all_fix_dst.append((gb * YBLOCK + rw) * 128 + lane)
                all_fix_src.append(sp_s)
            buckets.append(_ReduceBucket(
                ch, len(state["gblocks"]),
                stepblk.astype(np.int32),
                np.asarray(state["init"], np.int32),
                np.asarray(state["obk"], np.int32),
                np.asarray(state["relw"], np.int32),
                np.asarray(win_l.reshape(-1), np.int32),
                np.asarray(pidx, np.int32)))
            for k in state:
                state[k] = []

        max_win_entries = _SMEM_BUDGET // 4
        for b in bsel:
            tsel = task_order[blk_task_lo[block_rank[b]]:
                              blk_task_hi[block_rank[b]]]
            # per-task source block (min source window's block); order the
            # block's tasks by it so steps form long same-block runs
            tblk = task_minwin[tsel] // blk_rows
            reord = np.argsort(tblk, kind="stable")
            tsel = tsel[reord]
            tblk = tblk[reord]
            # flush current call if adding this y-block would blow SMEM
            est = (len(state["sid_rows"]) + len(tsel) + B_VREGS) * ch
            if est > max_win_entries:
                concat_base += len(state["gblocks"])
                _flush()
            local_b = len(state["gblocks"])
            state["gblocks"].append(b)
            # steps: runs of equal source block, padded to B_VREGS
            i = 0
            first = True
            while i < len(tsel):
                b0 = tblk[i]
                j = i
                while j < len(tsel) and j - i < B_VREGS and tblk[j] == b0:
                    j += 1
                state["stepblk"].append(int(b0))
                state["init"].append(1 if first else 0)
                first = False
                state["obk"].append(local_b)
                state["sid_rows"].extend(tsel[i:j].tolist())
                state["relw"].extend(
                    (tasks_win_a[tsel[i:j]] - b * YBLOCK).tolist())
                npad = B_VREGS - (j - i)
                state["sid_rows"].extend([-1] * npad)
                state["relw"].extend([0] * npad)
                i = j
            block_pos[b] = concat_base + local_b
        concat_base += len(state["gblocks"])
        _flush()
    fd = (np.concatenate(all_fix_dst) if all_fix_dst
          else np.zeros(0, np.int64))
    fs = (np.concatenate(all_fix_src) if all_fix_src
          else np.zeros(0, np.int64))
    block_pos = np.where(block_pos < 0, concat_base, block_pos)
    return pack_to_device(ReducePlan(
        tuple(buckets), np.asarray(block_pos, np.int32),
        np.asarray(fd, np.int32), np.asarray(fs, np.int32),
        n_out, src_rows, blk_rows, planes))
