"""Pallas TPU kernel: the fused post-sort segment scan of the device
enumeration.

After the packed-key sort, the bifurcation + counting rule
(reference: src/vertexenumeration.cpp:67-70,227-245) is a handful of
segmented scans over the sorted rows (see index/enumeration.py
:_enum_device_impl for the algebra).  XLA executes each scan as its own
multi-pass HBM program (~3 ms per scan at 4M rows on a v5e); this module
runs the whole pipeline as THREE Pallas passes — forward, backward,
forward — each a single streaming read/write over the arrays with the
running state carried in SMEM across sequential grid steps:

  pass 1 (fwd): segment starts, segment ordinals, the segmented ORs of
          A (adjacent neighbor-pair change) and B (separator touch) via
          the (ordinal << 1 | flag) cummax trick, and each segment's
          last-row verdict `counted_end`;
  pass 2 (bwd): broadcast of the last-row verdict back over its segment
          (reverse cummax keyed by max_ord - ordinal);
  pass 3 (fwd): dense id assignment (cumsum of counted group starts),
          selection mask, and the pack keys for the final position sort.

Within a tile, prefix ops run as lane-axis log-steps followed by a
sublane-axis log-step carry combine (pltpu.roll + iota masks): row-major
scan order matches the flattened array order.  Grid steps execute
sequentially on a TPU core, so SMEM scratch carries the running state
between tiles — the classic streaming-scan decomposition.

Outputs are bit-identical to the XLA formulation (differentially tested
in interpret mode; the XLA path remains the fallback off-TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile geometry: (SUB, LANE) int32 tiles; SUB*LANE elements per grid step
SUB = 256
LANE = 128
TILE = SUB * LANE


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)


def _sub_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)


def _tile_scan(x, combine, unit):
    """Inclusive prefix `combine` over a (SUB, LANE) tile in row-major
    order: lane-axis log-steps, then a sublane-axis carry combine."""
    li = _lane_iota()
    sh = 1
    while sh < LANE:
        shifted = pltpu.roll(x, sh, 1)
        x = combine(x, jnp.where(li >= sh, shifted, unit))
        sh *= 2
    # row totals live in the last lane; build exclusive row carries
    totals = jnp.where(li == LANE - 1, x, unit)
    sh = 1
    si = _sub_iota()
    t = totals
    while sh < SUB:
        shifted = pltpu.roll(t, sh, 0)
        t = combine(t, jnp.where(si >= sh, shifted, unit))
        sh *= 2
    # t[r, LANE-1] = inclusive prefix of row totals; make exclusive and
    # broadcast down the row: take row r-1's inclusive value
    t_row = t[:, LANE - 1:]
    carry = pltpu.roll(t_row, 1, 0)
    carry = jnp.where(si[:, :1] >= 1, carry, unit)
    return combine(x, jnp.broadcast_to(carry, x.shape))


def _tile_cumsum(x):
    return _tile_scan(x, jnp.add, jnp.int32(0))


def _tile_scan_rev(x, combine, unit):
    """Inclusive SUFFIX combine over the tile in row-major order
    (Mosaic has no `rev`, so the backward pass scans natively)."""
    li = _lane_iota()
    sh = 1
    while sh < LANE:
        shifted = pltpu.roll(x, LANE - sh, 1)  # element l+sh into lane l
        x = combine(x, jnp.where(li <= LANE - 1 - sh, shifted, unit))
        sh *= 2
    totals = jnp.where(li == 0, x, unit)  # row suffix totals at lane 0
    si = _sub_iota()
    t = totals
    sh = 1
    while sh < SUB:
        shifted = pltpu.roll(t, SUB - sh, 0)
        t = combine(t, jnp.where(si <= SUB - 1 - sh, shifted, unit))
        sh *= 2
    t_row = t[:, :1]
    carry = pltpu.roll(t_row, SUB - 1, 0)  # row r+1's suffix into row r
    carry = jnp.where(si[:, :1] <= SUB - 2, carry, unit)
    return combine(x, jnp.broadcast_to(carry, x.shape))


def _tile_cummax_rev(x):
    return _tile_scan_rev(x, jnp.maximum, jnp.int32(_NEG_INF))


def _tile_cummax(x):
    return _tile_scan(x, jnp.maximum, jnp.int32(-2147483648))


_NEG_INF = -2147483648  # int32 min (python int: not a traced constant)


def _fwd_kernel(sk1_ref, sk2_ref, aux_ref, nv_ref, packed_ref, carry_ref):
    """carry: SMEM i32[6] = (prev_k1, prev_k2, prev_aux, ord, segA_packed,
    segB_packed); sk/aux refs are (SUB, LANE) u32 viewed as i32 bits.
    nv_ref: SMEM i32[1] = the valid-row count — a segment boundary is
    forced at row nv (and an end at nv-1) because at k == 32 the sort
    keys cannot distinguish a genuine all-T window from the
    invalid-window sentinel (see index/enumeration.py:_enum_device_impl).
    packed out: (ordinal << 2) | (counted_end << 1) | start."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = jnp.int32(0)   # unused for the first row (t==0
        carry_ref[1] = jnp.int32(0)   # forces start=True there)
        carry_ref[2] = jnp.int32(0)
        carry_ref[3] = jnp.int32(0)
        carry_ref[4] = jnp.int32(_NEG_INF)
        carry_ref[5] = jnp.int32(_NEG_INF)

    k1 = sk1_ref[:]
    k2 = sk2_ref[:]
    aux = aux_ref[:]
    li = _lane_iota()
    si = _sub_iota()
    first = (li == 0) & (si == 0)

    # previous row values in flattened order: lane-shift by one with the
    # row boundary pulling from the previous row's last lane
    def prev_of(v, carry_val):
        p = pltpu.roll(v, 1, 1)  # lane -1 (wraps)
        rowup = pltpu.roll(p, 1, 0)  # for lane 0: previous row's last
        p = jnp.where(li == 0, rowup, p)
        return jnp.where(first, carry_val, p)

    pk1 = prev_of(k1, carry_ref[0])
    pk2 = prev_of(k2, carry_ref[1])
    paux = prev_of(aux, carry_ref[2])

    # int32 flag arithmetic throughout (a scalar-conditioned bool where
    # trips Mosaic's truncation lowering)
    start = ((k1 != pk1) | (k2 != pk2)).astype(jnp.int32)
    force_first = first.astype(jnp.int32) * jnp.int32(t == 0)
    start = jnp.maximum(start, force_first)
    row0 = t * TILE + si * LANE + li
    start = jnp.maximum(start, (row0 == nv_ref[0]).astype(jnp.int32))

    a6 = aux & 63
    pa6 = paux & 63
    A = (1 - start) * (a6 != pa6).astype(jnp.int32)
    B = (((a6 >> 3) == 0) | ((a6 & 7) == 0)).astype(jnp.int32)

    ordinal = _tile_cumsum(start) + carry_ref[3]
    seg_a = jnp.maximum(_tile_cummax((ordinal << 1) | A), carry_ref[4]) & 1
    seg_b = jnp.maximum(_tile_cummax((ordinal << 1) | B), carry_ref[5]) & 1

    # end rows: the next row starts a new segment
    def next_of(v, fill):
        nx = pltpu.roll(v, LANE - 1, 1)      # lane +1 (wraps)
        rowdn = pltpu.roll(nx, SUB - 1, 0)   # next row for the last lane
        nx = jnp.where(li == LANE - 1, rowdn, nx)
        last = (li == LANE - 1) & (si == SUB - 1)
        return jnp.where(last, fill, nx)

    nk1 = next_of(k1, k1)  # self-fill: the last row is handled below
    nk2 = next_of(k2, k2)
    # For the cross-tile boundary the "next" key is unknown in this
    # streaming pass; mark the tile's last row as a provisional end and
    # let pass 2 (backward) fix it: a provisional end that is NOT a real
    # end has the same (ordinal, verdict-so-far) as its successor row,
    # and the backward cummax keyed on ordinal keeps the TRUE end row's
    # verdict (the successor's final value) — the provisional row's
    # partial verdict only wins for rows of its own segment at or before
    # it, where the true end's key ties and its value is >=.  Both A/B
    # are monotone ORs, so the max is exactly the full-segment verdict.
    is_end = ((nk1 != k1) | (nk2 != k2)
              | ((li == LANE - 1) & (si == SUB - 1))).astype(jnp.int32)
    is_end = jnp.maximum(is_end, (row0 == nv_ref[0] - 1).astype(jnp.int32))

    counted_end = is_end * (seg_b | (seg_a & (1 - start)))
    packed_ref[:] = (ordinal << 2) | (counted_end << 1) | start

    # carries for the next tile
    carry_ref[0] = k1[SUB - 1, LANE - 1]
    carry_ref[1] = k2[SUB - 1, LANE - 1]
    carry_ref[2] = aux[SUB - 1, LANE - 1]
    carry_ref[3] = ordinal[SUB - 1, LANE - 1]
    carry_ref[4] = jnp.maximum((ordinal[SUB - 1, LANE - 1] << 1)
                               | seg_a[SUB - 1, LANE - 1], carry_ref[4])
    carry_ref[5] = jnp.maximum((ordinal[SUB - 1, LANE - 1] << 1)
                               | seg_b[SUB - 1, LANE - 1], carry_ref[5])


def _bwd_kernel(packed_ref, maxord_ref, counted_ref, carry_ref):
    """Backward broadcast: counted[i] = verdict at the segment's end row.
    Runs over tiles in reverse order; within a tile the scan runs on the
    REVERSED rows (flip both axes).  carry: SMEM i32[1] = running packed
    cummax of ((maxord - ordinal) << 1 | counted_end)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = jnp.int32(_NEG_INF)

    packed = packed_ref[:]
    ordinal = packed >> 2
    counted_end = (packed >> 1) & 1
    key = ((maxord_ref[0] - ordinal) << 1) | counted_end
    scanned = jnp.maximum(_tile_cummax_rev(key), carry_ref[0])
    counted_ref[:] = scanned & 1
    carry_ref[0] = jnp.maximum(scanned[0, 0], carry_ref[0])


def _fin_kernel(packed_ref, counted_ref, order_ref, nv_ref, n_ref,
                ids_ref, poskey_ref, totals_ref, carry_ref):
    """ids = cumsum(start & counted & isval) - 1; poskey = sel ? order : n.
    carry: SMEM i32[2] = (id cumsum, sel count).  totals out: i32[2]."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = jnp.int32(0)
        carry_ref[1] = jnp.int32(0)

    packed = packed_ref[:]
    start = packed & 1
    counted = counted_ref[:]
    li = _lane_iota()
    si = _sub_iota()
    row0 = t * TILE + si * LANE + li
    isval = row0 < nv_ref[0]
    flag = start & counted & isval.astype(jnp.int32)
    ids = _tile_cumsum(flag) + carry_ref[0]
    ids_ref[:] = ids - 1
    sel = (counted == 1) & isval
    poskey_ref[:] = jnp.where(sel, order_ref[:], n_ref[0])
    carry_ref[0] = ids[SUB - 1, LANE - 1]
    carry_ref[1] = carry_ref[1] + jnp.sum(sel.astype(jnp.int32))
    totals_ref[0] = carry_ref[0]
    totals_ref[1] = carry_ref[1]


def _grid_call(kernel, n_tiles, in_arrs, in_scalars, out_shapes,
               scratch, backward=False, interpret=False):
    idx = (lambda t: ((n_tiles - 1 - t), 0)) if backward \
        else (lambda t: (t, 0))
    in_specs = [pl.BlockSpec((SUB, LANE), idx, memory_space=pltpu.VMEM)
                for _ in in_arrs]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)
                 for _ in in_scalars]
    out_specs = []
    out_shape = []
    for kind, shape, dtype in out_shapes:
        if kind == "tile":
            out_specs.append(pl.BlockSpec((SUB, LANE), idx,
                                          memory_space=pltpu.VMEM))
        else:
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct(shape, dtype))
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[pltpu.SMEM(s, jnp.int32) for s in scratch],
        interpret=interpret,
    )(*in_arrs, *in_scalars)


@functools.partial(jax.jit, static_argnums=(4,))
def enum_segment_scan(sk1, sk2, saux, order, interpret, nv, n):
    """The full post-sort pipeline; inputs are the sorted columns.
    Returns (ids[n] i32, poskey[n] i32, n_groups, n_sel).  `n` must be a
    multiple of SUB*LANE (the caller's _PAD_BUCKET guarantees it)."""
    total = sk1.shape[0]
    n_tiles = total // TILE
    shape2 = (n_tiles * SUB, LANE)
    a1 = jax.lax.bitcast_convert_type(sk1, jnp.int32).reshape(shape2)
    a2 = jax.lax.bitcast_convert_type(sk2, jnp.int32).reshape(shape2)
    aa = jax.lax.bitcast_convert_type(saux, jnp.int32).reshape(shape2)
    packed = _grid_call(_fwd_kernel, n_tiles, [a1, a2, aa],
                        [nv.reshape(1).astype(jnp.int32)],
                        [("tile", shape2, jnp.int32)], [(6,)],
                        interpret=interpret)
    maxord = packed.reshape(-1)[total - 1] >> 2
    counted = _grid_call(_bwd_kernel, n_tiles, [packed],
                         [maxord.reshape(1)],
                         [("tile", shape2, jnp.int32)], [(1,)],
                         backward=True, interpret=interpret)
    ids, poskey, totals = _grid_call(
        _fin_kernel, n_tiles,
        [packed, counted, order.reshape(shape2)],
        [nv.reshape(1), jnp.full((1,), n, jnp.int32)],
        [("tile", shape2, jnp.int32), ("tile", shape2, jnp.int32),
         ("smem", (2,), jnp.int32)],
        [(2,)], interpret=interpret)
    return (ids.reshape(-1), poskey.reshape(-1), totals[0], totals[1])
