"""Pallas TPU kernel for the batched Gotoh DP.

Same recurrence as kernels/gotoh.py's vmap path, tiled for the TPU: each
grid step owns 8 problems (the 8x128 VPU tile), keeping all row state
[8, T+1] in VMEM/registers; the in-row gap recurrence is a log-step
running maximum built from shifted maxima. Outputs the same direction
bits; the host traceback is shared with kernels/gotoh.py. On CPU (tests)
the kernel runs in interpreter mode.

This is the device path replacing the reference's LAGAN `order` DP
(reference: src/lagan/order.c) for batched gap subproblems.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..variants.aligner import GAP_EXTEND, GAP_OPEN
from .gotoh import NEG, _sub_matrix

_P = 8  # problems per grid step


def _cummax_shift(x: jax.Array) -> jax.Array:
    """Inclusive running maximum along the last axis via log-step shifts."""
    n = x.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.full(x.shape[:-1] + (s,), NEG, x.dtype), x[..., :-s]], axis=-1)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _kernel(T, sub_rows_ref, m_choice_ref, ix_open_ref,
            iy_open_ref, cell_state_ref):
    jcol = jax.lax.broadcasted_iota(jnp.int32, (_P, T + 1), 1)
    M0 = jnp.where(jcol == 0, 0, NEG).astype(jnp.int32)
    Ix0 = jnp.full((_P, T + 1), NEG, jnp.int32)
    Iy0 = jnp.where(jcol == 0, NEG,
                    GAP_OPEN + GAP_EXTEND * jcol).astype(jnp.int32)
    ge_j = GAP_EXTEND * jcol
    neg_col = jnp.full((_P, 1), NEG, jnp.int32)

    assert T % 8 == 0

    def one_row(srow, carry):
        """One DP row; returns (new carry, per-cell bit rows)."""
        Mp, Ixp, Iyp = carry
        best_prev = jnp.maximum(jnp.maximum(Mp, Ixp), Iyp)
        M = jnp.concatenate([neg_col, best_prev[:, :-1] + srow], axis=1)
        m_choice = jnp.where(
            Mp[:, :-1] >= jnp.maximum(Ixp[:, :-1], Iyp[:, :-1]), 0,
            jnp.where(Ixp[:, :-1] >= Iyp[:, :-1], 1, 2)).astype(jnp.int8)
        ix_open_score = Mp + GAP_OPEN + GAP_EXTEND
        ix_ext_score = Ixp + GAP_EXTEND
        Ix = jnp.maximum(ix_open_score, ix_ext_score)
        ix_open = (ix_open_score >= ix_ext_score).astype(jnp.int8)
        f = M - ge_j
        cm = _cummax_shift(f)
        excl = jnp.concatenate([neg_col, cm[:, :-1]], axis=1)
        Iy = ge_j + GAP_OPEN + excl
        Iy = jnp.where(jcol == 0, NEG, Iy).astype(jnp.int32)
        iy_open = jnp.concatenate([
            jnp.zeros((_P, 1), jnp.int8),
            ((M[:, :-1] + GAP_OPEN + GAP_EXTEND)
             >= (Iy[:, :-1] + GAP_EXTEND)).astype(jnp.int8)], axis=1)
        cell_state = jnp.where(
            M >= jnp.maximum(Ix, Iy), 0,
            jnp.where(Ix >= Iy, 1, 2)).astype(jnp.int8)
        return (M, Ix, Iy), (m_choice, ix_open[:, 1:], iy_open[:, 1:],
                             cell_state[:, 1:])

    def row_block(blk, carry):
        # 8 rows per step: aligned block reads/writes (Mosaic tile rule),
        # statically unrolled rows inside
        base = pl.multiple_of(blk * 8, 8)
        sblock = sub_rows_ref[:, pl.ds(base, 8), :]  # [P, 8, T]
        outs = []
        for r in range(8):
            carry, bits = one_row(sblock[:, r, :], carry)
            outs.append(bits)
        m_choice_ref[:, pl.ds(base, 8), :] = jnp.stack(
            [o[0] for o in outs], axis=1)
        ix_open_ref[:, pl.ds(base, 8), :] = jnp.stack(
            [o[1] for o in outs], axis=1)
        iy_open_ref[:, pl.ds(base, 8), :] = jnp.stack(
            [o[2] for o in outs], axis=1)
        cell_state_ref[:, pl.ds(base, 8), :] = jnp.stack(
            [o[3] for o in outs], axis=1)
        return carry

    jax.lax.fori_loop(0, T // 8, row_block, (M0, Ix0, Iy0))


@functools.partial(jax.jit, static_argnums=(2, 3))
def batched_gotoh_dirs_pallas(a_codes: jax.Array, b_codes: jax.Array,
                              T: int, interpret: bool = False):
    B = a_codes.shape[0]
    assert B % _P == 0
    sub = jnp.asarray(_sub_matrix())
    # score precompute outside the kernel (Mosaic has no general gather)
    sub_rows = sub[a_codes.astype(jnp.int32)[:, :, None],
                   b_codes.astype(jnp.int32)[:, None, :]]
    kernel = functools.partial(_kernel, T)
    out_shape = [
        jax.ShapeDtypeStruct((B, T, T), jnp.int8),
        jax.ShapeDtypeStruct((B, T, T), jnp.int8),
        jax.ShapeDtypeStruct((B, T, T), jnp.int8),
        jax.ShapeDtypeStruct((B, T, T), jnp.int8),
    ]
    grid = (B // _P,)
    in_specs = [
        pl.BlockSpec((_P, T, T), lambda i: (i, 0, 0)),
    ]
    out_specs = [pl.BlockSpec((_P, T, T), lambda i: (i, 0, 0))] * 4
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(sub_rows)


def batch_align_pallas(pairs, T: int = 128, interpret: bool | None = None):
    """Pallas-path twin of kernels.gotoh.batch_align."""
    from .gotoh import traceback_from_dirs
    if not pairs:
        return []
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = len(pairs)
    Bp = -(-B // _P) * _P
    a_arr = np.zeros((Bp, T), dtype=np.uint8)
    b_arr = np.zeros((Bp, T), dtype=np.uint8)
    for x, (a, b) in enumerate(pairs):
        a_arr[x, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        b_arr[x, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    m_choice, ix_open, iy_open, cell_state = batched_gotoh_dirs_pallas(
        jnp.asarray(a_arr), jnp.asarray(b_arr), T, interpret)
    m_choice = np.asarray(m_choice)
    ix_open = np.asarray(ix_open)
    iy_open = np.asarray(iy_open)
    cell_state = np.asarray(cell_state)
    return [traceback_from_dirs(a, b, m_choice[x], ix_open[x], iy_open[x],
                                cell_state[x])
            for x, (a, b) in enumerate(pairs)]
