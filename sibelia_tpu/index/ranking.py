"""Device-side lexicographic ranking of k-mers (the hot kernel).

This replaces the reference's suffix array + LCP construction
(reference: src/vertexenumeration.cpp:103,292 divsufsort; :44-65 Kasai)
with an XLA-native prefix-doubling rank computation:

  r_1(i)  = code(s[i])
  r_2L(i) = dense_rank( (r_L(i), r_L(i+L)) )         # via one device sort
  r_k(i)  = dense_rank( (r_h(i), r_h(i + k - h)) )   # final overlapping step

After O(log k) rounds, r_k(i) is the dense lexicographic rank of the
length-k substring starting at i. Equal ranks == identical k-mers, and rank
order == suffix-array group order, which the reference uses to assign
bifurcation ids — so ids derived from these ranks match the reference's.

Early termination: once all ranks are distinct the order is final (two
suffixes that differ within length L keep their relative order at any
longer length), so we stop; the host drives the doubling loop and checks
the max-rank scalar between rounds.

All sorts are `jax.lax.sort` (stable, multi-key) — XLA maps these onto the
TPU efficiently, and the arrays are int32 so they stream well from HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Character codes: order must match ASCII order of '#','A','C','G','T'
# so that rank order == the reference's suffix array order.
SEP_CODE = 0
CODE_OF = {"#": 0, "A": 1, "C": 2, "G": 3, "T": 4}

_PAD_BUCKET = 1 << 16  # pad n to a multiple of this to bound recompiles


def encode(s: bytes | str) -> np.ndarray:
    """Encode '#ACGT' text to uint8 codes 0..4."""
    if isinstance(s, str):
        s = s.encode()
    arr = np.frombuffer(s, dtype=np.uint8)
    lut = np.zeros(256, dtype=np.uint8)
    for ch, code in CODE_OF.items():
        lut[ord(ch)] = code
    return lut[arr]


@functools.partial(jax.jit, static_argnums=(1,))
def _rank_round(r_ext: jax.Array, n: int, off: jax.Array):
    """One prefix-doubling round. r_ext has n real ranks + sentinel tail."""
    k1 = r_ext[:n]
    k2 = jax.lax.dynamic_slice(r_ext, (off,), (n,))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    sk1, sk2, sidx = jax.lax.sort((k1, k2, idx), num_keys=2, is_stable=True)
    flag = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        ((sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])).astype(jnp.int32),
    ])
    nr_sorted = jnp.cumsum(flag)
    max_rank = nr_sorted[-1]
    r_new = jnp.zeros((n,), jnp.int32).at[sidx].set(nr_sorted)
    r_ext_new = jax.lax.dynamic_update_slice(r_ext, r_new, (0,))
    return r_ext_new, sidx, max_rank


def _sentinel_tail(n: int, pad: int) -> np.ndarray:
    """Distinct negative sentinel ranks for out-of-range accesses."""
    return -(np.arange(pad, dtype=np.int32) + 2)


def kmer_ranks_numpy(codes: np.ndarray, k: int):
    """Pure-numpy twin of kmer_ranks for small inputs (e.g. the per-group
    mini-indexes built during block trimming) where device dispatch and
    compile caching would dominate."""
    n = int(codes.shape[0])
    pad = k + 1
    r = np.concatenate([codes.astype(np.int64), -(np.arange(pad) + 2)])
    order = np.argsort(r[:n], kind="stable").astype(np.int64)
    if k == 1:
        sr = r[:n][order]
        flag = np.concatenate([[0], (sr[1:] != sr[:-1]).astype(np.int64)])
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.cumsum(flag)
        return rank, order
    length = 1
    while length < k:
        off = min(length, k - length)
        k1 = r[:n]
        k2 = r[off:off + n]
        order = np.lexsort((k2, k1)).astype(np.int64)
        sk1, sk2 = k1[order], k2[order]
        flag = np.concatenate(
            [[0], ((sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])).astype(np.int64)])
        ranks_sorted = np.cumsum(flag)
        r_new = np.empty(n, dtype=np.int64)
        r_new[order] = ranks_sorted
        r[:n] = r_new
        length += off
        if ranks_sorted[-1] == n - 1:
            break
    return r[:n].copy(), order


_NUMPY_THRESHOLD = 1 << 16


def kmer_ranks(codes: np.ndarray, k: int):
    """Return (rank, order): rank[i] = dense lex rank of s[i:i+k] (int32),
    order = positions sorted by rank (stable). Positions whose k-mer would
    run past the end of `codes` get ranks based on unique sentinels (they
    never equal any other position's rank unless truly identical).
    """
    n = int(codes.shape[0])
    if n < _NUMPY_THRESHOLD:
        return kmer_ranks_numpy(codes, k)
    assert k >= 1
    pad = k + 1
    r_ext = np.concatenate([codes.astype(np.int32), _sentinel_tail(n, pad)])
    r_ext = jnp.asarray(r_ext)

    if k == 1:
        idx = jnp.arange(n, dtype=jnp.int32)
        r, order, _ = _rank_round(r_ext, n, jnp.int32(0))
        return np.asarray(r[:n]), np.asarray(order)

    length = 1
    order = None
    while length < k:
        off = min(length, k - length)
        r_ext, order, max_rank = _rank_round(r_ext, n, jnp.int32(off))
        length += off
        if length >= k:
            break
        if int(max_rank) == n - 1:
            break  # all distinct; order is final
    return np.asarray(r_ext[:n]), np.asarray(order)
