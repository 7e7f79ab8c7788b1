"""Differential test: the Pallas post-sort segment pipeline
(kernels/enum_scan.py, interpret mode) vs the XLA formulation it
replaces on TPU backends (index/enumeration.py::_enum_device_impl)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sibelia_tpu.kernels.enum_scan import TILE, enum_segment_scan


def _xla_reference(sk1, sk2, saux, order, nv, n):
    iota = jnp.arange(n, dtype=jnp.int32)
    isval = iota < nv
    start = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])])
    # segment boundary forced at the first invalid row (k == 32 all-T vs
    # sentinel disambiguation; mirrors _enum_device_impl)
    start = start | (iota == nv)
    prev_aux = jnp.concatenate([saux[:1], saux[:-1]])
    A = ((~start) & (prev_aux != saux)).astype(jnp.int32)
    B = (((saux >> 3) == 0) | ((saux & 7) == 0)).astype(jnp.int32)
    ordinal = jnp.cumsum(start.astype(jnp.int32))
    seg_a = jax.lax.cummax((ordinal << 1) | A) & 1
    seg_b = jax.lax.cummax((ordinal << 1) | B) & 1
    is_end = jnp.concatenate([start[1:], jnp.ones((1,), jnp.bool_)])
    counted_end = jnp.where(
        is_end, seg_b | (seg_a & (~start).astype(jnp.int32)), 0)
    max_ord = ordinal[n - 1]
    fkey = ((max_ord - jnp.flip(ordinal)) << 1) | jnp.flip(counted_end)
    counted = (jnp.flip(jax.lax.cummax(fkey)) & 1).astype(jnp.bool_)
    id_cums = jnp.cumsum((start & counted & isval).astype(jnp.int32))
    ids = id_cums - 1
    sel = counted & isval
    poskey = jnp.where(sel, order, jnp.int32(n))
    return ids, poskey, id_cums[-1], jnp.sum(sel.astype(jnp.int32))


def _segments(rng, n, max_len):
    k1 = np.zeros(n, np.uint32)
    k2 = np.zeros(n, np.uint32)
    i = v = 0
    while i < n:
        length = int(rng.integers(1, max_len + 1))
        k1[i:i + length] = v // 5
        k2[i:i + length] = v
        i += length
        v += 1
    return k1, k2


@pytest.mark.parametrize("seed,max_len,tiles", [(0, 8, 2), (1, 1, 2),
                                                (2, 300, 3)])
def test_pallas_scan_matches_xla(seed, max_len, tiles):
    rng = np.random.default_rng(seed)
    n = tiles * TILE
    k1, k2 = _segments(rng, n, max_len)
    aux = rng.integers(0, 64, size=n).astype(np.uint32)
    order = rng.permutation(n).astype(np.int32)
    nv = np.int32(n - int(rng.integers(0, n // 3)))

    r_ids, r_poskey, r_ng, r_ns = _xla_reference(
        jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(aux),
        jnp.asarray(order), nv, n)
    ids, poskey, ng, ns = enum_segment_scan(
        jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(aux),
        jnp.asarray(order), True, jnp.asarray(nv), n)
    assert int(ng) == int(r_ng)
    assert int(ns) == int(r_ns)
    assert jnp.array_equal(ids, r_ids)
    assert jnp.array_equal(poskey, r_poskey)
