"""Mesh-sharded bulge-candidate prefilter (parallel/sharded_sweep.py):
superset of the single-device kernel, topology-invariant, and the
superset keeps the pipeline byte-exact (the sparse-driver invariant is
exercised end-to-end by tests/test_wave_device.py; here we check the
bitmap properties directly)."""
import os

import numpy as np
import pytest

import jax

from sibelia_tpu.index.enum_device import _candidate_scan
from sibelia_tpu.index.enumeration import (build_supergenome,
                                           enumerate_bifurcations)
from sibelia_tpu.parallel.sharded import make_mesh
from sibelia_tpu.parallel.sharded_sweep import sharded_candidate_scan


def _instance_table(chroms, k):
    enum = enumerate_bifurcations(chroms, k)
    codes, bs = build_supergenome(chroms)
    sg_all, id_all = [], []
    for s in (0, 1):
        half = 0 if s == 0 else len(chroms)
        sg_all.append(bs[half + enum.chr[s]] + enum.pos[s])
        id_all.append(enum.bif_id[s])
    sg = np.concatenate(sg_all)
    ids = np.concatenate(id_all)
    order = np.argsort(sg, kind="stable")
    m = len(sg)
    bucket = max(8, 1 << (m - 1).bit_length())
    pos_p = np.full(bucket, len(codes), dtype=np.int32)
    ids_p = np.full(bucket, bucket, dtype=np.int32)
    pos_p[:m] = sg[order]
    ids_p[:m] = ids[order]
    pad = -(-len(codes) // 1024) * 1024
    codes_p = np.zeros(pad, dtype=np.uint8)
    codes_p[:len(codes)] = codes
    return codes_p, pos_p, ids_p, m, enum.count


def _genomes(seed, n, size, snps):
    rng = np.random.default_rng(seed)
    base = rng.choice(list(b"ACGT"), size=size).astype(np.uint8)
    out = []
    for _ in range(n):
        mut = base.copy()
        pos = rng.integers(0, len(mut), size=snps)
        mut[pos] = rng.choice(list(b"ACGT"), size=snps)
        out.append(bytes(mut))
    return out


@pytest.mark.parametrize("k,d", [(9, 40), (11, 90)])
def test_superset_and_topology_invariance(k, d):
    chroms = _genomes(17, 3, 6000, 60)
    codes, pos, ids, m, count = _instance_table(chroms, k)
    exact = np.asarray(_candidate_scan(codes, pos, ids, k, d,
                                       np.int32(m)))[:count]
    results = []
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        got = np.asarray(sharded_candidate_scan(
            codes, pos, ids, k, d, m, mesh))[:count]
        results.append(got)
    for got in results[1:]:
        assert np.array_equal(got, results[0])
    # superset of the exact single-device rule
    assert np.all(results[0][exact]), "sharded prefilter dropped a " \
                                      "candidate the exact kernel keeps"
    # and not trivially all-true: it must still prune
    assert results[0].sum() < count or exact.sum() == count


def test_relaxation_is_bounded():
    """The mesh rule's relaxation (per-vertex factoring) should stay in
    the same ballpark as the exact pair rule on divergent strains."""
    chroms = _genomes(23, 4, 8000, 120)
    k, d = 9, 60
    codes, pos, ids, m, count = _instance_table(chroms, k)
    exact = np.asarray(_candidate_scan(codes, pos, ids, k, d,
                                       np.int32(m)))[:count]
    mesh = make_mesh(4)
    got = np.asarray(sharded_candidate_scan(
        codes, pos, ids, k, d, m, mesh))[:count]
    assert np.all(got[exact])
    # inflation bound: the relaxed set stays within 3x the exact set
    # (empirically ~1.1-1.5x; the bound guards algorithmic regressions)
    assert got.sum() <= max(8, 3 * max(1, exact.sum()))
