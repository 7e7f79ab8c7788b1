import jax
import numpy as np
import pytest

from sibelia_tpu.parallel.sharded import dryrun, make_mesh, sharded_kmer_histogram


def test_dryrun_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    owned, total = dryrun(8)
    assert int(total) == 8 * 256
    assert owned.shape == (8, 16)
    assert int(np.sum(np.asarray(owned))) == 8 * 256


def test_dryrun_2_devices():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    owned, total = dryrun(2, k=4, shard_len=64, n_buckets_per_dev=4)
    assert int(total) == 2 * 64


def test_sharded_kmer_ranks_agree_with_host():
    """Global dense ranks from the 8-device hash-range pipeline must induce
    the same grouping and lexicographic order as the single-host kernel."""
    import collections
    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sibelia_tpu.parallel.sharded import make_mesh, sharded_kmer_ranks
    from sibelia_tpu.index.ranking import kmer_ranks_numpy

    n_dev, shard_len, k = 8, 2048, 16
    rng = np.random.default_rng(7)
    codes = rng.integers(1, 5, size=(n_dev * shard_len,)).astype(np.uint8)
    codes[rng.integers(0, len(codes), 4)] = 0
    codes[0] = 0
    codes[-1] = 0  # supergenome framing
    mesh = make_mesh(n_dev)
    fn = sharded_kmer_ranks(k, shard_len, mesh, capacity=shard_len)
    sharded_codes = jax.device_put(
        codes.reshape(n_dev, shard_len), NamedSharding(mesh, P("seq", None)))
    keys, pos, rank, overflow, total = fn(sharded_codes)
    pos, rank = np.asarray(pos), np.asarray(rank)
    assert int(overflow) == 0

    r_np, _ = kmer_ranks_numpy(codes, k)
    n = len(codes)
    dev_rank = np.full(n, -2, np.int64)
    for d in range(n_dev):
        m = pos[d] >= 0
        dev_rank[pos[d][m]] = rank[d][m]
    assert (dev_rank >= 0).all()
    pairs = collections.defaultdict(set)
    for p_i in range(n):
        pairs[int(r_np[p_i])].add(int(dev_rank[p_i]))
    assert all(len(v) == 1 for v in pairs.values())
    inv = collections.defaultdict(set)
    for a, bs in pairs.items():
        inv[next(iter(bs))].add(a)
    assert all(len(v) == 1 for v in inv.values())
    vals = sorted(pairs.items())
    assert all(next(iter(vals[i][1])) < next(iter(vals[i + 1][1]))
               for i in range(len(vals) - 1))
