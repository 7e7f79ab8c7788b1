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
