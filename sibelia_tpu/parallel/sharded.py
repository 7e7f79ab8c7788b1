"""Multi-chip sharded k-mer index building blocks.

The reference is single-threaded; scale there means external-memory suffix
arrays (reference: src/vertexenumeration.cpp:99-157). On TPU the scale
axes are a device mesh:

  * 'seq'  — sequence sharding: the supergenome is cut into fixed-size
    windows with a (k-1)-element halo so no k-mer is lost at shard
    boundaries; halos move over ICI via ppermute (the synteny analogue of
    ring/sequence parallelism).
  * hash-range exchange — each k-mer key is assigned a bucket by hash
    range; per-shard bucket histograms/payloads are exchanged with
    all_to_all so each device owns a key range (the analogue of tensor
    parallelism for the index table), and coverage/occupancy statistics
    reduce with psum.

This module provides the jittable sharded pipeline step used by the
multi-chip dry run and the scaling bench.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _rolling_keys(shard: jax.Array, halo: jax.Array, k: int) -> jax.Array:
    """Polynomial rolling hash (base 57, mod 2^32 via uint32 wraparound) of
    every k-mer starting in this shard; the halo supplies the k-1 chars
    that spill into the next shard. Mirrors the reference's legacy rolling
    hash (reference: src/hashing.h:54,100) which returns as the device-side
    keying function."""
    ext = jnp.concatenate([shard, halo], axis=0)
    n = shard.shape[0]
    base = jnp.uint32(57)

    def body(carry, i):
        return carry, ext[i]

    # horner evaluation per position via cumulative powers: hash(i) =
    # sum_{j<k} ext[i+j] * 57^(k-1-j). Compute with a scan over j.
    powers = jnp.power(base, jnp.arange(k - 1, -1, -1, dtype=jnp.uint32))
    acc = jnp.zeros((n,), dtype=jnp.uint32)
    for j in range(k):
        acc = acc + ext[j:j + n].astype(jnp.uint32) * powers[j]
    return acc


def sharded_kmer_histogram(k: int, n_buckets_per_dev: int, mesh: Mesh):
    """Build a jitted sharded step: codes [n_dev, shard_len] ->
    (per-device key-range histogram [n_dev, n_buckets_per_dev],
     total distinct-ish count scalar).

    Pipeline inside shard_map:
      1. ppermute halo exchange (next shard's first k-1 chars)
      2. local rolling-hash keys
      3. per-shard histogram over all devices' bucket ranges
      4. all_to_all: each device receives its own bucket range from all
         shards and sums them (index-table ownership by hash range)
      5. psum for global k-mer count (coverage-style reduction)
    """
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    def step(codes):
        # 1. halo: receive first (k-1) elements of the *next* shard
        first = jax.lax.dynamic_slice(codes[0], (0,), (k - 1,))
        halo = jax.lax.ppermute(
            first, axis,
            [(i, (i - 1) % n_dev) for i in range(n_dev)])
        # 2. local keys
        keys = _rolling_keys(codes[0], halo, k)
        # 3. histogram over n_dev * n_buckets_per_dev global buckets
        total_buckets = n_dev * n_buckets_per_dev
        bucket = (keys % jnp.uint32(total_buckets)).astype(jnp.int32)
        hist = jnp.zeros((total_buckets,), jnp.int32).at[bucket].add(1)
        # 4. all_to_all: split by owner device, exchange
        hist2 = hist.reshape(n_dev, n_buckets_per_dev)
        mine = jax.lax.all_to_all(hist2[None], axis, split_axis=1,
                                  concat_axis=0, tiled=False)
        # mine: [n_dev, 1, n_buckets_per_dev] — rows from every shard
        owned = jnp.sum(mine, axis=(0,))
        # 5. global count of k-mers via psum
        total = jax.lax.psum(jnp.sum(hist), axis)
        return owned, total

    from jax.experimental.shard_map import shard_map
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P()),
        check_rep=False)

    @jax.jit
    def run(codes_sharded):
        return sharded(codes_sharded)

    return run


def dryrun(n_devices: int, k: int = 8, shard_len: int = 256,
           n_buckets_per_dev: int = 16):
    """One full sharded step on tiny shapes; used by the driver's
    multi-chip compile check."""
    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(0)
    codes = rng.integers(1, 5, size=(n_devices, 1, shard_len)).astype(np.int32)
    codes = codes.reshape(n_devices, shard_len)
    sharding = NamedSharding(mesh, P("seq", None))
    codes = jax.device_put(codes, sharding)
    fn = sharded_kmer_histogram(k, n_buckets_per_dev, mesh)
    owned, total = fn(codes)
    owned.block_until_ready()
    assert int(total) == n_devices * shard_len
    return owned, total
