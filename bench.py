#!/usr/bin/env python
"""Benchmark: device k-mer ranking throughput (the framework's hot loop).

Prints one JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is k-mers/second through the full fused rank+flags step (the
operation that replaces the reference's divsufsort+LCP scan, its dominant
cost).  Ten kernel iterations run inside one jitted lax.fori_loop so a
single dispatch amortizes host-device round trips; the input is perturbed
data-dependently between iterations so XLA cannot collapse them.
vs_baseline compares against a 10 Mchar/s divsufsort estimate (typical
single-core suffix-array construction rate on the reference's era of
hardware).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the dev harness reaches the TPU through
    # a tunnel where each fresh compile costs minutes; caching makes repeat
    # bench runs (and the driver's end-of-round run) start hot.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from __graft_entry__ import entry

    n = 1 << 22  # 4M codes
    reps = 10
    fn, _ = entry()
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(1, 5, size=n, dtype=np.uint8))

    @jax.jit
    def loop_step(codes):
        def body(_, carry):
            codes, acc = carry
            out = fn(codes)
            s = sum(jnp.sum(o.astype(jnp.int32)) for o in out)
            codes = jnp.where(
                codes == 0, codes,
                ((codes + (s & 1)) % 4 + 1).astype(jnp.uint8))
            return codes, acc + s
        return jax.lax.fori_loop(0, reps, body, (codes, jnp.int32(0)))[1]

    acc = int(loop_step(codes))  # compile + warmup
    best = None
    for _ in range(3):
        t0 = time.time()
        acc += int(loop_step(codes))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    kmers_per_sec = reps * n / best

    baseline = 1.0e7  # divsufsort-style CPU chars/s estimate
    print(json.dumps({
        "metric": "kmer_rank_throughput",
        "value": round(kmers_per_sec / 1e6, 1),
        "unit": "Mkmers/s",
        "vs_baseline": round(kmers_per_sec / baseline, 1),
    }))
    return 0 if acc is not None else 1


if __name__ == "__main__":
    sys.exit(main())
