#!/usr/bin/env python
"""Benchmark: device enumeration throughput + measured baselines.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: k-mers/second through the FULL fused device enumeration
(packed-key sort + bifurcation group scan + instance selection — the
step that replaces the reference's divsufsort+LCP scan; see
sibelia_tpu/index/enumeration.py::_enum_device_k32).  Iterations chain
data-dependently with a forced scalar sync per step, so nothing can be
elided or overlapped.

vs_baseline is MEASURED, not estimated: the native host enumeration
kernel (sibelia_tpu/native/ranking.cpp — our C++ radix/prefix-doubling
engine, itself faster than the reference's divsufsort path) timed on the
same input on this machine.

extra carries: the host-baseline rate, a virtual-mesh scaling table for
the sharded production enumeration (parallel/sharded_enum.py) at 1/2/4/8
devices (subprocess on the CPU backend — shape of scaling, not absolute
chip rates), and H. pylori end-to-end wall-clock for our CLI vs the
rebuilt reference binary when `.ref_build/Sibelia` exists.
"""
import json
import os
import subprocess
import sys
import time

_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _DIR)

import numpy as np


def _device_enum_rate():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(_DIR, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from sibelia_tpu.index.enumeration import _enum_device_impl

    k = 30
    n = 1 << 22
    reps = 8
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(1, 5, size=n, dtype=np.uint8))

    # `reps` full enumerations chained DATA-DEPENDENTLY inside one jit
    # (each iteration's result perturbs the next iteration's input, and
    # the final scalar is a function of every iteration), so XLA can
    # neither elide nor overlap them; one host sync per call.  Sustained
    # throughput = reps * n / wall.
    @jax.jit
    def step(codes):
        s_acc = jnp.int32(0)
        for _ in range(reps):
            pos, ids, n_sel, n_groups = _enum_device_impl(codes, k)
            s = n_sel + n_groups + pos[0] + jnp.int32(ids[0])
            s_acc = s_acc + s
            codes = jnp.where(
                codes == 0, codes,
                ((codes + (s & 1)) % 4 + 1).astype(jnp.uint8))
        return codes, s_acc

    _, s = step(codes)  # compile + warmup
    acc = int(s)        # forced device sync
    best = None
    for _ in range(4):
        t0 = time.time()
        _, s = step(codes)
        acc += int(s)       # sync: the scalar only exists when every
        dt = time.time() - t0  # chained enumeration has run
        best = dt if best is None else min(best, dt)
    return reps * n / best, acc


def _host_enum_rate():
    """Measured CPU baseline: the native host enumeration on the same
    input size (falls back to numpy ranking when g++ is unavailable)."""
    from sibelia_tpu.index.enumeration import build_supergenome
    import sibelia_tpu.native as nat

    rng = np.random.default_rng(0)
    half = (1 << 21) - 2
    chrom = bytes(rng.choice(list(b"ACGT"), size=half).astype(np.uint8))
    codes, bs = build_supergenome([chrom])
    n = codes.shape[0]
    best = None
    for _ in range(3):
        t0 = time.time()
        res = nat.enumerate_native(codes, bs, 1, 30)
        dt = time.time() - t0
        if res is None:
            return None
        best = dt if best is None else min(best, dt)
    return n / best


def _scaling_table():
    """Sharded-enumeration throughput at 1/2/4/8 virtual devices
    (subprocess: the CPU backend must own the process)."""
    script = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
from sibelia_tpu.parallel.sharded import make_mesh
from sibelia_tpu.parallel.sharded_enum import enumerate_bifurcations_sharded
rng = np.random.default_rng(0)
base = rng.choice(list(b"ACGT"), size=1 << 20).astype(np.uint8)
mut = base.copy()
pos = rng.integers(0, len(mut), size=2000)
mut[pos] = rng.choice(list(b"ACGT"), size=2000)
chroms = [bytes(base), bytes(mut)]
n_kmers = 2 * sum(len(c) for c in chroms)
out = {}
for nd in (1, 2, 4, 8):
    mesh = make_mesh(nd)
    enumerate_bifurcations_sharded(chroms, 30, mesh)  # compile
    best = None
    for _ in range(2):
        t0 = time.time()
        enumerate_bifurcations_sharded(chroms, 30, mesh)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[str(nd)] = round(n_kmers / best / 1e6, 1)
print(json.dumps(out))
""" % (_DIR,)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
    try:
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=900)
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def _e2e_hpylori():
    """Wall-clock ours vs the rebuilt reference binary (when present)."""
    fasta = ("/root/reference/examples/Sibelia/Helicobacter_pylori/"
             "Helicobacter_pylori.fasta")
    ref_bin = os.path.join(_DIR, ".ref_build", "Sibelia")
    if not (os.path.exists(fasta) and os.path.exists(ref_bin)):
        return None
    out = {}
    # The e2e pipeline runs the host path; a tunneled-accelerator backend
    # would pay ~10 s of one-time init inside the timed region without
    # contributing to the run.  Pin the subprocess to the CPU backend and
    # strip the tunnel env, as _scaling_table does.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        args = [sys.executable, "-m", "sibelia_tpu.cli.sibelia",
                "-s", "loose", "-m", "5000", "-o", "/tmp/bench_hp", fasta]
        subprocess.run(args, cwd=_DIR, env=env, capture_output=True,
                       timeout=600, check=True)  # warm caches / .so build
        t0 = time.time()
        subprocess.run(args, cwd=_DIR, env=env, capture_output=True,
                       timeout=600, check=True)
        out["ours_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        subprocess.run([ref_bin, "-s", "loose", "-m", "5000", "-o",
                        "/tmp/bench_hp_ref", fasta], capture_output=True,
                       timeout=600, check=True)
        out["reference_s"] = round(time.time() - t0, 1)
        out["speedup"] = round(out["reference_s"] / out["ours_s"], 2)
    except Exception:
        return out or None
    return out


def main():
    dev_rate, acc = _device_enum_rate()
    host_rate = _host_enum_rate()
    extra = {}
    if host_rate:
        extra["host_baseline_Mkmers_s"] = round(host_rate / 1e6, 1)
    scaling = _scaling_table()
    if scaling:
        extra["sharded_virtual_mesh_on_2core_host_Mkmers_s"] = scaling
    e2e = _e2e_hpylori()
    if e2e:
        extra["e2e_hpylori"] = e2e
    vs = round(dev_rate / host_rate, 1) if host_rate else None
    print(json.dumps({
        "metric": "fused_enumeration_throughput",
        "value": round(dev_rate / 1e6, 1),
        "unit": "Mkmers/s",
        "vs_baseline": vs,
        "extra": extra,
    }))
    return 0 if acc is not None else 1


if __name__ == "__main__":
    sys.exit(main())
