#!/usr/bin/env python3
"""Vectorized (numpy) synthetic strain-set generator for large scale
benchmarks — same mutation mix as gen_strains.py (SNPs 0.5-0.75%, small
indels, inversions, translocations) but array-based so a ~1 GB set
generates in minutes, not hours.

Usage: gen_big.py OUT.fasta [n_strains] [genome_size]
"""
import sys

import numpy as np

ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = np.arange(256, dtype=np.uint8)
for a, b in zip(b"ACGT", b"TGCA"):
    COMP[a] = b


def make_strain(base: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    s = base.copy()
    snp_rate = rng.uniform(0.005, 0.0075)
    n_snp = int(len(s) * snp_rate)
    pos = rng.integers(0, len(s), size=n_snp)
    s[pos] = ACGT[rng.integers(0, 4, size=n_snp)]
    # indels: split at cut points, drop/insert small chunks
    parts = []
    cuts = np.sort(rng.integers(0, len(s), size=int(rng.integers(20, 60))))
    prev = 0
    for c in cuts:
        parts.append(s[prev:c])
        ln = int(rng.integers(1, 31))
        if rng.random() < 0.5:
            prev = min(len(s), c + ln)  # deletion
        else:
            parts.append(ACGT[rng.integers(0, 4, size=ln)])  # insertion
            prev = c
    parts.append(s[prev:])
    s = np.concatenate(parts)
    # inversions
    for _ in range(int(rng.integers(1, 5))):
        a = int(rng.integers(0, len(s) - 50000))
        b = a + int(rng.integers(10000, 50000))
        s[a:b] = COMP[s[a:b]][::-1]
    # translocation
    if rng.random() < 0.7:
        a = int(rng.integers(0, len(s) - 80000))
        b = a + int(rng.integers(20000, 60000))
        chunk = s[a:b].copy()
        rest = np.concatenate([s[:a], s[b:]])
        at = int(rng.integers(0, len(rest)))
        s = np.concatenate([rest[:at], chunk, rest[at:]])
    return s


def main():
    out = sys.argv[1]
    n_strains = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    rng = np.random.default_rng(20260821)
    base = ACGT[rng.integers(0, 4, size=size)]
    with open(out, "w") as f:
        for i in range(n_strains):
            s = base if i == 0 else make_strain(base, rng)
            f.write(">strain_%02d\n" % i)
            data = s.tobytes().decode()
            for j in range(0, len(data), 80):
                f.write(data[j:j + 80])
                f.write("\n")
            del s


if __name__ == "__main__":
    main()
