#!/usr/bin/env python3
"""Generate a synthetic N-strain bacterial dataset for scale benchmarks.

Deterministic: a 2 Mbp ancestor, each strain mutated with SNPs (0.5-0.75%),
small indels, inversions and translocations (the mix described in
docs/PARITY.md's scale verification).

Usage: gen_strains.py OUT.fasta [n_strains] [genome_size]
"""
import random
import sys


def make_strain(base: str, rng: random.Random) -> str:
    s = list(base)
    snp_rate = rng.uniform(0.005, 0.0075)
    for i in range(len(s)):
        if rng.random() < snp_rate:
            s[i] = rng.choice("ACGT")
    seq = "".join(s)
    # indels
    for _ in range(rng.randint(20, 60)):
        pos = rng.randrange(len(seq))
        ln = rng.randint(1, 30)
        if rng.random() < 0.5:
            seq = seq[:pos] + seq[pos + ln:]
        else:
            ins = "".join(rng.choice("ACGT") for _ in range(ln))
            seq = seq[:pos] + ins + seq[pos:]
    # inversions
    for _ in range(rng.randint(1, 4)):
        a = rng.randrange(len(seq) - 50000)
        b = a + rng.randint(10000, 50000)
        mid = seq[a:b].translate(str.maketrans("ACGT", "TGCA"))[::-1]
        seq = seq[:a] + mid + seq[b:]
    # translocation
    if rng.random() < 0.7:
        a = rng.randrange(len(seq) - 80000)
        b = a + rng.randint(20000, 60000)
        chunk = seq[a:b]
        rest = seq[:a] + seq[b:]
        at = rng.randrange(len(rest))
        seq = rest[:at] + chunk + rest[at:]
    return seq


def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    rng = random.Random(20260818)
    base = "".join(rng.choice("ACGT") for _ in range(size))
    with open(out, "w") as h:
        for i in range(n):
            seq = make_strain(base, rng)
            h.write(f">strain_{i:02d}\n")
            for j in range(0, len(seq), 80):
                h.write(seq[j:j + 80] + "\n")
    print(f"wrote {n} strains of ~{size} bp to {out}")


if __name__ == "__main__":
    main()
