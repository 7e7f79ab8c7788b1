#!/usr/bin/env python
"""Differential test driver: run the reference Sibelia binary (if built at
.ref_build/Sibelia) and the sibelia_tpu CLI on the same FASTA inputs and
compare the text outputs byte-for-byte.

Usage: python scripts/diffref.py [--seed N] [--size N] [--nchr N] [--stages "k d;k d"]
Exits non-zero on mismatch and prints the first differing file/line.
"""
from __future__ import annotations

import argparse
import difflib
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_BIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".ref_build", "Sibelia")

COMPARE_FILES = [
    "blocks_coords.txt",
    "coverage_report.txt",
    "genomes_permutations.txt",
]


def make_genomes(seed: int, size: int, nchr: int, with_n: bool = False):
    rng = np.random.default_rng(seed)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, size=size))
    genomes = []
    for g in range(nchr):
        s = list(base)
        for _ in range(size // 50):  # substitutions
            s[int(rng.integers(0, len(s)))] = "ACGT"[rng.integers(0, 4)]
        for _ in range(size // 200):  # indels
            i = int(rng.integers(0, len(s)))
            if rng.integers(0, 2):
                s.insert(i, "ACGT"[rng.integers(0, 4)])
            else:
                del s[i]
        if g % 3 == 2 and size > 600:
            # inversion
            a = int(rng.integers(0, len(s) - 300))
            b = a + int(rng.integers(100, 300))
            comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
            s[a:b] = [comp[c] for c in reversed(s[a:b])]
        if with_n:
            for _ in range(5):
                s[int(rng.integers(0, len(s)))] = "N"
        genomes.append("".join(s))
    return genomes


def write_fasta(path, genomes):
    with open(path, "w") as f:
        for i, g in enumerate(genomes):
            f.write(f">genome_{i} synthetic\n")
            for j in range(0, len(g), 70):
                f.write(g[j:j + 70] + "\n")


def run_diff(genomes, stages, min_block, extra_flags=()):
    tmp = tempfile.mkdtemp(prefix="sibdiff_")
    try:
        fasta = os.path.join(tmp, "in.fasta")
        write_fasta(fasta, genomes)
        stagefile = os.path.join(tmp, "stages.txt")
        with open(stagefile, "w") as f:
            f.write(f"{len(stages)}\n")
            for k, d in stages:
                f.write(f"{k} {d}\n")
        ref_out = os.path.join(tmp, "ref")
        my_out = os.path.join(tmp, "mine")
        os.makedirs(ref_out)
        os.makedirs(my_out)
        r = subprocess.run(
            [REF_BIN, "-k", stagefile, "-m", str(min_block), "-r",
             *extra_flags, "-o", ref_out, fasta],
            capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            print("reference failed:", r.stderr)
            return False
        from sibelia_tpu.cli.sibelia import run as my_run
        rc = my_run(["-k", stagefile, "-m", str(min_block), "-r",
                     *extra_flags, "-o", my_out, fasta])
        if rc != 0:
            print("sibelia_tpu failed")
            return False
        ok = True
        for fn in COMPARE_FILES:
            fa, fb = os.path.join(ref_out, fn), os.path.join(my_out, fn)
            if not os.path.exists(fa):
                continue
            a = open(fa).read()
            b = open(fb).read() if os.path.exists(fb) else "<missing>"
            if a != b:
                ok = False
                print(f"MISMATCH {fn}")
                for line in list(difflib.unified_diff(
                        a.splitlines(), b.splitlines(),
                        "reference", "sibelia_tpu", lineterm=""))[:40]:
                    print(line)
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=2000)
    ap.add_argument("--nchr", type=int, default=2)
    ap.add_argument("--stages", default="10 40;20 80")
    ap.add_argument("--minblock", type=int, default=100)
    ap.add_argument("--with-n", action="store_true")
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()
    stages = [tuple(map(int, s.split())) for s in args.stages.split(";") if s.strip()]
    if not os.path.exists(REF_BIN):
        print("reference binary not built; skipping")
        return 0
    bad = 0
    for t in range(args.trials):
        genomes = make_genomes(args.seed + t, args.size, args.nchr, args.with_n)
        ok = run_diff(genomes, stages, args.minblock)
        print(f"trial {t}: {'OK' if ok else 'MISMATCH'}")
        bad += 0 if ok else 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
