"""Prolagan (profile-profile progressive alignment) tests.

Self-consistency always runs; the byte-level differential test against the
rebuilt reference prolagan binary runs only with SIBELIA_TPU_GOLDEN=1 and
the .lagan_build oracle (see test_lagan_exact.py header for the recipe).
"""
import os
import random
import subprocess

import pytest

from sibelia_tpu.align import lagan_exact, prolagan
from sibelia_tpu.align.mlagan_exact import align_multiple_exact, mlagan_fasta
from sibelia_tpu.align.prolagan import align_profiles, prolagan_fasta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAGAN_DIR = os.path.join(REPO, ".lagan_build")

needs_native = pytest.mark.skipif(not prolagan.available(),
                                  reason="native engine unavailable")
needs_oracle = pytest.mark.skipif(
    os.environ.get("SIBELIA_TPU_GOLDEN") != "1"
    or not os.path.exists(os.path.join(LAGAN_DIR, "prolagan")),
    reason="oracle binaries not built or SIBELIA_TPU_GOLDEN unset")


def _mutate(s, sub, ind, rng):
    out = []
    for c in s:
        r = rng.random()
        if r < sub:
            out.append(rng.choice("ACGT"))
        elif r < sub + ind / 2:
            pass
        elif r < sub + ind:
            out.append(c + rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


def _family(seed, n, length=1500):
    rng = random.Random(seed)
    base = "".join(rng.choice("ACGT") for _ in range(length))
    seqs = [_mutate(base, 0.03, 0.01, rng).encode() for _ in range(n)]
    names = [f"seq{i}" for i in range(n)]
    return seqs, names


@needs_native
def test_singleton_profiles_match_pairwise_mlagan():
    # A profile of one ungapped row carries no gap structure, so the
    # profile-profile DP must reproduce the plain two-sequence mlagan run.
    seqs, names = _family(7, 2)
    pro1 = [(names[0], seqs[0].decode())]
    pro2 = [(names[1], seqs[1].decode())]
    out = prolagan_fasta(seqs, names, pro1, pro2, f"({names[0]} {names[1]})")
    assert out == mlagan_fasta(seqs, names)


@needs_native
def test_profiles_are_preserved_in_merge():
    # prolagan only inserts whole columns of gaps into each profile: the
    # output restricted to one profile's rows, with all-gap columns
    # dropped, must reproduce that profile exactly.
    seqs, names = _family(13, 4)
    rows12 = align_multiple_exact(seqs[:2], names[:2])
    rows34 = align_multiple_exact(seqs[2:], names[2:])
    pro1 = list(zip(names[:2], rows12))
    pro2 = list(zip(names[2:], rows34))
    tree = f"(({names[0]} {names[1]}) ({names[2]} {names[3]}))"
    merged = align_profiles(seqs, names, pro1, pro2, tree)
    assert all(len(r) == len(merged[0]) for r in merged)
    for rows, sub in ((rows12, merged[:2]), (rows34, merged[2:])):
        cols = [c for c in zip(*sub) if any(x != "-" for x in c)]
        packed = ["".join(col[i] for col in cols) for i in range(len(sub))]
        assert packed == rows
    for s, r in zip(seqs, merged):
        assert r.replace("-", "").encode() == s


@needs_native
def test_membership_validation():
    seqs, names = _family(3, 2)
    pro1 = [(names[0], seqs[0].decode())]
    with pytest.raises(ValueError):
        prolagan_fasta(seqs, names, pro1, [], f"({names[0]} {names[1]})")
    with pytest.raises(ValueError):
        prolagan_fasta(seqs, names, pro1,
                       [(names[0], seqs[0].decode())],
                       f"({names[0]} {names[1]})")


@needs_oracle
@needs_native
def test_prolagan_differential(tmp_path):
    # Memberships chosen non-interleaved so the reference's else-branch
    # indexing slip (prolagan.c:1045) is never exercised.
    for seed in (3, 17):
        seqs, names = _family(seed, 4, length=1200)
        rows12 = align_multiple_exact(seqs[:2], names[:2])
        rows34 = align_multiple_exact(seqs[2:], names[2:])
        files = []
        for i, (s, nm) in enumerate(zip(seqs, names)):
            p = tmp_path / f"s{seed}_{i}.fa"
            p.write_text(f">{nm}\n{s.decode()}\n")
            files.append(str(p))
        for which, (nms, rows) in enumerate(
                ((names[:2], rows12), (names[2:], rows34))):
            p = tmp_path / f"pro{seed}_{which + 1}.fa"
            p.write_text("".join(f">{nm}\n{row}\n"
                                 for nm, row in zip(nms, rows)))
        tree = f"(({names[0]} {names[1]}) ({names[2]} {names[3]}))"
        env = dict(os.environ, LAGAN_DIR=LAGAN_DIR)
        r = subprocess.run(
            [os.path.join(LAGAN_DIR, "prolagan")] + files
            + ["-pro1", str(tmp_path / f"pro{seed}_1.fa"),
               "-pro2", str(tmp_path / f"pro{seed}_2.fa"),
               "-tree", tree],
            capture_output=True, env=env, cwd=str(tmp_path), check=True)
        pro1 = list(zip(names[:2], rows12))
        pro2 = list(zip(names[2:], rows34))
        ours = prolagan_fasta(seqs, names, pro1, pro2, tree)
        assert ours == r.stdout.decode(), seed
