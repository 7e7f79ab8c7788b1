"""LAGAN utility API twins (align/toolkit.py) vs reference semantics."""
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from sibelia_tpu.align.toolkit import (conserved_columns, get_bounds,
                                       get_length,
                                       reverse_complement_fasta,
                                       score_alignment)


def test_rc_fasta():
    out = reverse_complement_fasta(">seq one\nACGTN\nacgtn\n")
    lines = out.splitlines()
    assert lines[0] == ">seq one"
    assert lines[1] == "nacgtNACGT"


def test_rc_sixty_columns():
    seq = "A" * 130
    out = reverse_complement_fasta(">x\n" + seq + "\n")
    body = out.splitlines()[1:]
    assert [len(b) for b in body] == [60, 60, 10]
    assert set("".join(body)) == {"T"}


def test_get_length_first_record_only():
    assert get_length(">a\nACGT.\nNN\n>b\nAAAA\n") == 7


def test_get_bounds_quirk_and_empty():
    # no anchors -> whole ranges
    assert get_bounds("", 100, 80) == "-s1 1 100 -s2 1 80\n"
    txt = "(10 20)=(15 25) 33.5\n(40 50)=(45 55) 12.0\n"
    out = get_bounds(txt, 100, 80)
    # margins: m2b=15, m2e=80-55=25 (both vs len2, reference quirk)
    # first hit: s1b=max(10-30,1)=1 s1e=min(20+50,100)=70
    # second:    s1b=max(40-30,1)=10 s1e=min(50+50,100)=100
    assert out == "-s1 1 100 -s2 1 80\n"


def test_conserved_columns_perfect_and_diverged():
    rng = np.random.default_rng(3)
    a = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))
    assert conserved_columns(a, a, 70) == 400
    b = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))
    # unrelated sequences: few-to-no conserved columns survive
    assert conserved_columns(a, b, 70) < 100


def test_score_alignment_pairs():
    rows = ["ACGTACGT", "ACGTACGT", "ACG-ACGT"]
    s = score_alignment(rows, 70)
    assert s >= 2 * conserved_columns(rows[0], rows[2], 70)


# ---------------------------------------------------------------------------
# Draft-assembly scoring/ordering differential tests (scorecontigs /
# contigorder twins vs the rebuilt reference binaries)
# ---------------------------------------------------------------------------

def _contig_scenario(seed):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=2600))
    alignments, offsets = [], []
    spans = [(0, 700), (600, 1400), (1500, 2200), (2100, 2600)]
    for i, (a, b) in enumerate(spans):
        sl = list(base[a:b])
        for _ in range(len(sl) // 25):
            sl[int(rng.integers(0, len(sl)))] = str(rng.choice(list("ACGT")))
        row1 = "".join(sl)
        row0 = base[a:b]
        if i % 2:  # plant a gap column pair
            row0 = row0[:50] + "-" + row0[50:]
            row1 = row1[:50] + row1[50] + row1[50:]
            row1 = row1[:len(row0)]
        alignments.append((row0, row1))
        offsets.append(a)
    return base, alignments, offsets


@pytest.mark.parametrize("seed", [3, 17])
def test_score_contigs_and_order_vs_reference(seed, tmp_path):
    from sibelia_tpu.align.toolkit import contig_order, score_contigs
    base, alignments, offsets = _contig_scenario(seed)
    table, used = score_contigs(alignments, offsets, len(base))
    assert used == list(range(len(alignments)))
    order_out = contig_order(table)
    assert "-->" in order_out or order_out == "ordering failed\n"

    sc_bin = os.path.join(REPO, ".lagan_build", "utils", "scorecontigs")
    co_bin = os.path.join(REPO, ".lagan_build", "utils", "contigorder")
    if not (os.path.exists(sc_bin) and os.path.exists(co_bin)
            and os.environ.get("SIBELIA_TPU_GOLDEN") == "1"):
        pytest.skip("reference binaries not built / golden unset")

    def wrap(seq):
        return "\n".join(seq[i:i + 60] for i in range(0, len(seq), 60))

    files = []
    for i, (r0, r1) in enumerate(alignments):
        fn = tmp_path / f"aln_{i}.fa"
        fn.write_text(f">base_{i}\n{wrap(r0)}\n>contig_{i}\n{wrap(r1)}\n")
        files.append(str(fn))
    flist = tmp_path / "file_list"
    flist.write_text("".join(
        f"{i} {offsets[i]} {offsets[i] + sum(c.isalpha() for c in alignments[i][0])} {files[i]}\n"
        for i in range(len(files))))
    fasta = tmp_path / "base.fa"
    fasta.write_text(f">base\n{wrap(base)}\n")
    clist = tmp_path / "contig_list"
    r = subprocess.run([sc_bin, str(flist), str(fasta), str(clist), "70"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout == table

    tf = tmp_path / "table"
    tf.write_text(table)
    r2 = subprocess.run([co_bin, str(tf)], capture_output=True, text=True,
                        timeout=120)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == order_out
