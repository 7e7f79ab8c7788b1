"""LAGAN utility API twins (align/toolkit.py) vs reference semantics."""
import numpy as np

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
