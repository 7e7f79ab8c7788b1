import numpy as np
import pytest

from sibelia_tpu.variants.aligner import align_multiple, align_pair, _gotoh
from sibelia_tpu.variants.caller import (
    Variant,
    get_context,
    no_gaps,
    parse_alignment,
    strip_chr_id,
)


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def test_gotoh_identical():
    ra, rb = _gotoh(b"ACGTACGT", b"ACGTACGT")
    assert ra == rb == "ACGTACGT"


def test_gotoh_simple_indel():
    ra, rb = _gotoh(b"ACGTTTACGT", b"ACGTTACGT")
    assert no_gaps(ra) == "ACGTTTACGT"
    assert no_gaps(rb) == "ACGTTACGT"
    assert ra.count("-") == 0 and rb.count("-") == 1


@pytest.mark.parametrize("seed", range(4))
def test_align_pair_roundtrip(seed):
    rng = np.random.default_rng(seed)
    a = _rand_seq(rng, 5000)
    b_list = list(a)
    for _ in range(40):
        i = int(rng.integers(0, len(b_list)))
        op = rng.integers(0, 3)
        if op == 0:
            b_list[i] = "ACGT"[rng.integers(0, 4)]
        elif op == 1:
            b_list.insert(i, "ACGT"[rng.integers(0, 4)])
        else:
            del b_list[i]
    b = "".join(b_list)
    ra, rb = align_pair(a.encode(), b.encode())
    assert no_gaps(ra) == a
    assert no_gaps(rb) == b
    assert len(ra) == len(rb)
    # most columns should match for 40 edits on 5kb
    matches = sum(1 for x, y in zip(ra, rb) if x == y)
    assert matches > len(ra) * 0.97


def test_align_multiple_roundtrip():
    rng = np.random.default_rng(1)
    a = _rand_seq(rng, 800)
    seqs = [a]
    for _ in range(3):
        s = list(a)
        for _ in range(10):
            s[int(rng.integers(0, len(s)))] = "ACGT"[rng.integers(0, 4)]
        seqs.append("".join(s))
    rows = align_multiple([s.encode() for s in seqs])
    assert len(rows) == 4
    assert len({len(r) for r in rows}) == 1
    for r, s in zip(rows, seqs):
        assert no_gaps(r) == s


def test_parse_alignment_snp():
    aln = ["ACGTACGTACGTACGTACGTACGTACGTACGTACGT",
           "ACGTACGTACGTACGTACTTACGTACGTACGTACGT"]
    v = parse_alignment(aln, "chr", 7, "contig", 1, +1)
    assert len(v) == 1
    assert v[0].reference_allele == "G"
    assert v[0].assembly_allele == "T"
    assert v[0].reference_pos == 19  # 1-based position of the SNP


def test_parse_alignment_indel_anchor_shift():
    ref = "A" * 35 + "CGT" + "A" * 35
    asm = "A" * 35 + "C-T" + "A" * 35
    v = parse_alignment([ref, asm], "chr", 1, "contig", 1, +1)
    assert len(v) == 1
    # deletion: anchor base shift
    assert v[0].reference_allele.startswith(v[0].assembly_allele[0])
    assert len(v[0].reference_allele) == len(v[0].assembly_allele) + 1


def test_strip_chr_id():
    assert strip_chr_id("gi|385215269|ref|NC_017366.1|") == "NC_017366"
    assert strip_chr_id("plainid") == "plainid"


def test_variant_vcf_record():
    v = Variant("gi|1|ref|NC_1.1|", 42, "ctg", None, "A", "AT", "A", "AT", 3)
    assert v.get_vcf_record() == "NC_1\t42\t.\tA\tAT\t.\t.\t."


def test_py2_dict_order_anchors():
    """Known CPython 2.7 amd64 hash/iteration anchors."""
    from sibelia_tpu.core.py2_dict import py2_dict_key_order, py2_str_hash
    assert py2_str_hash("a") == 12416037344
    assert py2_str_hash("") == 0
    assert py2_dict_key_order(["a", "b", "c"]) == ["a", "c", "b"]
    assert py2_dict_key_order(["b", "a", "c"]) == ["a", "c", "b"]
