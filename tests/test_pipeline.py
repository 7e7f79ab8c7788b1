import numpy as np

from sibelia_tpu.blocks.finder import BlockFinder
from sibelia_tpu.blocks.postprocess import glue_stripes
from sibelia_tpu.io.fasta import FASTARecord, reverse_complement


def _mutate(rng, s: str, n_subs: int, n_indel: int) -> str:
    s = list(s)
    for _ in range(n_subs):
        i = rng.integers(0, len(s))
        s[i] = "ACGT"[rng.integers(0, 4)]
    for _ in range(n_indel):
        i = int(rng.integers(0, len(s)))
        if rng.integers(0, 2):
            s.insert(i, "ACGT"[rng.integers(0, 4)])
        else:
            del s[i]
    return "".join(s)


def _random_seq(rng, n) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def test_two_strain_blocks():
    rng = np.random.default_rng(7)
    base = _random_seq(rng, 3000)
    other = _mutate(rng, base, 30, 5)
    chrs = [FASTARecord(base, "strainA", 0), FASTARecord(other, "strainB", 1)]
    finder = BlockFinder(chrs)
    for k, d in [(10, 40), (20, 80)]:
        finder.perform_graph_simplifications(k, d, 4)
    blocks = finder.generate_synteny_blocks(20, 10, 100)
    blocks = glue_stripes(blocks, chrs)
    assert blocks, "expected at least one synteny block"
    ids = {b.block_id for b in blocks}
    # main shared block should cover most of both strains
    for chr_id in (0, 1):
        cov = sum(b.length for b in blocks if b.chr_id == chr_id)
        assert cov > 2000, f"low coverage on chr {chr_id}: {cov}"
    # every block id occurs at least twice (one per strain or repeat)
    for bid in ids:
        assert sum(1 for b in blocks if b.block_id == bid) >= 2


def test_inverted_segment_gets_negative_strand():
    rng = np.random.default_rng(11)
    left = _random_seq(rng, 1200)
    mid = _random_seq(rng, 1200)
    right = _random_seq(rng, 1200)
    a = left + mid + right
    b = left + reverse_complement(mid) + right
    chrs = [FASTARecord(a, "A", 0), FASTARecord(b, "B", 1)]
    finder = BlockFinder(chrs)
    for k, d in [(10, 40)]:
        finder.perform_graph_simplifications(k, d, 4)
    blocks = finder.generate_synteny_blocks(15, 10, 300)
    blocks = glue_stripes(blocks, chrs)
    assert any(x.signed_id < 0 for x in blocks), "expected a negative-strand block"


def test_simplification_shrinks_or_keeps_sequence():
    rng = np.random.default_rng(3)
    base = _random_seq(rng, 2000)
    other = _mutate(rng, base, 40, 10)
    chrs = [FASTARecord(base, "A", 0), FASTARecord(other, "B", 1)]
    finder = BlockFinder(chrs)
    before = [len(s) for s in finder.raw_seq]
    n = finder.perform_graph_simplifications(10, 50, 4)
    after = [len(s) for s in finder.raw_seq]
    assert n >= 0
    # bulge collapse replaces branches; lengths stay near the original
    for b, a in zip(before, after):
        assert abs(a - b) < 300
    # original positions stay monotone-ish and within input bounds
    for c, op in enumerate(finder.original_pos):
        assert op.min() >= 0
        assert op.max() < before[c] + 1
