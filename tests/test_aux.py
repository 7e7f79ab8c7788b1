"""Auxiliary-subsystem tests: checkpoint/resume, direct writer units,
annotation and circos helper smoke tests, and the C-Sibelia contig-set
(unfinished assembly) mode with breakend / unplaced-insertion output."""
import filecmp
import os

import numpy as np
import pytest

from sibelia_tpu.blocks.instance import BlockInstance
from sibelia_tpu.io import writers
from sibelia_tpu.io.fasta import FASTARecord


def _write_fasta(path, records):
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                f.write(seq[i:i + 80] + "\n")


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------


def test_checkpoint_resume_roundtrip(tmp_path):
    """A run resumed from a mid-pipeline checkpoint must reproduce the
    uncheckpointed outputs byte-for-byte (including the shared glibc
    rand stream used for N randomization)."""
    from sibelia_tpu.cli.sibelia import run

    rng = np.random.default_rng(17)
    base = _rand_seq(rng, 12000)
    mut = list(base)
    for i in rng.integers(0, len(mut), size=70):
        mut[i] = "ACGT"[rng.integers(0, 4)]
    # N chars force rand() consumption, exercising rand-state restore
    mut[100:110] = "N" * 10
    fasta = tmp_path / "in.fasta"
    _write_fasta(fasta, [("chrA", base), ("chrB", "".join(mut))])
    stagefile = tmp_path / "st.txt"
    stagefile.write_text("2\n20 100\n60 400\n")
    argv = ["-k", str(stagefile), "-m", "400", "--lastk", "60", str(fasta)]

    plain = tmp_path / "plain"
    assert run(argv + ["-o", str(plain)]) == 0

    ck = tmp_path / "ck"
    first = tmp_path / "first"
    assert run(argv + ["-o", str(first), "--checkpoint", str(ck)]) == 0
    ckpts = sorted(f for f in os.listdir(ck) if f.endswith(".ckpt"))
    assert len(ckpts) == 2

    # drop the last checkpoint: the rerun must resume after stage 1 and
    # still match the plain outputs
    os.remove(ck / ckpts[-1])
    os.remove(ck / (ckpts[-1] + ".hist"))
    resumed = tmp_path / "resumed"
    assert run(argv + ["-o", str(resumed), "--checkpoint", str(ck)]) == 0
    for name in ("blocks_coords.txt", "coverage_report.txt",
                 "genomes_permutations.txt"):
        assert filecmp.cmp(plain / name, resumed / name, shallow=False), name


# ---------------------------------------------------------------------------
# direct writer units
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_blocks():
    chr_list = [FASTARecord("ACGTACGTACGTACGTACGT", "chrA", 0),
                FASTARecord("TTTTACGTACGTACGTCCCC", "chrB", 1)]
    blocks = [BlockInstance(1, chr_list[0], 0, 8),
              BlockInstance(-1, chr_list[1], 4, 16),
              BlockInstance(2, chr_list[0], 8, 20),
              BlockInstance(2, chr_list[1], 4, 16)]
    return chr_list, blocks


def test_blocks_coords_layout(tmp_path, tiny_blocks):
    chr_list, blocks = tiny_blocks
    path = tmp_path / "bc.txt"
    writers.list_blocks_indices(blocks, chr_list, str(path))
    text = path.read_text()
    head, *sections = text.split("-" * 80 + "\n")
    assert head.splitlines()[0].split() == ["Seq_id", "Size", "Description"]
    assert "1\t20\tchrA" in head and "2\t20\tchrB" in head
    assert sections[0].startswith("Block #1\n")
    rows = sections[0].splitlines()
    assert rows[1].split() == ["Seq_id", "Strand", "Start", "End", "Length"]
    # block 1: + copy on chrA [1..8], - copy on chrB (conventional coords)
    assert rows[2].split() == ["1", "+", "1", "8", "8"]
    assert rows[3].split() == ["2", "-", "16", "5", "12"]


def test_permutations_and_coverage(tmp_path, tiny_blocks):
    chr_list, blocks = tiny_blocks
    perm = tmp_path / "perm.txt"
    writers.list_chromosomes_as_permutations(blocks, chr_list, str(perm))
    lines = perm.read_text().splitlines()
    assert lines[0] == ">chrA"
    assert lines[1].endswith("$")
    assert lines[1].split() == ["+1", "+2", "$"]
    assert lines[2] == ">chrB"
    assert lines[3].split() == ["-1", "+2", "$"]
    cov = tmp_path / "cov.txt"
    writers.generate_report(blocks, chr_list, str(cov))
    text = cov.read_text()
    assert "Degree\tCount\tTotal" in text
    assert "All\t" in text


def test_gff_and_sequences_writers(tmp_path, tiny_blocks):
    chr_list, blocks = tiny_blocks
    gff = tmp_path / "bc.gff"
    writers.list_blocks_indices_gff(blocks, chr_list, str(gff))
    rows = [ln.split("\t") for ln in gff.read_text().splitlines()
            if ln and not ln.startswith("#")]
    assert all(r[1] == "Sibelia" for r in rows)
    assert any(r[6] == "-" for r in rows)
    seqs = tmp_path / "bs.fasta"
    writers.list_blocks_sequences(blocks, chr_list, str(seqs))
    body = seqs.read_text()
    assert body.count(">") == len(blocks)
    assert "Block_id=1" in body


# ---------------------------------------------------------------------------
# annotation + circos helper smoke
# ---------------------------------------------------------------------------


def test_annotate_derive_db_name(tmp_path):
    from sibelia_tpu.cli.annotate import derive_db_name

    vcf = tmp_path / "variant.vcf"
    vcf.write_text("##fileformat=VCFv4.1\n"
                   "##reference=gi|57865352|ref|NC_002951.2|\n")
    genomes = tmp_path / "genomes.txt"
    genomes.write_text(
        "data/CP000046/genes.gbk\n"
        "data/Staphylococcus_aureus_COL/NC_002951.val\n")
    assert derive_db_name(str(vcf), str(genomes)) \
        == "Staphylococcus_aureus_COL"
    # unknown chromosome -> None
    vcf.write_text("##fileformat=VCFv4.1\n"
                   "##reference=gi|1|ref|NC_999999.1|\n")
    assert derive_db_name(str(vcf), str(genomes)) is None


def test_circos_hide_mapped_contigs(tmp_path):
    from sibelia_tpu.cli.circos_tools import hide_mapped_contigs

    perms = tmp_path / "genomes_permutations.txt"
    perms.write_text(">ref_chr\n1 2 3 $\n"
                     ">contig_mapped\n2 3 $\n"
                     ">contig_novel\n-3 1 $\n")
    circos = tmp_path / "circos"
    circos.mkdir()
    (circos / "circos.conf").write_text("karyotype = circos.sequences.txt\n")
    (circos / "circos.sequences.txt").write_text(
        "chr - seq1 ref_chr 0 20 chr1\n"
        "chr - seq2 contig_mapped 0 10 chr2\n"
        "chr - seq3 contig_novel 0 10 chr3\n")
    ref_fasta = tmp_path / "ref.fasta"
    ref_fasta.write_text(">ref_chr\nACGT\n")
    rc = hide_mapped_contigs([str(tmp_path), str(ref_fasta)])
    assert rc == 0
    out = (circos / "unmapped.circos.conf").read_text()
    # the perfectly-embedded contig is hidden; the novel one stays
    assert "seq3" in out.split("chromosomes = ")[1]
    assert "seq2" not in out.split("chromosomes = ")[1]


def test_circos_sort_sequences_without_perl(tmp_path):
    from sibelia_tpu.cli.circos_tools import sort_sequences

    circos = tmp_path / "circos"
    circos.mkdir()
    (circos / "circos.conf").write_text("base config\n")
    (circos / "circos.segdup.txt").write_text("")
    (circos / "circos.sequences.txt").write_text("")
    rc = sort_sequences([str(tmp_path), str(tmp_path / "missing_orderchr")])
    assert rc == 0
    assert (circos / "sorted.circos.conf").read_text().startswith(
        "base config")


# ---------------------------------------------------------------------------
# C-Sibelia contig-set mode (BASELINE config 5)
# ---------------------------------------------------------------------------


def test_csibelia_contig_set_mode(tmp_path):
    """Unfinished assembly (contig set) vs a finished reference: the
    uncovered novel contig must surface as breakends (or as FASTA via
    -u), and anchored insertions/deletions must appear in the VCF
    (reference: C-Sibelia.py:446-463,374-427)."""
    from sibelia_tpu.cli.csibelia import run

    rng = np.random.default_rng(29)
    genome = _rand_seq(rng, 60000)
    ref = tmp_path / "ref.fasta"
    _write_fasta(ref, [("ref_chr", genome)])

    # assembly: two contigs covering the genome with a deleted middle
    # chunk, some SNPs, plus a wholly novel contig
    c1 = list(genome[:30000])
    for i in rng.integers(100, 29900, size=25):
        c1[i] = "ACGT"[rng.integers(0, 4)]
    c2 = genome[32000:]          # -> 2kb uncovered reference span
    novel = _rand_seq(rng, 2500)  # unplaced contig
    asm = tmp_path / "asm.fasta"
    _write_fasta(asm, [("ctg1", "".join(c1)), ("ctg2", c2),
                       ("ctg_novel", novel)])

    out = tmp_path / "out"
    rc = run([str(ref), str(asm), "-o", str(out), "-m", "500",
              "-v", "variant.vcf"])
    assert rc == 0
    vcf = (out / "variant.vcf").read_text().splitlines()
    body = [ln for ln in vcf if not ln.startswith("#")]
    assert body, "no variants called"
    # SNPs from ctg1
    assert any(len(f[3]) == 1 and len(f[4]) == 1 and f[2] == "."
               for f in (ln.split("\t") for ln in body))
    # the novel contig surfaces as breakend records
    bnds = [ln for ln in body if "SVTYPE=BND" in ln]
    assert bnds and any("ctg_novel" in ln for ln in bnds)
    # the uncovered reference span becomes a long deletion record
    assert any(len(f[3]) > 1000 for f in (ln.split("\t") for ln in body))

    # -u mode: unplaced insertions to FASTA instead of breakends
    out2 = tmp_path / "out2"
    rc = run([str(ref), str(asm), "-o", str(out2), "-m", "500",
              "-v", "variant.vcf", "-u", "unmapped.fasta"])
    assert rc == 0
    vcf2 = (out2 / "variant.vcf").read_text()
    assert "SVTYPE=BND" not in vcf2
    unmapped = (out2 / "unmapped.fasta").read_text()
    assert 'Seq="ctg_novel"' in unmapped


def test_invariant_check_mode(monkeypatch):
    """SIBELIA_TPU_CHECK=1 runs the IndexedSequence::Test twin after
    every collapsing vertex; a poisoned store must be caught."""
    import random

    from sibelia_tpu.blocks.finder import BlockFinder
    from sibelia_tpu.graph.indexed import (build_index, check_invariants,
                                           kmer_id_map,
                                           randomize_and_enumerate,
                                           store_from_enum)
    from sibelia_tpu.graph.sequence import MutableSequence

    rng = random.Random(3)
    base = "".join(rng.choice("ACGT") for _ in range(3000))

    def mut(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.02:
                out.append(rng.choice("ACGT"))
            elif r < 0.03:
                out.append(ch + rng.choice("ACGT"))
            else:
                out.append(ch)
        return "".join(out)

    recs = [FASTARecord(base, "g1", 0), FASTARecord(mut(base), "g2", 1)]
    monkeypatch.setenv("SIBELIA_TPU_CHECK", "1")
    finder = BlockFinder(recs)
    assert finder.perform_graph_simplifications(25, 50, 4) > 0

    # corruption detection: flip one stored id and expect the check to fire
    seq = MutableSequence([r.sequence.encode() for r in recs])
    enum = randomize_and_enumerate(seq, 25, None, 50)
    store = store_from_enum(seq, enum)
    idmap = kmer_id_map(seq, enum, 25)
    check_invariants(seq, store, 25, idmap)
    store.node_bif[0] += 1
    with pytest.raises(AssertionError):
        check_invariants(seq, store, 25, idmap)


@pytest.mark.parametrize("seed", [41, 43, 47])
def test_csibelia_contig_set_randomized(tmp_path, seed):
    """Randomized contig-set hardening (VERDICT r3 weak #8): many
    contigs in shuffled input order, several unplaced insertions, both
    breakend and -u modes.  Asserts the intricate degenerate-order
    surface: breakend ids are the dense bnd_{2i}/bnd_{2i+1} pairs in
    output order, runs are deterministic byte-for-byte, every novel
    contig surfaces exactly once (BND pair or -u record), and the
    non-breakend VCF body is unchanged between the two modes
    (reference: C-Sibelia.py:446-463,374-427)."""
    from sibelia_tpu.cli.csibelia import run

    rng = np.random.default_rng(seed)
    genome = _rand_seq(rng, 80000)
    ref = tmp_path / "ref.fasta"
    _write_fasta(ref, [("ref_chr", genome)])

    # 5 covering contigs with SNPs + small indels, 3 novel contigs
    bounds = [0, 18000, 35000, 50000, 64000, 80000]
    recs = []
    for i in range(5):
        seg = list(genome[bounds[i]:bounds[i + 1]])
        for p in rng.integers(100, len(seg) - 100, size=12):
            seg[p] = "ACGT"[rng.integers(0, 4)]
        recs.append(("ctg_%02d" % i, "".join(seg)))
    for i in range(3):
        recs.append(("novel_%02d" % i, _rand_seq(rng, 1500 + 400 * i)))
    order = rng.permutation(len(recs))
    recs = [recs[i] for i in order]
    asm = tmp_path / "asm.fasta"
    _write_fasta(asm, recs)

    def run_mode(tag, extra):
        out = tmp_path / tag
        rc = run([str(ref), str(asm), "-o", str(out), "-m", "500",
                  "-v", "variant.vcf"] + extra)
        assert rc == 0
        return (out / "variant.vcf").read_text()

    vcf_a = run_mode("a", [])
    vcf_b = run_mode("b", [])  # determinism
    assert vcf_a == vcf_b

    body = [ln for ln in vcf_a.splitlines() if not ln.startswith("#")]
    bnds = [ln.split("\t") for ln in body if "SVTYPE=BND" in ln]
    # dense pair numbering in output order: bnd_0, bnd_1, bnd_2, ...
    ids = [f[2] for f in bnds]
    assert ids == ["bnd_%d" % i for i in range(len(ids))], ids
    assert len(ids) % 2 == 0 and len(ids) // 2 == 3  # one pair per novel
    # each novel contig appears in exactly two breakend ALTs (the
    # bracketed chr:pos mate notation, C-Sibelia.py:455-459)
    joined = "\n".join("\t".join(f) for f in bnds)
    for name, _ in recs:
        if name.startswith("novel"):
            hits = joined.count("[%s:" % name) + joined.count("]%s:" % name)
            assert hits == 2, (name, hits)

    # -u mode: breakends replaced by FASTA records; everything else is
    # byte-identical
    vcf_u = run_mode("u", ["-u", "unmapped.fasta"])
    assert "SVTYPE=BND" not in vcf_u
    strip = lambda t: [ln for ln in t.splitlines()
                       if not ln.startswith("#") and "SVTYPE=BND" not in ln]
    assert strip(vcf_a) == strip(vcf_u)
    unmapped = (tmp_path / "u" / "unmapped.fasta").read_text()
    for name, _ in recs:
        if name.startswith("novel"):
            assert unmapped.count('Seq="%s"' % name) == 1, name


def test_sam_writer_exact_bytes(tmp_path):
    """SAM writer vs bytes hand-derived from the reference's
    OutputBlocksInSAM (outputgenerator.cpp:633-678).  That writer is
    unreachable from the 3.0.7 main (dead code — no CLI flag calls it),
    so no binary diff is possible; this pins our writer to the exact
    line grammar of the reference source instead: @HD, one @SQ per
    chromosome, then per block-id group (copies sorted by chromosome)
    records QNAME="Block #id", FLAG=0, RNAME=description,
    POS=conventional (1-based, strand-dependent) start, MAPQ=255,
    CIGAR/RNEXT/PNEXT='*', TLEN=0, SEQ=the copy's forward-strand text,
    QUAL='*'."""
    from sibelia_tpu.blocks.instance import BlockInstance
    from sibelia_tpu.io.fasta import FASTARecord

    c0 = FASTARecord("ACGTACGTAA", "chrA", 0)
    c1 = FASTARecord("TTGGCCAATT", "chrB", 1)
    blocks = [
        BlockInstance(1, c1, 2, 8),
        BlockInstance(-1, c0, 0, 6),
        BlockInstance(2, c0, 4, 9),
    ]
    path = tmp_path / "blocks.sam"
    writers.output_blocks_in_sam(blocks, [c0, c1], str(path))
    want = (
        "@HD\tVN:1.4\n"
        "@SQ\tSN:chrA\tLN:10\n"
        "@SQ\tSN:chrB\tLN:10\n"
        "Block #1\t0\tchrA\t6\t255\t*\t*\t*\t0\tACGTAC\t*\n"
        "Block #1\t0\tchrB\t3\t255\t*\t*\t*\t0\tGGCCAA\t*\n"
        "Block #2\t0\tchrA\t5\t255\t*\t*\t*\t0\tACGTA\t*\n"
    )
    with open(path) as f:
        assert f.read() == want
