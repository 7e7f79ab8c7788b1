"""Draft-assembly glue utils: byte parity vs the rebuilt reference
binaries (scripts/build_oracles.sh -> .lagan_build/utils)."""
import os
import subprocess

import numpy as np
import pytest

from sibelia_tpu.align.toolkit import (cextract, cstat, get_contig_pos,
                                       get_overlap, glue, overlay,
                                       seq_merge)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UTILS = os.path.join(REPO, ".lagan_build", "utils")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(UTILS), reason="oracle LAGAN build unavailable "
    "(run scripts/build_oracles.sh)")


def _oracle(binary, args, stdin_file=None, timeout=60):
    cmd = [os.path.join(UTILS, binary)] + [str(a) for a in args]
    stdin = open(stdin_file, "rb") if stdin_file else None
    try:
        r = subprocess.run(cmd, stdin=stdin, capture_output=True,
                           timeout=timeout)
    finally:
        if stdin:
            stdin.close()
    assert r.returncode == 0, (binary, r.stderr[-500:])
    return r.stdout.decode("latin-1")


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def _rand_aligned_pair(rng, n, gap_rate=0.08):
    """Two gapped rows of equal column count."""
    a, b = [], []
    for _ in range(n):
        r = rng.random()
        if r < gap_rate:
            a.append("-")
            b.append("ACGT"[rng.integers(0, 4)])
        elif r < 2 * gap_rate:
            a.append("ACGT"[rng.integers(0, 4)])
            b.append("-")
        else:
            c = "ACGT"[rng.integers(0, 4)]
            a.append(c)
            b.append(c if rng.random() < 0.85
                     else "ACGT"[rng.integers(0, 4)])
    return "".join(a), "".join(b)


def _mfa(records):
    out = []
    for header, seq in records:
        out.append(header + "\n")
        for i in range(0, len(seq), 60):
            out.append(seq[i:i + 60] + "\n")
    return "".join(out)


def test_seqmerge_parity(tmp_path):
    rng = np.random.default_rng(1)
    texts = []
    files = []
    for i in range(3):
        t = _mfa([(">contig%d extra" % i, _rand_seq(rng, 150 + 37 * i))])
        texts.append(t)
        p = tmp_path / ("f%d.fa" % i)
        p.write_text(t)
        files.append(str(p))
    want = _oracle("seqmerge", files)
    assert seq_merge(texts) == want
    # single short sequence exercises the `written != 1` newline quirk
    t1 = ">x\nA\n"
    p = tmp_path / "one.fa"
    p.write_text(t1)
    assert seq_merge([t1]) == _oracle("seqmerge", [str(p)])


def test_getoverlap_parity(tmp_path):
    rng = np.random.default_rng(2)
    lines = []
    for _ in range(12):
        a = int(rng.integers(1, 5000))
        b = a + int(rng.integers(10, 400))
        c = int(rng.integers(1, 5000))
        d = c + int(rng.integers(10, 400))
        lines.append("(%d %d)=(%d %d) %.1f\n" % (a, b, c, d,
                                                 rng.random() * 100))
    txt = "".join(lines)
    p = tmp_path / "anchs.txt"
    p.write_text(txt)
    assert get_overlap(txt) == _oracle("getoverlap", [str(p)])
    p.write_text("")
    assert get_overlap("") == _oracle("getoverlap", [str(p)])


def test_getcontigpos_parity(tmp_path):
    rng = np.random.default_rng(3)
    a, b = _rand_aligned_pair(rng, 400)
    txt = _mfa([(">finished", a), (">contig", b)])
    p = tmp_path / "al.mfa"
    p.write_text(txt)
    letters = sum(1 for c in a if c.isalpha())
    for idx in (1, 5, letters // 2, letters):
        assert get_contig_pos(txt, idx) == \
            _oracle("getcontigpos", [str(p), idx]), idx


def test_cextract_parity(tmp_path):
    rng = np.random.default_rng(4)
    a, b = _rand_aligned_pair(rng, 500)
    txt = _mfa([(">row0 hdr", a), (">row1", b)])
    p = tmp_path / "al.mfa"
    p.write_text(txt)
    la = sum(1 for c in a if c.isalpha())
    for (beg, end, si, se) in ((1, la, 0, 0), (10, 200, 0, 1),
                               (50, la - 5, 1, 0)):
        assert cextract(txt, beg, end, si, se) == \
            _oracle("cextract", [str(p), beg, end, si, se]), (beg, end)
    # -subst: substitute from another file's first record
    sub_len = sum(1 for c in b if c.isalpha() or c == ".")
    sub = _mfa([(">sub", _rand_seq(rng, sub_len))])
    ps = tmp_path / "sub.fa"
    ps.write_text(sub)
    assert cextract(txt, 10, 300, 0, 1, sub) == \
        _oracle("cextract", [str(p), 10, 300, 0, 1, "-subst", str(ps)])


def test_cstat_parity(tmp_path):
    rng = np.random.default_rng(5)
    a, b = _rand_aligned_pair(rng, 900, gap_rate=0.04)
    txt = _mfa([(">one", a), (">two", b)])
    p = tmp_path / "al.mfa"
    p.write_text(txt)
    for (cutoff, window) in ((70, 50), (60, 100), (90, 30)):
        assert cstat(txt, cutoff, window) == \
            _oracle("cstat", [str(p), cutoff, window]), (cutoff, window)
    assert cstat(txt, 70, 50, 11, 22) == \
        _oracle("cstat", [str(p), 70, 50, "-shift", 11, 22])


def test_overlay_parity(tmp_path):
    rng = np.random.default_rng(6)
    a, b = _rand_aligned_pair(rng, 300)
    align = _mfa([(">s1", a), (">s2", b)])
    pa = tmp_path / "align.mfa"
    pa.write_text(align)
    seqs = []
    files = []
    for name, row in (("s1", a), ("s2", b)):
        raw = "".join("acgt"["ACGT".index(c)] if rng.random() < 0.3 else c
                      for c in row if c != "-")
        t = _mfa([(">" + name, raw)])
        seqs.append(t)
        pf = tmp_path / (name + ".fa")
        pf.write_text(t)
        files.append(str(pf))
    want = _oracle("overlay", [str(pa)] + files)
    assert overlay(align, seqs) == want


def test_glue_parity(tmp_path):
    """Glue over a descending-ordered stream of contig-vs-finished
    2-row XMFA alignments, with a genuine overlap and a gap."""
    rng = np.random.default_rng(7)
    finished = _rand_seq(rng, 1200)

    def section(b1, e1, strand):
        seg = finished[b1 - 1:e1]
        rows = []
        other = []
        for c in seg:
            if rng.random() < 0.05:
                rows.append(c)
                other.append("-")
            elif rng.random() < 0.05:
                rows.append("-")
                other.append("ACGT"[rng.integers(0, 4)])
            else:
                rows.append(c)
                other.append(c if rng.random() < 0.9
                             else "ACGT"[rng.integers(0, 4)])
        r0 = "".join(rows)
        r1 = "".join(other)
        n1 = sum(1 for c in r1 if c.isalpha())
        return ("> 0:%d-%d + (zero)\n" % (b1, e1)
                + "\n".join(r0[i:i + 60] for i in range(0, len(r0), 60))
                + "\n>1:1-%d %s (one)\n" % (n1, strand)
                + "\n".join(r1[i:i + 60] for i in range(0, len(r1), 60))
                + "\n")

    # Glue expects XMFA headers `>id:start-end dir`; descending order
    # along the finished sequence, '='-separated sections
    text = (section(801, 1150, "+") + "=\n"
            + section(401, 900, "-") + "=\n"   # overlaps previous head
            + section(60, 340, "+") + "=\n")   # gap (negative overlap)
    text = text.replace("> 0:", ">0:")
    p = tmp_path / "stream.mfa"
    p.write_text(text)
    info_path = tmp_path / "info.txt"
    r = subprocess.run([os.path.join(UTILS, "Glue"), str(p),
                        str(info_path)], capture_output=True, timeout=60)
    assert r.returncode == 0, r.stderr[-500:]
    want_stdout = r.stdout.decode("latin-1")
    want_info = info_path.read_text()
    got_stdout, got_info = glue(text)
    assert got_stdout == want_stdout
    assert got_info == want_info


LAGAN_BUILD = os.path.join(REPO, ".lagan_build")


def test_draft_merge_parity_vs_cmerge2(tmp_path):
    """draft_merge vs the reference cmerge2.pl on identical inputs:
    merged FASTA and minfo byte-identical.  Exercises the overlap path
    (rechaos + getoverlap + cextract splicing), the no-overlap padding
    path, and an rc-named contig."""
    from sibelia_tpu.align.draft import PlacedContig, draft_merge
    from sibelia_tpu.align.lagan_exact import available, lagan_pl_mfa
    from sibelia_tpu.align.toolkit import reverse_complement_fasta
    if not available() or not os.path.exists(
            os.path.join(LAGAN_BUILD, "rechaos.pl")):
        pytest.skip("oracle LAGAN tree unavailable")

    rng = np.random.default_rng(11)
    finished = _rand_seq(rng, 4000)

    def mutate(s):
        out = list(s)
        for p in rng.integers(0, len(s), size=len(s) // 150):
            out[p] = "ACGT"[rng.integers(0, 4)]
        return "".join(out)

    segs = [(0, 1500, False), (1300, 2800, True), (3100, 4000, False)]
    contigs = []
    for i, (a, b, is_rc) in enumerate(segs):
        seq = mutate(finished[a:b])
        name = "c%d" % (i + 1)
        text = _mfa([(">" + name, seq)])
        if is_rc:
            text = reverse_complement_fasta(text)
        fname = name + (".rc" if is_rc else "")
        mfa = lagan_pl_mfa(finished.encode(), "finished",
                           "".join(c for c in text.split("\n", 1)[1]
                                   if not c.isspace()).encode(), fname)
        contigs.append((fname, text, mfa, a + 1, b, 1000 * (i + 1), is_rc))

    # oracle setup
    work = tmp_path
    (work / "finished.fa").write_text(_mfa([(">finished", finished)]))
    (work / "contigs.fa").write_text("".join(t for (_, t, _, _, _, _, _)
                                             in contigs))
    pid_dir = work / "piddir"
    pid_dir.mkdir()
    draft_lines = ["Draft Ordering\n", "--------------\n", "\n"]
    placed = []
    for i, (fname, text, mfa, b1, e1, score, is_rc) in enumerate(contigs):
        (work / fname).write_text(text)
        (work / (fname + ".masked")).write_text(text)
        (work / (fname + ".mfa")).write_text(mfa)
        draft_lines.append(
            "%s.mfa --> (%d %d) score=%d, offset=(0 0), index=%d\n"
            % (fname, b1, e1, score, i + 1))
        placed.append(PlacedContig(
            contig_text=text, mfa_text=mfa, num=i + 1, seq1_begin=b1,
            seq1_end=e1, score=score, s1shift=0, s2shift=0, is_rc=is_rc))
    (work / "draft").write_text("".join(draft_lines))

    env = dict(os.environ)
    env["LAGAN_DIR"] = LAGAN_BUILD
    r = subprocess.run(
        ["perl", os.path.join(LAGAN_BUILD, "utils", "cmerge2.pl"),
         "finished.fa", "contigs.fa", "draft", "out.fa",
         "-skipfr", "piddir"],
        cwd=str(work), env=env, capture_output=True, text=True,
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    want_merged = (work / "out.fa").read_text()
    want_minfo = (pid_dir / "minfo").read_text()

    got_merged, got_minfo = draft_merge(placed)
    assert got_merged == want_merged
    assert got_minfo == want_minfo


def test_draft_assemble_end_to_end():
    """draft.pl-equivalent flow: strand choice, escalating-cutoff
    ordering, merge.  Self-consistency: every contig placed, the rc
    contig detected as -, merged sequence covers the contig letters."""
    from sibelia_tpu.align.draft import draft_assemble
    from sibelia_tpu.align.lagan_exact import available
    from sibelia_tpu.align.toolkit import reverse_complement_fasta
    if not available():
        pytest.skip("native LAGAN engine unavailable")
    rng = np.random.default_rng(13)
    finished = _rand_seq(rng, 3000)

    def mutate(s):
        out = list(s)
        for p in rng.integers(0, len(s), size=len(s) // 200):
            out[p] = "ACGT"[rng.integers(0, 4)]
        return "".join(out)

    c1 = _mfa([(">c1", mutate(finished[0:1200]))])
    c2 = reverse_complement_fasta(_mfa([(">c2", mutate(finished[1000:2100]))]))
    c3 = _mfa([(">c3", mutate(finished[2300:3000]))])
    res = draft_assemble(_mfa([(">finished", finished)]), c1 + c2 + c3,
                         cons_rate=65)
    assert res["merged"] is not None
    assert res["skipped"] == []
    assert len(res["draft_lines"]) == 3
    # the rc contig must have been flipped to align forward
    assert any(".rc" in ln for ln in res["draft_lines"])
    # minfo has one 2-line entry per contig
    assert res["minfo"].count("\n") == 6
    # merged holds the contig content: at least the non-overlapped bulk
    merged_letters = sum(1 for c in res["merged"] if c.isalpha())
    assert merged_letters > 2500
