"""Draft-assembly pipeline: draft.pl / cmerge2.pl equivalents.

The reference glues a draft assembly's contigs onto a finished genome
with a Perl pipeline (reference: src/lagan/src/utils/draft.pl and
src/lagan/src/utils/cmerge2.pl): per-contig LAGAN alignments on both
strands, strand choice by scorealign, ordering via scorecontigs +
contigorder with an escalating conservation cutoff, then a merge pass
that detects overlaps between consecutive placed contigs with a
single-level rechaos and splices them with seqmerge/cextract.

``draft_merge`` is a byte-exact cmerge2.pl twin over in-memory texts
(differential test: tests/test_toolkit_draft.py::test_draft_merge_*);
``draft_assemble`` is the draft.pl-equivalent end-to-end flow.  One
documented deviation in draft_assemble: contig alignments use our
standard lagan.pl recursion schedule rather than draft.pl's custom
``-recurse``/-usebounds invocation — the flow, scoring, ordering, and
merge arithmetic are the reference's.
"""
from __future__ import annotations

from dataclasses import dataclass

from .lagan_exact import lagan_pl_mfa, rechaos
from .toolkit import (cextract, contig_order, get_contig_pos, get_length,
                      get_overlap, reverse_complement_fasta,
                      score_alignment, score_contigs, seq_merge)

PADDING_TEXT = ">padding\n" + "N" * 20 + "." + "N" * 20 + "\n"

# cmerge2.pl's rechaos schedule for contig-overlap detection
_CMERGE_LEVELS = [(12, 0, 40, 0)]


@dataclass
class PlacedContig:
    """One line of the draft ordering (cmerge2.pl's parsed draft file)."""
    contig_text: str   # contig FASTA (rc'd when the - strand won)
    mfa_text: str      # contig-vs-finished alignment (for getcontigpos)
    num: int           # original contig index (1-based)
    seq1_begin: int    # placement range on the finished sequence
    seq1_end: int
    score: int
    s1shift: int
    s2shift: int
    is_rc: bool


def _first_record_seq(text: str) -> bytes:
    """First record's letters (the inputs rechaos.pl reads)."""
    out = []
    in_header = True
    for i, ch in enumerate(text):
        if in_header:
            if ch == "\n":
                in_header = False
            continue
        if ch == ">":
            break
        if not ch.isspace():
            out.append(ch)
    return "".join(out).encode("latin-1")


def _first_line(text: str) -> str:
    nl = text.find("\n")
    return text if nl < 0 else text[:nl]


def draft_merge(contigs: list[PlacedContig]) -> tuple[str, str]:
    """cmerge2.pl twin: returns (merged FASTA text, minfo text).

    Mirrors the reference's control flow exactly — the padding record,
    the seqmerge-based splicing, single-level rechaos + getoverlap
    between consecutive contigs, cextract cropping, the persistent
    `overlaplength` variable (uninitialized-on-first-use in the Perl),
    and the minfo line format (cmerge2.pl:104-199)."""
    if not contigs:
        return seq_merge([">merged\n", PADDING_TEXT]), ""
    pad_length = get_length(PADDING_TEXT)
    n = len(contigs)
    seq2_begin = [0] * n
    seq2_end = [0] * n
    for i, c in enumerate(contigs):
        t = c.seq1_begin - c.s1shift
        pos = get_contig_pos(c.mfa_text, t)
        seq2_begin[i] = (int(pos) if pos else 0) + c.s2shift
        t = c.seq1_end - c.s1shift
        pos = get_contig_pos(c.mfa_text, t)
        seq2_end[i] = (int(pos) if pos else 0) + c.s2shift

    merged = seq_merge([">merged\n", PADDING_TEXT])
    contig_start = [0] * n
    contig_end = [0] * n
    start_chop = [0] * n
    end_chop = [0] * n
    contig_start[0] = 1
    current = contigs[0].contig_text
    overlap_length = 0  # perl: persists across iterations, 0 before set
    minfo = []

    def minfo_line(i):
        d = "-" if contigs[i].is_rc else "+"
        header = _first_line(contigs[i].contig_text)[1:]
        return ("%s\n%d %d %d %d %d %d %d %s %d %d %d\n"
                % (header, contigs[i].num, contigs[i].seq1_begin,
                   contigs[i].seq1_end, contig_start[i], contig_end[i],
                   start_chop[i], end_chop[i], d, contigs[i].score,
                   seq2_begin[i], seq2_end[i]))

    for i in range(1, n):
        anchors = rechaos(_first_record_seq(current), "current",
                          _first_record_seq(contigs[i].contig_text),
                          "next", gfc=False, levels=_CMERGE_LEVELS)
        m = get_overlap(anchors).split()
        rb1, re1, rb2, _re2 = (int(x) for x in m)
        this_length = get_length(current)
        next_length = get_length(contigs[i].contig_text)
        if rb1 == -1 and re1 == -1:
            merged = seq_merge([merged, current, PADDING_TEXT])
            current = contigs[i].contig_text
            contig_end[i - 1] = contig_start[i - 1] + this_length - 1
            contig_start[i] = contig_end[i - 1] + pad_length + 1
            end_chop[i - 1] = 0
            start_chop[i] = 0
        else:
            j = rb1 - 1
            if j > 0:
                overlap_text = cextract(current, 1, j, 0, 0)
                overlap_length = get_length(overlap_text)
                merged = seq_merge([merged, overlap_text])
            current = cextract(contigs[i].contig_text, rb2, next_length,
                               0, 0)
            contig_end[i - 1] = contig_start[i - 1] + overlap_length - 1
            contig_start[i] = contig_end[i - 1] + 1
            end_chop[i - 1] = this_length - re1
            start_chop[i] = rb2 - 1
        minfo.append(minfo_line(i - 1))

    this_length = get_length(contigs[n - 1].contig_text
                             if n == 1 else current)
    contig_end[n - 1] = contig_start[n - 1] + this_length - 1
    end_chop[n - 1] = 0
    merged = seq_merge([merged, current, PADDING_TEXT])
    minfo.append(minfo_line(n - 1))
    return merged, "".join(minfo)


def draft_assemble(finished_text: str, contigs_text: str,
                   cons_rate: int = 65) -> dict:
    """draft.pl-equivalent flow: per-contig two-strand alignment, strand
    choice by scorealign (draft.pl:150-185), scorecontigs+contigorder
    ordering with the escalating cutoff loop (draft.pl:193-210), then
    the cmerge2 merge.  Returns {merged, minfo, draft_lines, skipped}."""
    finished = _first_record_seq(finished_text)
    # mextract: split the multi-fasta into single-record texts
    contig_texts = []
    cur: list[str] = []
    for line in contigs_text.split("\n"):
        if line.startswith(">"):
            if cur:
                contig_texts.append("\n".join(cur) + "\n")
            cur = [line]
        elif cur is not None and line:
            cur.append(line)
    if cur:
        contig_texts.append("\n".join(cur) + "\n")

    chosen = []  # (index, is_rc, mfa_text, score, s1shift, s2shift)
    skipped = []
    for idx, ctext in enumerate(contig_texts):
        rc_text = reverse_complement_fasta(ctext)
        results = {}
        for is_rc, text in ((False, ctext), (True, rc_text)):
            seq = _first_record_seq(text)
            # draft.pl's s1/s2 shifts come from its -usebounds clipping
            # (getbounds over anchs.final, draft.pl:118-124); our lagan
            # driver aligns the full finished sequence, so the alignment
            # rows are already in global coordinates and the shifts are
            # identically zero
            s1shift = 0
            s2shift = 0
            mfa = lagan_pl_mfa(finished, "finished", seq, "contig")
            rows = []
            row: list[str] = []
            for line in mfa.split("\n"):
                if line.startswith(">"):
                    if row:
                        rows.append("".join(row))
                        row = []
                elif line:
                    row.append(line)
            if row:
                rows.append("".join(row))
            sc = score_alignment(rows, cons_rate)
            results[is_rc] = (sc, mfa, s1shift, s2shift, text)
        fscore = results[False][0]
        bscore = results[True][0]
        if fscore <= 0 and bscore <= 0:
            skipped.append(idx)
            continue
        is_rc = bscore > fscore
        sc, mfa, s1, s2, text = results[is_rc]
        chosen.append((idx, is_rc, mfa, sc, s1, s2, text))

    order_lines = None
    used = None
    for cutoff in range(cons_rate, 100):
        alignments = []
        offsets = []
        for (_idx, _rc, mfa, _sc, s1, _s2, _t) in chosen:
            rows = []
            row = []
            for line in mfa.split("\n"):
                if line.startswith(">"):
                    if row:
                        rows.append("".join(row))
                        row = []
                elif line:
                    row.append(line)
            if row:
                rows.append("".join(row))
            alignments.append((rows[0], rows[1]))
            offsets.append(s1)
        table, used = score_contigs(alignments, offsets, len(finished),
                                    cutoff)
        if table.startswith("numContigs = 0"):
            continue
        corder = contig_order(table)
        if not corder.startswith("ordering failed"):
            order_lines = corder
            break
    if order_lines is None:
        return {"merged": None, "minfo": None, "draft_lines": None,
                "skipped": skipped}

    import re as _re
    placed = []
    draft_lines = []
    for ln in order_lines.splitlines():
        m = _re.match(r"(\d+) --> \((\d+) (\d+)\) (\S+)", ln)
        if not m:
            continue
        ci = used[int(m.group(1))]
        (_idx, is_rc, mfa, sc, s1, s2, text) = chosen[ci]
        draft_lines.append("%s --> (%s %s) score=%s, offset=(%d %d), "
                           "index=%d" % ("contig%d%s" % (_idx + 1,
                                                         ".rc" if is_rc
                                                         else ""),
                                         m.group(2), m.group(3),
                                         m.group(4), s1, s2, _idx + 1))
        placed.append(PlacedContig(
            contig_text=text, mfa_text=mfa, num=_idx + 1,
            seq1_begin=int(m.group(2)), seq1_end=int(m.group(3)),
            score=int(float(m.group(4))), s1shift=s1, s2shift=s2,
            is_rc=is_rc))
    merged, minfo = draft_merge(placed)
    return {"merged": merged, "minfo": minfo, "draft_lines": draft_lines,
            "skipped": skipped}
