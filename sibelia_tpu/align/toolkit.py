"""LAGAN toolkit utilities as API functions.

The reference ships 17 small helper binaries under src/lagan/utils (see
src/lagan/src/Makefile:6).  C-Sibelia itself invokes none of them; they
exist for hand-driven alignment workflows and the draft-assembly gluing
pipeline (draft.pl).  This module demonstrates how the in-process
aligner API subsumes them: the generally useful ones are implemented
here with reference-faithful semantics (cited per function), and the
rest are superseded by design — our engine passes alignments in memory,
so the binary intermediate format and its converters have nothing to
convert.

Disposition of every util (reference: src/lagan/src/utils/):

  rc              -> reverse_complement_fasta (rc.c)
  getlength       -> get_length (getlength.c)
  getbounds       -> get_bounds (getbounds.c, quirks preserved)
  scorealign      -> score_alignment / conserved_columns (scorealign.c)
  fa2xfa          -> superseded: variants/caller.py writes XMFA directly
  bin2mf, bin2bl  -> superseded: kernels/order_device.py and the native
                     order emit -mfa text directly; the binary align
                     format never exists in this framework
  scorecontigs    -> score_contigs (scorecontigs.c: two-state
                     conservation DP per contig alignment + the
                     genome-range score table)
  contigorder     -> contig_order (contigorder.c: overlap-group flood
                     fill + subset DP placement over hit ranges)
  seqmerge, Glue, getoverlap, cextract, cstat, getcontigpos, overlay
                  -> remaining draft-assembly glue (draft.pl steps that
                     splice FASTA text around the placements); unused
                     by C-Sibelia.  Their inputs (pairwise contig
                     alignments, the score table, the placement list)
                     are produced by align/lagan_exact.py,
                     score_contigs and contig_order above; the
                     remaining text-splicing steps are out of scope
                     until a draft-assembly workflow needs them.
  dotplot         -> superseded: anchor hit lists are returned as text
                     by lagan_exact.rechaos and plot trivially
"""
from __future__ import annotations

import math
import re

_RC = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N",
       "a": "t", "t": "a", "c": "g", "g": "c", "n": "n"}


def reverse_complement_fasta(text: str) -> str:
    """rc.c semantics: first record only, header preserved verbatim,
    unknown chars kept as-is, 60-column output."""
    lines = text.split("\n")
    if not lines or not lines[0].startswith(">"):
        raise ValueError("File is not in FASTA format!!")
    header = lines[0]
    body = []
    for ln in lines[1:]:
        if ln.startswith(">"):
            break
        body.append(ln.strip())
    seq = "".join(_RC.get(c, c) for c in "".join(body))[::-1]
    out = [header]
    for i in range(0, len(seq), 60):
        out.append(seq[i:i + 60])
    return "\n".join(out) + "\n"


def get_length(fasta_text: str) -> int:
    """getlength.c / getbounds.c:getLength: alphabetic chars and '.' of
    the FIRST record."""
    n = 0
    first = True
    for ln in fasta_text.split("\n"):
        if ln.startswith(">"):
            if not first:
                break
            first = False
            continue
        n += sum(1 for c in ln if c.isalpha() or c == ".")
    return n


_ANCHOR_LINE = re.compile(r"\((\d+) (\d+)\)=\((\d+) (\d+)\) ([0-9.eE+-]+)")


def get_bounds(anchors_text: str, len1: int, len2: int) -> str:
    """getbounds.c: the -s1/-s2 restriction line for a rechaos anchor
    list.  The reference normalizes both end margins against len2 (not
    len1) — preserved verbatim, quirk included (getbounds.c:54-55)."""
    EXPAND = 2
    hits = [(int(a), int(b), int(c), int(d))
            for a, b, c, d, _ in _ANCHOR_LINE.findall(anchors_text)]
    if not hits:
        return f"-s1 1 {len1} -s2 1 {len2}\n"
    m1b = min(h[0] for h in hits)
    m1e = len2 - max(h[1] for h in hits)
    m2b = min(h[2] for h in hits)
    m2e = len2 - max(h[3] for h in hits)
    s1b = s2b = None
    for a, b, c, d in hits:
        c1b = max(a - m2b * EXPAND, 1)
        c1e = min(b + m2e * EXPAND, len1)
        c2b = max(c - m2b * EXPAND, 1)
        c2e = min(d + m2e * EXPAND, len2)
        if s1b is None:
            s1b, s1e, s2b, s2e = c1b, c1e, c2b, c2e
        else:
            s1b, s1e = min(s1b, c1b), max(s1e, c1e)
            s2b, s2e = min(s2b, c2b), max(s2e, c2e)
    del m1b, m1e  # computed by the reference, unused in its output too
    return f"-s1 {s1b} {s1e} -s2 1 {len2}\n"


def _score_matrix(cons_rate: int):
    """scorealign.c: log-odds matrix for cons_rate >= 0, else the
    nucmatrix.txt values (lagan_common.h embeds them)."""
    if cons_rate >= 0:
        p = cons_rate / 100.0
        match = math.log(p / 0.25)
        mismatch = math.log((1 - p) / 0.75)
        m = {}
        for a in "ATCG":
            for b in "ATCG":
                m[a, b] = int(match * 100) if a == b else int(mismatch * 100)
        return m, int(-40 * match * 100), -50
    vals = {
        ("A", "A"): 91, ("A", "C"): -114, ("A", "G"): -31, ("A", "T"): -123,
        ("C", "C"): 100, ("C", "G"): -125, ("C", "T"): -31,
        ("G", "G"): 100, ("G", "T"): -114, ("T", "T"): 91,
    }
    m = {}
    for (a, b), v in vals.items():
        m[a, b] = v
        m[b, a] = v
    for a in "ACGT":
        m[a, "N"] = m["N", a] = -43
        m[a, "."] = m[".", a] = 0
    m["N", "N"] = -43
    m[".", "."] = m[".", "N"] = m["N", "."] = 0
    return m, -1500, -50


def conserved_columns(row1: str, row2: str, cons_rate: int = 70) -> int:
    """scorealign.c:scorePair — the 2-state (conserved / non-conserved)
    segmentation DP over the pairwise projection; returns the number of
    columns labeled conserved (which IS the 'score' scorealign prints,
    scorealign.c:220,137)."""
    m, gapopen, gapcont = _score_matrix(cons_rate)

    def smatch(c, d):
        if c == "-" and d == "-":
            return 0
        if c == "-" or d == "-":
            return gapcont
        return m.get((c.upper(), d.upper()), 0)

    u, v = zip(*[(a, b) for a, b in zip(row1, row2)
                 if a != "-" or b != "-"]) if row1 else ((), ())
    n = len(u)
    if n == 0:
        return 0
    CN, NC = 0, 1
    score = [[0, 0], [0, 0]]
    dad = [[0] * n, [0] * n]
    j = 0
    for i in range(n):
        cn, nc = score[CN][j], score[NC][j] + gapopen
        if cn > nc:
            score[CN][1 - j], dad[CN][i] = cn, CN
        else:
            score[CN][1 - j], dad[CN][i] = nc, NC
        score[CN][1 - j] += smatch(u[i], v[i])
        cn, nc = score[CN][j] + gapopen, score[NC][j]
        if cn > nc:
            score[NC][1 - j], dad[NC][i] = cn, CN
        else:
            score[NC][1 - j], dad[NC][i] = nc, NC
        j = 1 - j
    state = CN if score[CN][j] > score[NC][j] else NC
    count = 0
    for i in range(n - 1, -1, -1):
        if state == CN:
            count += 1
        state = dad[state][i]
    return count


def score_alignment(rows: list[str], cons_rate: int = 70) -> int:
    """scorealign.c:scoreAlign — sum of conserved-column counts over all
    row pairs."""
    total = 0
    for i in range(len(rows) - 1):
        for j in range(i + 1, len(rows)):
            total += conserved_columns(rows[i], rows[j], cons_rate)
    return total


# ---------------------------------------------------------------------------
# Draft-assembly scoring/ordering half (draft.pl steps 5-6)
# ---------------------------------------------------------------------------

def _c_div(a: int, b: int) -> int:
    """C integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _contig_penalties(cons_rate: int):
    """scorecontigs.c:main penalty table (reference:
    src/lagan/utils/scorecontigs.c:366-373)."""
    pen1_mis = _c_div(-(25 * cons_rate), 101 - cons_rate)
    return {
        "P1_MIS": pen1_mis, "P1_MTC": 25, "P1_GAP": _c_div(pen1_mis, 2),
        "P0_MIS": 0, "P0_MTC": 0, "P0_GAP": 0,
        "TO_0": -250, "TO_1": -350,
    }


def _contig_state(c: str, d: str) -> int:
    """reference: scorecontigs.c:137-141 (getstate)."""
    if c == "-" or d == "-":
        return 2
    if c == "N" or d == "N":
        return 3
    return 1 if c == d else 0


def _contig_ranges(row0: str, row1: str, cons_rate: int):
    """getranges (reference: scorecontigs.c:143-238): two-state DP over
    alignment columns (state 1 = conserved), then per-run average scores
    (C integer division) written at the ungapped positions of row0.
    Returns the int score array over row0's letters, or None when no
    column ever reaches state 1."""
    p = _contig_penalties(cons_rate)
    length = len(row0)
    seqlen = sum(1 for c in row0 if c.isalpha())
    s0 = [0] * length
    s1 = [0] * length
    tb0 = [0] * length
    tb1 = [0] * length
    for i in range(length):
        state = _contig_state(row0[i], row1[i])
        if i <= 5:
            continue
        here = (p["P0_MIS"] if state == 0 else
                p["P0_MTC"] if state == 1 else
                p["P0_GAP"] if state == 2 else 0)
        f0 = s0[i - 1] + here
        f1 = s1[i - 1] + here + p["TO_0"]
        if f0 > f1:
            s0[i], tb0[i] = f0, 0
        else:
            s0[i], tb0[i] = f1, 1
        here = (p["P1_MIS"] if state == 0 else
                p["P1_MTC"] if state == 1 else
                p["P1_GAP"] if state == 2 else 0)
        f0 = s0[i - 1] + here + p["TO_1"]
        f1 = s1[i - 1] + here
        if f0 > f1:
            s1[i], tb1[i] = f0, 0
        else:
            s1[i], tb1[i] = f1, 1
    states = [0] * length
    states[length - 1] = 0 if s0[length - 1] > s1[length - 1] else 1
    for i in range(length - 2, -1, -1):
        states[i] = (tb1 if states[i + 1] else tb0)[i + 1]
    score = [0] * seqlen
    k = 0
    used = False
    i = 0
    while i < length:
        if not states[i]:
            if row0[i].isalpha():
                score[k] = 0
                k += 1
            i += 1
            continue
        used = True
        here = 0
        letters = 0
        j = i
        while j < length and states[j]:
            if row0[j].isalpha():
                letters += 1
            st = _contig_state(row0[j], row1[j])
            here += (p["P1_MIS"] if st == 0 else
                     p["P1_MTC"] if st == 1 else
                     p["P1_GAP"] if st == 2 else 0)
            j += 1
        here = _c_div(here, letters)
        for m in range(k, k + letters):
            score[m] = here
        k += letters
        i = j
    return score if used else None


def score_contigs(alignments, offsets, seq_len: int,
                  cons_rate: int = 70):
    """scorecontigs twin (reference: src/lagan/utils/scorecontigs.c).

    alignments: [(row0, row1)] pairwise contig-anchoring alignments
    (row0 = the base-sequence slice, as draft.pl feeds it); offsets:
    base-genome offset of each row0; seq_len: ungapped base length.
    Returns (table_text, used): the contigorder input table, formatted
    byte-identically to the binary's stdout, and the indices of
    alignments that contributed (the binary's filtered contig_list)."""
    ranges = []
    offs = []
    used = []
    for i, (r0, r1) in enumerate(alignments):
        sc = _contig_ranges(r0, r1, cons_rate)
        if sc is not None:
            ranges.append(sc)
            offs.append(offsets[i])
            used.append(i)
    n = len(ranges)
    out = [f"numContigs = {n}", f"seqLen = {seq_len}"]

    def getdata(j, i):
        i -= offs[j]
        if 0 <= i < len(ranges[j]):
            return ranges[j][i]
        return 0

    def allzeroes(pos):
        return all(getdata(j, pos) == 0 for j in range(n))

    def match(a, b):
        return all((getdata(j, a) != 0) == (getdata(j, b) != 0)
                   for j in range(n))

    def emit(start, end, score):
        out.append("(%7d %7d)" % (start, end)
                   + "".join(" %7d" % s for s in score))

    score = [0] * n
    i = next((x for x in range(seq_len + 1) if not allzeroes(x)),
             seq_len + 1)
    if i > 0:
        emit(0, i - 1, score)
    start = end = i
    while i <= seq_len:
        if i != seq_len and match(start, i):
            end = i
            for j in range(n):
                score[j] += getdata(j, i)
        elif i == seq_len or not allzeroes(i):
            emit(start, end, score)
            score = [0] * n
            if end < i - 1:
                emit(end + 1, i - 1, [0] * n)
            start = end = i
        i += 1
    return "\n".join(out) + "\n", used


def contig_order(table_text: str):
    """contigorder twin (reference: src/lagan/utils/contigorder.c):
    reads the score_contigs table, flood-fills contigs into overlap
    groups, and solves each group's placement with the subset DP over
    hit ranges.  Returns the binary's stdout (lines
    'c --> (start end) score' sorted by range start, or
    'ordering failed')."""
    lines = table_text.splitlines()
    num_contigs = int(lines[0].split("=")[1])
    hits = []
    ranges = []
    for ln in lines[2:]:
        mm = re.match(r"\(\s*(-?\d+)\s+(-?\d+)\s*\)(.*)", ln)
        if not mm:
            continue
        ranges.append((int(mm.group(1)), int(mm.group(2))))
        hits.append([int(x) for x in mm.group(3).split()])
    num_hits = len(hits)

    # getLabels: flood fill over [first hit, last hit] interval overlap
    first = [-1] * num_contigs
    last = [0] * num_contigs
    for j in range(num_contigs):
        for i in range(num_hits):
            if hits[i][j] > 0:
                if first[j] == -1:
                    first[j] = i
                last[j] = i
    labels = [-1] * num_contigs
    group = 0
    for i in range(num_contigs):
        if labels[i] == -1 and first[i] != -1:
            stack = [i]
            labels[i] = group
            while stack:
                here = stack.pop()
                for t in range(num_contigs):
                    if (t != here and labels[t] == -1 and first[t] != -1
                            and not (first[here] > last[t]
                                     or last[here] < first[t])):
                        labels[t] = group
                        stack.append(t)
            group += 1

    MAX_CELLS = 100000000
    MAX_TIME = 100000 * 100000
    results = []

    for g in range(group):
        cols = [i for i in range(num_contigs) if labels[i] == g]
        ncols = len(cols)
        # makeRanges
        rfirst = [-1]
        rlast = [-1]
        for i in range(num_hits):
            for j in range(i + 1):
                if any(hits[i][c] > 0 and hits[j][c] > 0 for c in cols):
                    rfirst.append(j)
                    rlast.append(i)
        num_ranges = len(rfirst)
        num_states = 1 << ncols
        if (num_ranges * num_states > MAX_CELLS
                or num_ranges * num_states * ncols * num_ranges > MAX_TIME):
            return "ordering failed\n"
        score_of = [[0] * num_ranges for _ in range(ncols)]
        for ci in range(ncols):
            for r in range(1, num_ranges):
                score_of[ci][r] = sum(hits[x][cols[ci]]
                                      for x in range(rfirst[r],
                                                     rlast[r] + 1))
        best = [[0] * num_ranges for _ in range(num_states)]
        best_score = 0
        best_state = 0
        best_range = 0
        for r in range(1, num_ranges):
            for st in range(1, num_states):
                new_best = -1
                for ci in range(ncols):
                    if st & (1 << ci):
                        m = st - (1 << ci)
                        added = score_of[ci][r]
                        for l in range(num_ranges):
                            if rlast[l] < rfirst[r]:
                                v = best[m][l] + added
                                if v > new_best:
                                    new_best = v
                best[st][r] = new_best
                if new_best > best_score:
                    best_score = new_best
                    best_state = st
                    best_range = r
        # traceback
        state_list, range_list, score_list = [], [], []
        while best_state != 0:
            done = False
            for ci in range(ncols):
                if done:
                    break
                if best_state & (1 << ci):
                    m = best_state - (1 << ci)
                    for j in range(num_ranges):
                        if rlast[j] < rfirst[best_range]:
                            v = best[m][j] + score_of[ci][best_range]
                            if v == best[best_state][best_range]:
                                state_list.append(cols[ci])
                                range_list.append(best_range)
                                score_list.append(score_of[ci][best_range])
                                best_state = m
                                best_range = j
                                done = True
                                break
        for i in range(len(state_list) - 1, -1, -1):
            results.append((state_list[i],
                            ranges[rfirst[range_list[i]]][0],
                            ranges[rlast[range_list[i]]][1],
                            score_list[i]))

    results.sort(key=lambda r: r[1])
    return "".join("%d --> (%d %d) %d\n" % r for r in results)
