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
                  -> seq_merge / glue / get_overlap / cextract / cstat /
                     get_contig_pos / overlay below, byte-exact vs the
                     rebuilt binaries (tests/test_toolkit_draft.py);
                     the draft.pl / cmerge2.pl flows that drive them
                     live in align/draft.py (draft_assemble /
                     draft_merge, the latter differential-tested
                     against the reference cmerge2.pl).
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


# ---------------------------------------------------------------------------
# Draft-assembly glue utils (the formerly-dispositioned seven).
# Text-in/text-out twins of the reference binaries, byte-exact including
# formatting quirks (differential tests: tests/test_toolkit_draft.py).
# ---------------------------------------------------------------------------


def seq_merge(texts: list[str]) -> str:
    """seqmerge.c: concatenate the FIRST record of each file; the first
    file's header line is kept verbatim; 60-column output with a global
    column counter.  Reference quirk preserved: the trailing-newline
    guard is `written ^ 60 != 0`, which C parses as `written ^ (60 != 0)`
    — a newline is appended unless exactly one char was written
    (seqmerge.c:33)."""
    out = []
    written = 0
    for fi, text in enumerate(texts):
        nl = text.find("\n")
        header = text if nl < 0 else text[:nl + 1]
        body = "" if nl < 0 else text[nl + 1:]
        if fi == 0:
            out.append(header[:1024])
        for ch in body:
            if ch == ">":
                break
            if ch.isalpha() or ch in ".-":
                out.append(ch)
                written += 1
                if written % 60 == 0:
                    out.append("\n")
    if (written ^ 1) != 0:
        out.append("\n")
    return "".join(out)


_OVL_RE = re.compile(
    r"\(\s*(-?\d+)\s+(-?\d+)\s*\)=\(\s*(-?\d+)\s+(-?\d+)\s*\)\s+\S+")


def get_overlap(anchors_text: str) -> str:
    """getoverlap.c: min/max over the hit ranges of a chaos/rechaos
    anchor file; `-1 -1 -1 -1` when no line parses."""
    b1 = b2 = 100000000
    e1 = e2 = -100000000
    n = 0
    for line in anchors_text.splitlines():
        m = _OVL_RE.match(line.strip())
        if not m:
            # fscanf would stop making progress here; stop like the
            # reference effectively does on well-formed inputs
            if line.strip():
                break
            continue
        a, b, c, d = (int(x) for x in m.groups())
        b1 = min(b1, a)
        e1 = max(e1, b)
        b2 = min(b2, c)
        e2 = max(e2, d)
        n += 1
    if n == 0:
        return "-1 -1 -1 -1\n"
    return "%d %d %d %d\n" % (b1, e1, b2, e2)


def _read_mfa_columns(text: str):
    """readfile() of cextract.c/getcontigpos.c: first line is the kept
    `name` (verbatim, with newline); every record must have the same
    letter/./- length as the first."""
    nl = text.find("\n")
    name = text if nl < 0 else text[:nl + 1]
    rows = []
    cur = None
    in_header = False
    for i, ch in enumerate(text):
        if ch == ">" and (i == 0 or text[i - 1] == "\n"):
            cur = []
            rows.append(cur)
            in_header = True
            continue
        if in_header:
            if ch == "\n":
                in_header = False
            continue
        if cur is not None and (ch.isalpha() or ch in ".-"):
            cur.append(ch)
    rows = ["".join(r) for r in rows]
    if rows:
        assert all(len(r) == len(rows[0]) for r in rows), \
            "sequences of different lengths"
    return name, rows


def get_contig_pos(mfa_text: str, finish: int) -> str:
    """getcontigpos.c: walk the 2-row alignment; when the row-0 letter
    count reaches `finish`, print the row-1 letter count (empty output
    if never reached)."""
    _, rows = _read_mfa_columns(mfa_text)
    pos = pos2 = 0
    for i in range(len(rows[0]) if rows else 0):
        if pos > finish:
            break
        if rows[0][i].isalpha():
            pos += 1
        if rows[1][i].isalpha():
            pos2 += 1
        if pos == finish:
            return "%d\n" % pos2
    return ""


def cextract(mfa_text: str, begin: int, finish: int, seq_idx: int,
             seq_ext: int, subst_text: str | None = None) -> str:
    """cextract.c: emit seq_ext's letters/'.' at columns where
    seq_idx's letter count lies in [begin, finish]; with `-subst`, chars
    come from the substitute file's first record indexed by the GLOBAL
    count of seq_ext letter/'.' columns.  Header = the file's first
    line, verbatim."""
    name, rows = _read_mfa_columns(mfa_text)
    rows2 = None
    if subst_text is not None:
        _, rows2 = _read_mfa_columns(subst_text)
    out = [name]
    pos = written = j = 0
    for i in range(len(rows[seq_idx])):
        if pos > finish:
            break
        if rows[seq_idx][i].isalpha():
            pos += 1
        c = rows[seq_ext][i]
        if c.isalpha() or c == ".":
            if begin <= pos <= finish:
                out.append(c if rows2 is None else rows2[0][j])
                written += 1
                if written % 60 == 0:
                    out.append("\n")
            j += 1
    if written % 60 != 0:
        out.append("\n")
    return "".join(out)


_CSTAT_ALPHA = "ATCGN-"


def cstat(mfa_text: str, cutoff: int, window: int,
          s1shift: int = 0, s2shift: int = 0) -> str:
    """cstat.c: sliding-window pairwise conservation regions over a
    multi-fasta alignment; prints the total covered length then each
    region's alignment range and per-sequence letter ranges (the
    reference's >2-sequence branch repeats sequence 0's range — quirk
    preserved)."""
    # readMultial: counts per column per class + non-gap bitmask
    recs = []
    cur = None
    for i, ch in enumerate(mfa_text):
        if ch == ">" and (i == 0 or mfa_text[i - 1] == "\n"):
            cur = ["", True]  # (chars, in_header)
            recs.append(cur)
            continue
        if cur is None:
            continue
        if cur[1]:
            if ch == "\n":
                cur[1] = False
            continue
        if not ch.isspace():
            cur[0] += ch.upper()
    if not recs:
        return "0\n"
    length = len(recs[0][0])
    numseq = len(recs)
    cnts = [[0] * length for _ in range(6)]
    algn = [0] * length
    for si, (chars, _) in enumerate(recs):
        assert len(chars) == length, "Sequence of different lengths"
        for i, c in enumerate(chars):
            if c not in _CSTAT_ALPHA:
                c = "N"
            h = _CSTAT_ALPHA.index(c)
            cnts[h][i] += 1
            if h != 5:
                algn[i] |= 1 << si

    def get_score(i):
        return ((cnts[0][i] * (cnts[0][i] - 1))
                + (cnts[1][i] * (cnts[1][i] - 1))
                + (cnts[2][i] * (cnts[2][i] - 1))
                + (cnts[3][i] * (cnts[3][i] - 1))) // 2

    numpairs = numseq * (numseq - 1) // 2
    window = min(window, length)
    first, last = [], []
    runstart = -1
    score = sum(get_score(i) for i in range(window))
    if score * 100 >= window * numpairs * cutoff:
        runstart = 0
    for i in range(1, length - window + 1):
        score += get_score(i + window - 1) - get_score(i - 1)
        if score * 100 >= window * numpairs * cutoff:
            if runstart == -1:
                if first and last[-1] >= i:
                    runstart = first.pop()
                    last.pop()
                else:
                    runstart = i
        elif runstart >= 0:
            first.append(runstart)
            last.append(i + window - 1)
            runstart = -1
    if runstart >= 0:
        first.append(runstart)
        last.append(length - 1)

    out = ["%d\n" % sum(b - a for a, b in zip(first, last))]
    s = e = 0
    start = [0] * numseq
    end = [0] * numseq

    def skipto(trgt, i, pos):
        while i < trgt:
            for j in range(numseq):
                pos[j] += 1 if (algn[i] >> j) & 1 else 0
            i += 1
        return i

    for a, b in zip(first, last):
        s = skipto(a, s, start)
        e = skipto(b, e, end)
        out.append("(%d %d) --> " % (a + s1shift, b + s1shift))
        if numseq == 2:
            out.append("(%d %d), " % (start[0] + s1shift, end[0] + s1shift))
            out.append("(%d %d)\n" % (start[1] + s2shift, end[1] + s2shift))
        else:
            for j in range(numseq):
                out.append("(%d %d)%s" % (start[0], end[0],
                                          "\n" if j == numseq - 1 else ", "))
    return "".join(out)


_OVERLAY_VALID = "ACGTN-"


def _overlay_read_records(text: str):
    """read_align() of overlay.c: per record (header-without-newline,
    chars) with invalid chars (case-insensitively outside ACGTN-)
    replaced by 'N', case otherwise preserved."""
    recs = []
    cur = None
    in_header = False
    header: list[str] = []
    for i, ch in enumerate(text):
        if ch == ">" and (i == 0 or text[i - 1] == "\n"):
            in_header = True
            header = [">"]
            cur = []
            recs.append([header, cur])
            continue
        if cur is None:
            continue
        if in_header:
            if ch == "\n":
                in_header = False
            else:
                header.append(ch)
            continue
        if not ch.isspace():
            if ch.upper() not in _OVERLAY_VALID:
                ch = "N"
            cur.append(ch)
    return [("".join(h), c) for h, c in recs]


def overlay(align_text: str, seq_texts: list[str]) -> str:
    """overlay.c: replace every non-gap char of the alignment rows with
    the raw-sequence chars, matched by header-prefix; 60-column MFA
    output (newline BEFORE each 60-char row, as the reference prints)."""
    aligns = _overlay_read_records(align_text)
    overlays: dict[int, list[str]] = {}
    for text in seq_texts:
        for header, chars in _overlay_read_records(text):
            for i, (ah, _) in enumerate(aligns):
                if ah.startswith(header):
                    overlays[i] = chars
                    break
            else:
                raise ValueError("seq %s not found!" % header)
    out = []
    for i, (header, arow) in enumerate(aligns):
        ov = overlays[i]
        pos = 0
        merged = []
        for c in arow:
            if c != "-":
                merged.append(ov[pos])
                pos += 1
            else:
                merged.append(c)
        out.append(header)
        for ci, c in enumerate(merged):
            if ci % 60 == 0:
                out.append("\n")
            out.append(c)
        out.append("\n")
    return "".join(out)


# --- Glue.cpp -------------------------------------------------------------

_XMFA_HDR = re.compile(r">(\d+):(\d+)-(\d+) (\S)(?:\s+(\S+))?")


def _glue_sections(text: str):
    """Split the concatenated-MFA stream into '='-separated sections of
    (start, end, strand, chars) records (Sequence.h header parsing:
    XMFA `>id:start-end {+,-} [comment]`, else MFA defaults)."""
    sections: list[list[tuple[int, int, str, str]]] = [[]]
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("="):
            sections.append([])
            i += 1
            continue
        if ln.startswith(">"):
            m = _XMFA_HDR.match(ln)
            chars = []
            i += 1
            while i < len(lines) and not lines[i].startswith(">") \
                    and not lines[i].startswith("="):
                chars.append("".join(
                    c.upper() for c in lines[i] if not c.isspace()))
                i += 1
            data = "".join(chars)
            if not data:
                continue
            if m:
                start, end, strand = int(m.group(2)), int(m.group(3)), \
                    m.group(4)
            else:
                start, end, strand = 1, len(data), "+"
            sections[-1].append((start, end, strand, data))
            continue
        i += 1
    return [s for s in sections if s] or [[]]


def _glue_find_split(data1: str, data2: str, overlap: int,
                     data1a: str, data2a: str) -> int:
    """findSplit (Glue.cpp): best split of `overlap` letters between the
    tail of the new alignment and the head of the merged one."""
    offs1 = len(data1)
    num1 = 0
    for i in range(len(data1) - 1, -1, -1):
        if overlap == 0:
            break
        if data1[i].isalpha():
            num1 += 1
        if num1 == overlap:
            offs1 = i
            break
    offs2 = 0
    num1 = 0
    for i in range(len(data2)):
        if overlap == 0:
            break
        if data2[i].isalpha():
            num1 += 1
        if num1 == overlap:
            offs2 = i
            break
    score1 = [0] * (overlap + 1)
    score2 = [0] * (overlap + 1)
    score = 0
    ct = 0
    i = 0
    while ct < overlap:
        if data1[i + offs1].isalpha():
            ct += 1
        score += 18 if data1[i + offs1] == data1a[i + offs1] else -8
        score1[ct] = score
        i += 1
    score = 0
    ct = 0
    i = 0
    while ct < overlap:
        if data2[offs2 - i].isalpha():
            ct += 1
        score += 18 if data2[offs2 - i] == data2a[offs2 - i] else -8
        score2[ct] = score
        i += 1
    best = -1000000
    j = 0
    for i in range(overlap + 1):
        if score1[i] + score2[overlap - i] > best:
            best = score1[i] + score2[overlap - i]
            j = i
    return j


def _glue_chop_left(data1: list, data2: list, num: int, in_align: bool):
    here = -1
    if in_align:
        here = num - 1
    else:
        num1 = 0
        for i in range(len(data1)):
            if num == 0:
                break
            if isinstance(data1[i], str) and data1[i].isalpha():
                num1 += 1
            if num1 == num:
                here = i
                break
    chopped = here + 1
    del data1[:chopped]
    del data2[:chopped]
    return chopped


def _glue_chop_right(data1: list, data2: list, num: int, in_align: bool):
    here = len(data1)
    if in_align:
        here = len(data1) - num
    else:
        num1 = 0
        for i in range(len(data1) - 1, -1, -1):
            if num == 0:
                break
            if isinstance(data1[i], str) and data1[i].isalpha():
                num1 += 1
            if num1 == num:
                here = i
                break
    ret = len(data1) - here
    del data1[here:]
    del data2[here:]
    return ret


def glue(mfa_stream_text: str) -> tuple[str, str]:
    """Glue.cpp main: merge a stream of 2-row contig-vs-finished
    alignments (ordered descending along the finished sequence, as
    draft.pl emits them) into one gapped pair, overlaps resolved by
    findSplit; returns (merged MFA for stdout, per-contig Align table
    for the info file).  CNTG_BRK_N and the final left padding follow
    Glue.cpp:450-470."""
    CNTG_BRK_N = 50
    INF = 2000000000
    merged1: list[str] = []
    merged2: list[str] = []
    m1lab: list[int] = []
    m2lab: list[int] = []
    strand = ["?"]
    begin1 = end1 = 1
    align_num = 0
    for section in _glue_sections(mfa_stream_text):
        if len(section) != 2:
            break
        align_num += 1
        (b1, e1, _, d0), (_, _, str1, d1) = section
        strand.append(str1)
        if align_num == 1:
            begin1, end1 = b1, e1
            merged1 = list(d0)
            merged2 = list(d1)
            m1lab = [1] * len(merged1)
            m2lab = [1] * len(merged2)
            continue
        seqs0 = list(d0)
        seqs1 = list(d1)
        s0lab = [align_num] * len(seqs0)
        s1lab = [align_num] * len(seqs1)
        overlap = e1 - begin1 + 1
        if overlap > 0:
            num_left = _glue_find_split("".join(seqs0), "".join(merged1),
                                        overlap, "".join(seqs1),
                                        "".join(merged2))
            num_right = overlap - num_left
            chopped_left = _glue_chop_left(merged1, merged2, num_left, False)
            chopped_right = _glue_chop_right(seqs0, seqs1, num_right, False)
            _glue_chop_left(m1lab, m2lab, chopped_left, True)
            _glue_chop_right(s0lab, s1lab, chopped_right, True)
        elif overlap < 0:
            merged1 = ["N"] * (-overlap) + merged1
            merged2 = ["N"] * (-overlap) + merged2
            m1lab = [0] * (-overlap) + m1lab
            m2lab = [0] * (-overlap) + m2lab
        merged1 = seqs0 + merged1
        merged2 = seqs1 + merged2
        m1lab = s0lab + m1lab
        m2lab = s1lab + m2lab
        begin1 = b1

    pad1 = ["N"] * (begin1 - 1)
    pad2 = ["-"] * (begin1 - 1)
    for i in range(min(len(pad2), CNTG_BRK_N)):
        pad2[i] = "N"
    merged1 = pad1 + merged1
    merged2 = pad2 + merged2
    m1lab = [0] * (begin1 - 1) + m1lab
    m2lab = [0] * (begin1 - 1) + m2lab

    info = []
    for i in range(1, align_num + 1):
        min1 = min2 = INF
        max1 = max2 = 0
        pos1 = pos2 = 0
        for j in range(len(m1lab)):
            if merged1[j].isalpha():
                pos1 += 1
            if merged2[j].isalpha():
                pos2 += 1
            if m1lab[j] == i:
                min1 = min(min1, pos1)
                max1 = max(max1, pos1)
            if m2lab[j] == i:
                min2 = min(min2, pos2)
                max2 = max(max2, pos2)
        info.append("Align %d\n" % i)
        if min1 == INF:
            info.append("%d was cropped completely.\n" % i)
        else:
            info.append("%d %d %d 0 0 0 0 %s 0 %d %d\n"
                        % (i, min1, max1, strand[i], min2, max2))

    def print_mfa(data, comment):
        out = [">" + comment + "\n"]
        written = 0
        for c in data:
            out.append(c)
            written += 1
            if written % 60 == 0:
                out.append("\n")
        if written % 60 != 0:
            out.append("\n")
        return "".join(out)

    stdout = print_mfa(merged1, "first") + print_mfa(merged2, "second")
    return stdout, "".join(info)
