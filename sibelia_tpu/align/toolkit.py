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
  seqmerge, Glue, getoverlap, cextract, cstat, contigorder,
  scorecontigs, getcontigpos, overlay
                  -> draft-assembly gluing pipeline (draft.pl); unused
                     by C-Sibelia.  Their inputs (pairwise contig
                     alignments + scores) are produced by
                     align/lagan_exact.py and score_alignment; the glue
                     heuristics themselves are out of scope until a
                     draft-assembly workflow needs them.
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
