"""Supermap: piecewise-monotonic alignment map generator (Shuffle-LAGAN).

Behavioral port of the reference toolkit's supermap.pl (src/lagan/
supermap.pl, v1.50 — the driver that turns glocal chains into M1/DM/M2
region maps for slagan.pl).  The pipeline is reproduced stage for stage,
in process and without temp files:

1. scan + erode input CHAOS hits (runSLAGAN pre-scan, supermap.pl:420-455)
2. split per base-genome sequence, reorient minus rows (reprintInputHit)
3. run the glocal chaining DP per sequence (align/glocal.py stands in
   for the SLAGAN binary the Perl shells out to)
4. mark aligns present in both genomes' chains as 2M (DM), chain the
   rest monotonically per genome (chainBase1Hits / chainBase2Hits)
5. three sort+window expansion passes growing each region into its
   neighbor gaps (expandSeq1, expandSeq2, finalExpand)

Output lines are byte-identical to the Perl script's .smap output (the
differential test drives the reference supermap.pl with our glocal
plugged in as the SLAGAN binary, isolating this file's logic).

Quirks mirrored from the reference: GNU-sort last-resort whole-line
tie-breaks; the never-assigned $cur_seq in expandSeq2 making the
"correct upper expansion" branch unconditional; expSeq1Reg's dead
sequence-change branch; Perl string truthiness ("0" fields mark an
align as bad); trailing-space passthrough rows.  The single-sequence
"bacteria" flip mode (-proflip) is ported and oracle-verified too.
"""
from __future__ import annotations

import re

from .glocal import DEFAULT_SCORE, glocal_chain

ERODE = 15          # $erode_align
EXPAND_FACTOR = 4   # $expand_factor

# field indices (supermap.pl array index constants)
START1, END1, START2, END2, SEQ1, SEQ2, ORIENT, ORIGIN, SCORE, TOTSC, \
    HASHID, FLIPPED = range(12)

_HIT_RE = re.compile(
    r"\s*(.*)\s(\d+)\s(\d+);\s(.*)\s(\d+)\s(\d+);"
    r"\sscore\s=\s([e\d.+-]+)\s\(([+-]+)\)")
_GOUT_RE = re.compile(
    r"\s*\((\d+)\s(\d+)\)=\((\d+)\s(\d+)\)\s([\d.-]+)\s([+-]+)"
    r"\s\[([\d.-]+)\]\s*s1:(.*?)\s*s2:(.*)$")


def _alnum_key(s: str):
    """Perl Utils::alnum natural-sort key (digit runs compare numerically)."""
    parts = re.split(r"(\d+)", s)
    return tuple((1, int(p)) if p.isdigit() else (0, p)
                 for p in parts if p != "")


def _numval(field: str) -> float:
    m = re.match(r"\s*([+-]?\d*\.?\d*)", field)
    try:
        return float(m.group(1))
    except ValueError:
        return 0.0


def _gnu_sort(lines: list[str], keys) -> list[str]:
    """GNU sort with -k specs; keys = [(field 1-based, char offset
    0-based, numeric)].  Ties fall to the whole-line last-resort
    comparison, as sort(1) does without -s."""
    def keyf(line):
        fields = line.split()
        out = []
        for f, off, num in keys:
            s = fields[f - 1][off:] if f - 1 < len(fields) else ""
            out.append(_numval(s) if num else s)
        out.append(line)
        return tuple(out)
    return sorted(lines, key=keyf)


def _truthy(s) -> bool:
    """Perl string truthiness of a captured field."""
    return s is not None and s != "" and s != "0"


def is_blat(first_line: str) -> bool:
    """isBLAT (supermap.pl): CHAOS lines carry `.. N N; .. N N; score`."""
    if re.match(r"\s*.+\s\d+\s\d+;\s.+\s\d+\s\d+;\sscore", first_line):
        return False
    if re.match(r"\S+\s\d+\s\d+\s\S+\s", first_line):
        return True
    raise ValueError("unknown input format (neither CHAOS nor BLAT)")


def blat_to_chaos(text: str, c1: float = 100, c2: float = 50,
                  c3: float = 400, c4: float = 25) -> str:
    """The reference's awk BLAT->CHAOS conversion (supermap.pl:350-354):
    score = c1*matches - c2*mismatches - c3*(qgaps+tgaps) - c4*ln(gapbases),
    with zero gap bases mapped to 1 before the log."""
    import math
    out = []
    for line in text.split("\n"):
        f = line.split()
        if len(f) < 15:
            continue
        f13, f15 = float(f[12]), float(f[14])
        v13 = f13 if (f13 + f15) else 1.0
        score = (c1 * float(f[7]) - c2 * float(f[8])
                 - c3 * (float(f[11]) + float(f[13]))
                 - c4 * math.log(v13 + f15))
        sv = f"{score:.6g}"  # awk OFMT
        out.append(f"{f[0]} {f[1]} {f[2]}; {f[4]} {f[5]} {f[6]}; "
                   f"score = {sv} ({f[3]})")
    return "\n".join(out) + "\n"


def get_min_seq_score(score_text: str) -> float:
    """getMinSeqScore (supermap.pl): the U-case open penalty."""
    score = None
    for line in score_text.split("\n"):
        m = re.search(r"\{\+U\+;.+\}.*\{(\d+)\s.+\}", line)
        if m:
            score = float(m.group(1))
    if score is None:
        raise ValueError("could not determine min_seq_score from score file")
    return score


def _hash_id(al) -> str:
    return (f"{al[SEQ1]}:{al[START1]}-{al[END1]}"
            f"={al[SEQ2]}:{al[START2]}-{al[END2]}")


def _check_coords(al):
    if int(al[START1]) > int(al[END1]):
        al[START1], al[END1] = al[END1], al[START1]
    if int(al[START2]) > int(al[END2]):
        al[START2], al[END2] = al[END2], al[START2]


def _print_chain(out: list[str], chain, print_chains: bool):
    """printChainToTemp (supermap.pl:782-799)."""
    if chain is None:
        return
    first, last = chain[0], chain[-1]
    line = (f"{first[ORIGIN]} {len(chain)} "
            f"{first[START1]} {first[END1]} {first[START2]} {first[END2]} "
            f"{first[SEQ1]} {first[SEQ2]} {first[ORIENT]} {first[SCORE]} "
            f"{last[START1]} {last[END1]} {last[START2]} {last[END2]} "
            f"{last[SEQ1]} {last[SEQ2]} {last[ORIENT]} {last[SCORE]}")
    if print_chains:
        for al in chain:
            line += f" {al[START1]} {al[END1]} {al[START2]} {al[END2]}"
    out.append(line + "\n")


def _parse_gout_line(line: str):
    m = _GOUT_RE.match(line)
    if not m:
        return None
    return m


class Supermap:
    def __init__(self, sizes1: dict[str, int], sizes2: dict[str, int], *,
                 score_text: str = DEFAULT_SCORE,
                 min_seq_score: float | None = None,
                 max_expand_len: int = 30000, max_chainlen: int = 1500000,
                 proflip: bool = False, print_chains: bool = False,
                 no_aligntotals: bool = False, glocal_fn=None):
        self.sizes1 = dict(sizes1)
        self.sizes2 = dict(sizes2)
        self.score_text = score_text
        self.max_expand_len = max_expand_len + ERODE
        mc = max_chainlen if max_chainlen else 1000000000
        self.max_chainlen = mc - 2 * self.max_expand_len
        self.proflip = proflip
        self.print_chains = print_chains
        self.no_aligntotals = no_aligntotals
        self.min_seq_score = (get_min_seq_score(score_text)
                              if min_seq_score is None else min_seq_score)
        self.glocal = glocal_fn or (
            lambda hits: glocal_chain(hits, self.score_text))
        self.flipped: dict[str, list] = {}

    # -- stage 1+2: scan, erode, split (runSLAGAN / reprintInputHits) ----
    def _scan_hits(self, hits_text: str):
        one_seq = len(self.sizes1) == 1 and len(self.sizes2) == 1
        raw = [l + "\n" for l in hits_text.split("\n") if l.strip()]
        if self.proflip:
            raw = self._flip_hits(raw, one_seq)
        raw = _gnu_sort(raw, [(1, 0, False), (2, 0, True)])
        base1_lines: list[str] = []
        base2_lines: list[str] = []
        for line in raw:
            m = _HIT_RE.match(line)
            if not m:
                continue
            al = [None] * 12
            (al[SEQ1], al[START1], al[END1], al[SEQ2], al[START2], al[END2],
             al[SCORE], al[ORIENT]) = m.groups()
            if float(al[SCORE]) <= 0:
                continue
            if one_seq:
                al[SEQ1] = next(iter(self.sizes1))
                al[SEQ2] = next(iter(self.sizes2))
            _check_coords(al)
            s1, e1 = int(al[START1]), int(al[END1])
            s2, e2 = int(al[START2]), int(al[END2])
            if not (e1 - s1 <= ERODE * 2 or e2 - s2 <= ERODE * 2):
                al[START1], al[END1] = str(s1 + ERODE), str(e1 - ERODE)
                al[START2], al[END2] = str(s2 + ERODE), str(e2 - ERODE)
            text = (f"{al[SEQ1]} {al[START1]} {al[END1]}; "
                    f"{al[SEQ2]} {al[START2]} {al[END2]}; "
                    f"score = {al[SCORE]} ({al[ORIENT]})\n")
            base1_lines.append(text)
            base2_lines.append(text)
        base1_lines = _gnu_sort(base1_lines, [(1, 0, False), (2, 0, True)])
        base2_lines = _gnu_sort(base2_lines, [(4, 0, False), (5, 0, True)])
        return base1_lines, base2_lines

    def _flip_hits(self, raw: list[str], one_seq: bool) -> list[str]:
        """prepareHits -bacteria branch (supermap.pl:373-411)."""
        if not one_seq:
            raise ValueError("flip mode needs two single-sequence genomes")
        n1 = next(iter(self.sizes1))
        n2 = next(iter(self.sizes2))
        c1 = self.sizes1[n1] / 2
        c2 = self.sizes2[n2] / 2
        out = []
        for line in raw:
            m = _HIT_RE.match(line)
            if not m:
                continue
            s1, e1 = sorted((int(m.group(2)), int(m.group(3))))
            s2, e2 = sorted((int(m.group(5)), int(m.group(6))))
            score, orient = m.group(7), m.group(8)
            m1 = (s1 + e1) / 2
            m2 = (s2 + e2) / 2
            if (m1 > c1 and m2 < c2) or (m1 < c1 and m2 > c2):
                s2, e2 = int(2 * c2) - e2, int(2 * c2) - s2
                orient = "-" if orient == "+" else "+"
                al = [None] * 12
                al[START1], al[END1] = str(s1 + ERODE), str(e1 - ERODE)
                al[START2], al[END2] = str(s2 + ERODE), str(e2 - ERODE)
                al[SCORE], al[ORIENT] = score, orient
                al[SEQ1], al[SEQ2] = n1, n2
                self.flipped[_hash_id(al)] = al
            out.append(f"seq1 {s1} {e1}; seq2 {s2} {e2}; "
                       f"score = {score} ({orient})\n")
        return out

    def _split_base(self, lines: list[str], base: int):
        """reprintInputHits: per-sequence reoriented hit files."""
        files: dict[str, list[str]] = {}
        order: list[str] = []
        pruned: dict[str, int] = {}
        for line in lines:
            m = _HIT_RE.match(line)
            al = m.groups()
            seq = al[0] if base == 1 else al[3]
            if seq not in files:
                files[seq] = []
                order.append(seq)
                pruned[seq] = (self.sizes1 if base == 1
                               else self.sizes2).get(seq)
            s1, e1, s2, e2 = al[1], al[2], al[4], al[5]
            if base == 1 and al[7] == "+":
                t = f"{al[0]} {s1} {e1}; {al[3]} {s2} {e2}; "
            elif base == 1:
                t = f"{al[0]} {s1} {e1}; {al[3]} {e2} {s2}; "
            elif al[7] == "+":
                t = f"{al[3]} {s2} {e2}; {al[0]} {s1} {e1}; "
            else:
                t = f"{al[3]} {s2} {e2}; {al[0]} {e1} {s1}; "
            files[seq].append(t + f"score = {al[6]} ({al[7]})\n")
        if base == 1:
            self.sizes1 = pruned
        else:
            self.sizes2 = pruned
        return files

    # -- stage 4: chain scanners ----------------------------------------
    def _backflip(self, al):
        if self.proflip and _hash_id(al) in self.flipped:
            c2 = (self.sizes2[next(iter(self.sizes2))]) / 2
            s2, e2 = int(al[START2]), int(al[END2])
            al[START2], al[END2] = str(int(2 * c2) - e2), str(int(2 * c2) - s2)
            al[ORIENT] = "-" if al[ORIENT] == "+" else "+"
            al[FLIPPED] = 1

    def _parse_chain_align(self, m, base: int):
        al = [None] * 12
        al[FLIPPED] = 0
        if base == 1:
            (al[START1], al[END1], al[START2], al[END2], al[SCORE],
             al[ORIENT], al[TOTSC], al[SEQ1], al[SEQ2]) = m.groups()
        else:
            (al[START2], al[END2], al[START1], al[END1], al[SCORE],
             al[ORIENT], al[TOTSC], al[SEQ2], al[SEQ1]) = m.groups()
        al[SEQ1] = al[SEQ1].strip()
        al[SEQ2] = al[SEQ2].strip()
        _check_coords(al)
        self._backflip(al)
        al[HASHID] = _hash_id(al)
        return al

    def _load_base2_hashes(self, lines: list[str]):
        """loadBase2Hashes: hashid -> [prev hashid, next hashid]."""
        hashes: dict[str, list] = {}
        prev = cur = None
        for line in lines:
            m = re.match(r"\s*\((\d+)\s(\d+)\)=\((\d+)\s(\d+)\)"
                         r"\s.*s1:(.*?)\s*s2:(.*)$", line)
            if not m:
                continue
            nxt = [None] * 12
            (nxt[START2], nxt[END2], nxt[START1], nxt[END1],
             nxt[SEQ2], nxt[SEQ1]) = m.groups()
            _check_coords(nxt)
            nxt[SEQ1] = nxt[SEQ1].strip()
            nxt[SEQ2] = nxt[SEQ2].strip()
            nxt[HASHID] = _hash_id(nxt)
            if cur is not None:
                hashes[cur[HASHID]] = [prev[HASHID] if prev else 1,
                                       nxt[HASHID]]
            prev, cur = cur, nxt
        if cur is not None:
            hashes[cur[HASHID]] = [prev[HASHID] if prev else 1, None]
        return hashes

    def _chain_base1(self, lines: list[str], base2_sorted_gen1):
        """chainBase1Hits: 2M/1M1 chains per gen1 seq; returns
        ({seq: chain-lines}, hashesDM lines)."""
        out_files: dict[str, list[str]] = {}
        hashes_dm: list[str] = []
        out: list[str] = []
        cur_seq = None
        peers: dict[str, list] = {}
        prev_al = None
        chain_2m = chain_1m1 = None
        pre_prev = prev_chain = cur_chain = None
        mc = self.max_chainlen

        for line in lines:
            m = _parse_gout_line(line)
            if not m:
                continue
            g = m.groups()
            if int(g[0]) == int(g[1]):
                continue
            if not all(_truthy(x) for x in g[:6]):
                continue
            al = self._parse_chain_align(m, 1)

            if al[SEQ1] != cur_seq:
                _print_chain(out, prev_chain, self.print_chains)
                _print_chain(out, cur_chain, self.print_chains)
                chain_2m = chain_1m1 = prev_al = None
                pre_prev = prev_chain = cur_chain = None
                if cur_seq is not None:
                    out_files[cur_seq] = out
                out = []
                cur_seq = al[SEQ1]
                peers = self._load_base2_hashes(
                    base2_sorted_gen1.get(cur_seq, []))

            align_peers = peers.get(al[HASHID])
            al[ORIGIN] = 2 if align_peers is not None else 1

            s2, e2 = int(al[START2]), int(al[END2])
            if (chain_2m is not None and align_peers is not None
                    and prev_al is not None
                    and ((al[ORIENT] == "+" and s2 > int(prev_al[END2])
                          and prev_al[HASHID] == align_peers[0])
                         or (al[ORIENT] == "-" and e2 < int(prev_al[START2])
                             and prev_al[HASHID] == align_peers[1])
                         or (al[FLIPPED]
                             and ((al[ORIENT] == "+"
                                   and s2 < int(prev_al[END2])
                                   and prev_al[HASHID] == align_peers[0])
                                  or (al[ORIENT] == "-"
                                      and e2 > int(prev_al[START2])
                                      and prev_al[HASHID]
                                      == align_peers[1]))))
                    and al[ORIENT] == prev_al[ORIENT]
                    and al[FLIPPED] == prev_al[FLIPPED]
                    and al[SEQ2] == prev_al[SEQ2]
                    and int(al[START1]) > int(prev_al[END1])
                    and abs(int(al[END1]) - int(chain_2m[START1])) < mc
                    and abs(int(al[END2]) - int(chain_2m[START2])) < mc):
                cur_chain.append(al)
                hashes_dm.append(f"{al[SEQ1]}\t{al[SEQ2]}\t{al[HASHID]}\n")
            elif align_peers is not None:
                # the chain writer lags by two chains (supermap.pl:782)
                _print_chain(out, prev_chain, self.print_chains)
                chain_2m, chain_1m1 = al, None
                pre_prev, prev_chain = prev_chain, cur_chain
                cur_chain = [al]
                hashes_dm.append(f"{al[SEQ1]}\t{al[SEQ2]}\t{al[HASHID]}\n")
            elif (chain_1m1 is not None and prev_al is not None
                  and ((al[ORIENT] == "+" and s2 > int(prev_al[END2]))
                       or (al[ORIENT] == "-" and e2 < int(prev_al[START2]))
                       or (al[FLIPPED]
                           and ((al[ORIENT] == "+"
                                 and s2 < int(prev_al[END2]))
                                or (al[ORIENT] == "-"
                                    and e2 > int(prev_al[START2])))))
                  and al[ORIENT] == prev_al[ORIENT]
                  and al[FLIPPED] == prev_al[FLIPPED]
                  and al[SEQ2] == prev_al[SEQ2]
                  and int(al[START1]) > int(prev_al[END1])
                  and abs(int(al[END1]) - int(chain_1m1[START1])) < mc
                  and abs(int(al[END2]) - int(chain_1m1[START2])) < mc):
                cur_chain.append(al)
            else:
                _print_chain(out, prev_chain, self.print_chains)
                chain_1m1, chain_2m = al, None
                pre_prev, prev_chain = prev_chain, cur_chain
                cur_chain = [al]
            prev_al = al
        _print_chain(out, prev_chain, self.print_chains)
        _print_chain(out, cur_chain, self.print_chains)
        if cur_seq is not None:
            out_files[cur_seq] = out
        return out_files, hashes_dm

    def _chain_base2(self, lines: list[str], hashes_2m_by_seq):
        """chainBase2Hits: M2 chains per gen2 seq."""
        out_files: dict[str, list[str]] = {}
        out: list[str] = []
        cur_seq = None
        aligns_2m: dict[str, int] = {}
        prev_al = None
        chain_1m2 = None
        pre_prev = prev_chain = cur_chain = None
        mc = self.max_chainlen

        def flush_pending(target):
            if prev_chain is not None and prev_chain[0][ORIGIN] == 3:
                _print_chain(target, prev_chain, self.print_chains)
            if cur_chain is not None and cur_chain[0][ORIGIN] == 3:
                _print_chain(target, cur_chain, self.print_chains)

        for line in lines:
            m = _parse_gout_line(line)
            if not m:
                continue
            g = m.groups()
            if int(g[0]) == int(g[1]):
                continue
            if not all(_truthy(x) for x in g[:6]):
                continue
            al = self._parse_chain_align(m, 2)

            if al[SEQ2] != cur_seq:
                flush_pending(out)
                chain_1m2 = prev_al = None
                pre_prev = prev_chain = cur_chain = None
                if cur_seq is not None:
                    out_files[cur_seq] = out
                out = []
                cur_seq = al[SEQ2]
                aligns_2m = hashes_2m_by_seq.get(cur_seq, {})

            al[ORIGIN] = 2 if al[HASHID] in aligns_2m else 3

            s1, e1 = int(al[START1]), int(al[END1])
            if al[HASHID] in aligns_2m:
                if prev_chain is not None and prev_chain[0][ORIGIN] == 3:
                    _print_chain(out, prev_chain, self.print_chains)
                chain_1m2 = None
                pre_prev, prev_chain = prev_chain, cur_chain
                cur_chain = [al]
            elif (chain_1m2 is not None
                  and ((al[ORIENT] == "+" and s1 > int(prev_al[END1]))
                       or (al[ORIENT] == "-" and e1 < int(prev_al[START1]))
                       or (al[FLIPPED]
                           and ((al[ORIENT] == "+"
                                 and s1 < int(prev_al[END1]))
                                or (al[ORIENT] == "-"
                                    and e1 > int(prev_al[START1])))))
                  and al[ORIENT] == prev_al[ORIENT]
                  and al[SEQ1] == prev_al[SEQ1]
                  and al[FLIPPED] == prev_al[FLIPPED]
                  and (int(al[START2]) > int(prev_al[END2])
                       or (al[FLIPPED]
                           and int(al[START2]) < int(prev_al[END2])))
                  and abs(int(al[END1]) - int(chain_1m2[START1])) < mc
                  and abs(int(al[END2]) - int(chain_1m2[START2])) < mc):
                cur_chain.append(al)
            else:
                if prev_chain is not None and prev_chain[0][ORIGIN] == 3:
                    _print_chain(out, prev_chain, self.print_chains)
                chain_1m2 = al
                pre_prev, prev_chain = prev_chain, cur_chain
                cur_chain = [al]
            prev_al = al
        flush_pending(out)
        if cur_seq is not None:
            out_files[cur_seq] = out
        return out_files

    # -- stage 5: expansions --------------------------------------------
    def _expand_seq1(self, lines: list[str]) -> list[str]:
        out: list[str] = []
        window: list = [None, None, None]  # prev, cur, next

        def emit(prev_chain, cur_chain, next_chain):
            if cur_chain is None:
                return
            first, typ = cur_chain[0], cur_chain[2]
            chalo1, chahi1 = first["CHALO1"], first["CHAHI1"]
            pre = chalo1 - (prev_chain[0]["CHAHI1"] if prev_chain else 0)
            if pre > self.max_expand_len or pre < 0:
                pre = self.max_expand_len
            post = ((next_chain[0]["CHALO1"] - chahi1)
                    if next_chain else -1)
            if post > self.max_expand_len or post < 0:
                post = self.max_expand_len
            lo_e = max(chalo1 - pre, 1)
            hi_e = chahi1 + post
            cap = self.sizes1.get(cur_chain[4][6], 0) or 0
            if hi_e > cap:
                hi_e = cap
            cols = cur_chain[4]
            out.append(" ".join(cols[:18])
                       + f" {chalo1} {chahi1} {lo_e} {hi_e}"
                       + ("".join(" " + c for c in cols[18:])
                          if self.print_chains else "") + "\n")

        for line in lines:
            cols = line.split()
            if cols[0] == "3":
                out.append(" ".join(cols[:18]) + " 0 0 0 0 "
                           + " ".join(cols[18:]) + "\n")
                continue
            first = {"CHALO1": min(int(cols[2]), int(cols[10])),
                     "CHAHI1": max(int(cols[3]), int(cols[11]))}
            nxt = [first, None, cols[0], cols[1], cols]
            window = [window[1], window[2], nxt]
            if window[1] is not None:
                emit(window[0], window[1], window[2])
        window = [window[1], window[2], None]
        if window[1] is not None:
            emit(window[0], window[1], window[2])
        return out

    def _expand_seq2(self, lines: list[str]) -> list[str]:
        out: list[str] = []
        window: list = [None, None, None]

        def emit(prev_chain, cur_chain, next_chain):
            if cur_chain is None:
                return
            first, typ = cur_chain[0], int(cur_chain[2])
            pre1 = first["CHALO1"] - first["CHALO1E"]
            post1 = first["CHAHI1E"] - first["CHAHI1"]
            pre2 = first["CHALO2"] - (prev_chain[0]["CHAHI2"]
                                      if prev_chain else 0)
            if pre2 > pre1 * EXPAND_FACTOR and typ != 3:
                pre2 = pre1 * EXPAND_FACTOR
            if pre2 > self.max_expand_len or pre2 < 0:
                pre2 = self.max_expand_len
            if pre1 > pre2 * EXPAND_FACTOR and typ != 3:
                pre1 = pre2 * EXPAND_FACTOR
            if pre1 > self.max_expand_len:
                pre1 = self.max_expand_len
            post2 = ((next_chain[0]["CHALO2"] - first["CHAHI2"])
                     if next_chain else -1)
            if post2 > post1 * EXPAND_FACTOR and typ != 3:
                post2 = post1 * EXPAND_FACTOR
            if post2 > self.max_expand_len or post2 < 0:
                post2 = self.max_expand_len
            if post1 > post2 * EXPAND_FACTOR and typ != 3:
                post1 = post2 * EXPAND_FACTOR
            if post1 > self.max_expand_len:
                post1 = self.max_expand_len
            cols = cur_chain[4]
            lo1e = max(first["CHALO1"] - pre1, 1)
            hi1e = first["CHAHI1"] + post1
            cap1 = self.sizes1.get(cols[6], 0) or 0
            if hi1e > cap1:
                hi1e = cap1
            lo2e = max(first["CHALO2"] - pre2, 1)
            hi2e = first["CHAHI2"] + post2
            cap2 = self.sizes2.get(cols[7], 0) or 0
            if hi2e > cap2:
                hi2e = cap2
            # the reference's $cur_seq is never assigned in expandSeq2,
            # so its "correct upper expansion" applies unconditionally
            post2b = post1 * EXPAND_FACTOR
            if post2b > self.max_expand_len:
                post2b = self.max_expand_len
            if post2b < 0:
                post2b = 0
            hi2e = first["CHAHI2"] + post2b
            if hi2e > cap2:
                hi2e = cap2
            out.append(" ".join(cols[:18])
                       + f" {first['CHALO1']} {first['CHAHI1']} {lo1e} {hi1e}"
                       + f" {first['CHALO2']} {first['CHAHI2']} {lo2e} {hi2e}"
                       + ("".join(" " + c for c in cols[22:])
                          if self.print_chains else "") + "\n")

        for line in lines:
            cols = line.split()
            if cols[0] == "1":
                out.append(" ".join(cols[:22]) + " 0 0 0 0 "
                           + " ".join(cols[22:]) + "\n")
                continue
            first = {"CHALO1": int(cols[18]), "CHAHI1": int(cols[19]),
                     "CHALO1E": int(cols[20]), "CHAHI1E": int(cols[21]),
                     "CHALO2": min(int(cols[4]), int(cols[12])),
                     "CHAHI2": max(int(cols[5]), int(cols[13]))}
            nxt = [first, None, cols[0], cols[1], cols]
            window = [window[1], window[2], nxt]
            if window[1] is not None:
                emit(window[0], window[1], window[2])
        window = [window[1], window[2], None]
        if window[1] is not None:
            emit(window[0], window[1], window[2])
        return out

    def _final_expand(self, lines: list[str]) -> list[str]:
        out: list[str] = []
        window: list = [None, None, None]
        cur_seq = [None]

        def emit(prev_chain, cur_chain, next_chain):
            if cur_chain is None:
                return
            first, typ = cur_chain[0], int(cur_chain[2])
            cols = cur_chain[4]
            if typ == 1:
                pre1 = first["CHALO1"] - first["CHALO1E"]
                pre2 = min(pre1 * EXPAND_FACTOR, self.max_expand_len)
                post1 = first["CHAHI1E"] - first["CHAHI1"]
                post2 = min(post1 * EXPAND_FACTOR, self.max_expand_len)
                first["CHALO2E"] = max(first["CHALO2"] - pre2, 1)
                first["CHAHI2E"] = first["CHAHI2"] + post2
                cap = self.sizes2.get(cols[7], 0) or 0
                if first["CHAHI2E"] > cap:
                    first["CHAHI2E"] = cap
            elif typ == 3:
                pre2 = first["CHALO2"] - first["CHALO2E"]
                pre1 = min(pre2 * EXPAND_FACTOR, self.max_expand_len)
                post2 = first["CHAHI2E"] - first["CHAHI2"]
                post1 = min(post2 * EXPAND_FACTOR, self.max_expand_len)
                first["CHALO1E"] = max(first["CHALO1"] - pre1, 1)
                first["CHAHI1E"] = first["CHAHI1"] + post1
                cap = self.sizes1.get(cols[6], 0) or 0
                if first["CHAHI1E"] > cap:
                    first["CHAHI1E"] = cap
            label = {1: "M1, ", 2: "DM, ", 3: "M2, "}[typ]
            line = (f"{cols[6]} {first['CHALO1E']} {first['CHAHI1E']}   "
                    f"{cols[7]} {first['CHALO2E']} {first['CHAHI2E']} "
                    f"{cols[8]}")
            if not self.no_aligntotals:
                line += f" ({label}{cur_chain[3]} aligns)"
            if self.print_chains:
                i = 26
                while i < len(cols):
                    line += (f" [{cols[i]}-{cols[i + 1]}"
                             f"={cols[i + 2]}-{cols[i + 3]}]")
                    i += 4
            out.append(line + "\n")

        for line in lines:
            cols = line.split()
            typ = int(cols[0])
            first = {"CHALO1": int(cols[18]), "CHAHI1": int(cols[19]),
                     "CHALO1E": int(cols[20]), "CHAHI1E": int(cols[21]),
                     "CHALO2": int(cols[22]), "CHAHI2": int(cols[23]),
                     "CHALO2E": int(cols[24]), "CHAHI2E": int(cols[25])}
            if typ == 1:
                first["CHALO2"] = min(int(cols[4]), int(cols[12]))
                first["CHAHI2"] = max(int(cols[5]), int(cols[13]))
            elif typ == 3:
                first["CHALO1"] = min(int(cols[2]), int(cols[10]))
                first["CHAHI1"] = max(int(cols[3]), int(cols[11]))
            nxt = [first, None, cols[0], cols[1], cols]
            window = [window[1], window[2], nxt]
            if window[1] is not None:
                emit(window[0], window[1], window[2])
            if cur_seq[0] != cols[7]:
                window[1] = None  # undef $cur_chain on seq2 change
                cur_seq[0] = cols[7]
        window = [window[1], window[2], None]
        if window[1] is not None:
            emit(window[0], window[1], window[2])
        return out

    # -- driver ----------------------------------------------------------
    def run(self, hits_text: str) -> str:
        base1_lines, base2_lines = self._scan_hits(hits_text)
        files1 = self._split_base(base1_lines, 1)
        files2 = self._split_base(base2_lines, 2)

        gout1 = {s: self.glocal("".join(ls)) for s, ls in files1.items()}
        gout2 = {s: self.glocal("".join(ls)) for s, ls in files2.items()}
        for name, g in [*gout1.items(), *gout2.items()]:
            if not g.strip():
                raise RuntimeError(f"empty SLAGAN output for {name}")

        # gen2base aligns sorted on gen1 seq, gen2 seq, start2; split per
        # gen1 seq (processResults first sort, -k 9,9 -k 7,7 -k 1.2,1n)
        pool: list[str] = []
        for seq in sorted(self.sizes2, key=_alnum_key):
            if seq not in gout2:
                del self.sizes2[seq]
                continue
            lines = gout2[seq].split("\n")
            first = lines[0] + "\n"
            if self._below_min(first):
                continue
            pool.extend(l + "\n" for l in lines if l)
        pool = _gnu_sort(pool, [(9, 0, False), (7, 0, False), (1, 1, True)])
        sorted_gen1: dict[str, list[str]] = {}
        for line in pool:
            m = re.search(r"\ss2:\s*(\S+)\s*$", line)
            if not m:
                continue
            sorted_gen1.setdefault(m.group(1), []).append(line)

        # gen1base aligns sorted on seq1, start1 -> chainBase1Hits
        pool = []
        for seq in sorted(self.sizes1, key=_alnum_key):
            if seq not in gout1:
                del self.sizes1[seq]
                continue
            lines = gout1[seq].split("\n")
            if self._below_min(lines[0] + "\n"):
                continue
            pool.extend(l + "\n" for l in lines if l)
        pool = _gnu_sort(pool, [(7, 0, False), (1, 1, True)])
        files_2mm1, hashes_dm = self._chain_base1(pool, sorted_gen1)

        # 2M hashes sorted by gen2 seq, split per gen2 seq
        hashes_dm = _gnu_sort(hashes_dm, [(2, 0, False)])
        hashes_by_seq: dict[str, dict[str, int]] = {}
        for line in hashes_dm:
            f = line.split()
            hashes_by_seq.setdefault(f[1], {})[f[2]] = 1

        # gen2base aligns sorted on seq2, start2 -> chainBase2Hits
        pool = []
        for seq in sorted(self.sizes2, key=_alnum_key):
            if seq not in gout2:
                continue
            lines = gout2[seq].split("\n")
            if self._below_min(lines[0] + "\n"):
                continue
            pool.extend(l + "\n" for l in lines if l)
        pool = _gnu_sort(pool, [(7, 0, False), (1, 1, True)])
        files_m2 = self._chain_base2(pool, hashes_by_seq)

        # postProcessRegions: concat chains, three sort+expand passes
        pool = []
        for seq in sorted(self.sizes1, key=_alnum_key):
            pool.extend(files_2mm1.get(seq, []))
        for seq in sorted(self.sizes2, key=_alnum_key):
            pool.extend(files_m2.get(seq, []))
        pool = _gnu_sort(pool, [(7, 0, False), (3, 0, True)])
        pool = self._expand_seq1(pool)
        pool = _gnu_sort(pool, [(8, 0, False), (5, 0, True)])
        pool = self._expand_seq2(pool)
        pool = _gnu_sort(pool, [(7, 0, False), (3, 0, True)])
        return "".join(self._final_expand(pool))

    def _below_min(self, line: str) -> bool:
        m = re.match(r"\s*\(\d+\s\d+\)=\(\d+\s\d+\)\s[\d.-]+\s[+-]+"
                     r"\s\[([\d.-]+)\]", line)
        if not m:
            raise ValueError(f"unable to extract score from: {line!r}")
        return float(m.group(1)) < self.min_seq_score


def supermap(hits_text: str, sizes1: dict[str, int],
             sizes2: dict[str, int], **kw) -> str:
    """The .smap region map for a CHAOS or BLAT hit list (supermap.pl
    output; BLAT input is converted like the reference's awk pass)."""
    first = next((l for l in hits_text.split("\n") if l.strip()), "")
    if first and is_blat(first):
        hits_text = blat_to_chaos(hits_text)
    return Supermap(sizes1, sizes2, **kw).run(hits_text)
