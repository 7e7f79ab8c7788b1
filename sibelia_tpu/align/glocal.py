"""Glocal (SLAGAN) fragment chaining with inversions and translocations.

Behavioral port of the reference toolkit's ``glocal`` binary
(src/lagan/src/glocal/, shipped for the slagan.pl / supermap.pl
pipelines; unused by C-Sibelia): a 1-D sparse-DP sweep over CHAOS-format
local hits that chains fragments under per-geometry affine penalties —
same-strand continuation, strand flips (inversions) and left/right jumps
(translocations) each get their own score function from the score file —
and reports the maximum-scoring chain.

The sweep maintains, per (up-strand, down-strand, relative-position)
region, a Right-Influence active diagonal map (rightinfluence.cpp) and a
Left-Influence owner list with column/diagonal boundaries plus an
intersection-point queue (leftinfluence.cpp).  Scores are computed in
float32 like the C code, so chain totals printed by :func:`glocal_chain`
are byte-identical to the reference binary's stdout.

Quirk notes (matching compiled behavior, not the UB on paper):
- intersectionPointHandler's do/while compares against an uninitialized
  stack value (glocal.cpp:249-256); compiled builds run one iteration.
- decrementing begin() in HandleOneIntersectionPoint's column-continue
  branch lands on end() in libstdc++; ported as an explicit None.
"""
from __future__ import annotations

import re
from bisect import bisect_left, bisect_right, insort

import numpy as np

f32 = np.float32

RIGHT, LEFT, UNRELATED = 0, 1, 2
POSITIVE, NEGATIVE = 1, 0
UPSHIFT, DOWNSHIFT, RELSHIFT = 0, 3, 6
INF = 2 ** 63 - 1
NEGINF_KEY = -(2 ** 63)
NEGINF = f32(NEGINF_KEY)  # float(LLONG_MIN), the C sentinel (score.cpp:149)

DEFAULT_SCORE = """{+R+;-L-}{0 0.02 0 0;40000 0 0 0}
{+R-;-L+}{3000 0.02 0.1 0;40000 0 0 0}
{-R+;+L-}{7000 0.02 0.5 0;40000 0 0 0}
{+L+;-R-}{7000 0.02 0.5 0;40000 0 0 0}
{+U+;+U-;-U+;-U-}{30000 0 0 0}
"""


class Frag:
    __slots__ = ("s1s", "s1e", "s2s", "s2e", "strand", "score", "total",
                 "back", "s1name", "s2name", "base", "name", "kind")

    def __init__(self):
        self.back = None
        self.total = f32(-1)
        self.base = 0
        self.kind = 0  # 0 real, -1 origin/LI_dummy, -2 end sentinel

    def seq2_end(self, reflect):
        return -self.s2e if reflect else self.s2e

    def seq2_start(self, reflect):
        return -self.s2s if reflect else self.s2s


class ScoreFn:
    """One `{open dist min max}` entry of the score file (score.cpp:12-23)."""

    __slots__ = ("open", "mn", "mx", "diag")

    def __init__(self, open_, diag, mn, mx):
        self.open = f32(open_)
        self.mn = f32(mn)
        self.mx = f32(mx)
        self.diag = f32(diag)

    def get(self, up: Frag, down: Frag) -> np.float32:
        a1 = abs(up.s1e - down.s1s)
        a2 = abs(up.s2e - down.s2s)
        mn, mx = (a1, a2) if a1 <= a2 else (a2, a1)
        d = mx - mn
        # left-to-right float32 chain, as the C expression evaluates
        r = f32(f32(mn) * -self.mn) + f32(f32(mx) * -self.mx)
        r = f32(r + f32(f32(d) * -self.diag))
        return f32(f32(r - self.open) + up.total)


def _char_case(c: str) -> int:
    return {"+": POSITIVE, "-": NEGATIVE, "R": RIGHT, "L": LEFT,
            "U": UNRELATED}[c]


def parse_score_file(text: str) -> dict[int, list[ScoreFn]]:
    fns: dict[int, list[ScoreFn]] = {}
    for line in text.split("\n"):
        if not line:  # the reference stops at the first empty line
            break
        m = re.match(r"\{([^}]*)\}\s*\{([^}]*)\}", line)
        if not m:
            continue
        cases = []
        for tok in m.group(1).split(";"):
            tok = tok.strip()
            up, rel, down = tok[0], tok[1], tok[2]
            cases.append(_char_case(up) << UPSHIFT
                         | _char_case(down) << DOWNSHIFT
                         | _char_case(rel) << RELSHIFT)
        objs = []
        for tok in m.group(2).split(";"):
            v = [float(x) for x in tok.split()]
            objs.append(ScoreFn(v[0], v[1], v[2], v[3]))
        for c in cases:
            fns.setdefault(c, []).extend(objs)
    return fns


class _SortedMap:
    """Ascending ordered map with bisect navigation (std::map stand-in)."""

    __slots__ = ("keys", "vals")

    def __init__(self):
        self.keys: list[int] = []
        self.vals: dict[int, object] = {}

    def set(self, k, v):
        if k not in self.vals:
            insort(self.keys, k)
        self.vals[k] = v

    def erase(self, k):
        del self.vals[k]
        self.keys.pop(bisect_left(self.keys, k))

    def pred_of_upper(self, k):
        """Key before upper_bound(k): last key <= k, else None."""
        i = bisect_right(self.keys, k)
        return self.keys[i - 1] if i else None

    def pred_of_lower(self, k):
        """Key before lower_bound(k): last key < k, else None."""
        i = bisect_left(self.keys, k)
        return self.keys[i - 1] if i else None

    def succ(self, k):
        """First key strictly greater than k, else None."""
        i = bisect_right(self.keys, k)
        return self.keys[i] if i < len(self.keys) else None

    def prev_key(self, k):
        i = bisect_left(self.keys, k)
        return self.keys[i - 1] if i else None

    def __contains__(self, k):
        return k in self.vals

    def __bool__(self):
        return bool(self.keys)


class _Node:
    __slots__ = ("prev", "next", "frag")

    def __init__(self, frag=None):
        self.prev = self.next = None
        self.frag = frag


class _Owners:
    """Doubly-linked owner list (std::list<Fragment*>)."""

    def __init__(self):
        self.head = _Node()
        self.tail = _Node()
        self.head.next = self.tail
        self.tail.prev = self.head

    def insert_before(self, node: _Node, frag: Frag) -> _Node:
        n = _Node(frag)
        n.prev = node.prev
        n.next = node
        node.prev.next = n
        node.prev = n
        return n

    def insert_after(self, node: _Node, frag: Frag) -> _Node:
        return self.insert_before(node.next, frag)

    def erase(self, node: _Node):
        node.prev.next = node.next
        node.next.prev = node.prev

    def begin(self) -> _Node:
        return self.head.next


class _InterNode:
    __slots__ = ("seq1", "seq2", "seq", "li")

    def __init__(self, seq1, seq2, seq, li):
        self.seq1 = seq1
        self.seq2 = seq2
        self.seq = seq
        self.li = li

    def key(self):
        return (self.seq1, self.seq2, self.seq)


class RI:
    __slots__ = ("act", "score_index", "reflect")

    def __init__(self, score_index, origin, end):
        self.score_index = score_index
        self.reflect = ((score_index >> RELSHIFT) & 1) == LEFT
        self.act = _SortedMap()
        self.act.set(NEGINF_KEY, origin)
        self.act.set(INF, end)


class LI:
    __slots__ = ("o", "c", "d", "ci", "di", "score_index", "reflect")

    def __init__(self, score_index, dummy):
        self.score_index = score_index
        self.reflect = ((score_index >> RELSHIFT) & 1) == LEFT
        self.o = _Owners()
        self.o.insert_before(self.o.begin(), dummy)
        self.c = _SortedMap()   # column key -> owner _Node
        self.d = _SortedMap()   # diagonal key -> owner _Node
        self.ci = _SortedMap()  # column key -> _InterNode | None
        self.di = _SortedMap()  # diagonal key -> _InterNode | None


class Glocal:
    def __init__(self, score_fns: dict[int, list[ScoreFn]]):
        self.score_fns = score_fns
        self.origin = Frag()
        self.origin.s1s = self.origin.s1e = 0
        self.origin.s2s = self.origin.s2e = 0
        self.origin.score = f32(-1)
        self.origin.total = f32(0)
        self.origin.kind = -1
        self.origin.name = None
        self.end = Frag()
        self.end.s1s = self.end.s1e = 0
        self.end.s2s = self.end.s2e = 0
        self.end.score = f32(-2)
        self.end.total = f32(0)
        self.end.kind = -2
        self.end.name = None
        self.dummy = Frag()
        self.dummy.s1s = self.dummy.s1e = 0
        self.dummy.s2s = self.dummy.s2e = 0
        self.dummy.strand = NEGATIVE
        self.dummy.score = f32(-1)
        self.dummy.total = f32(0)
        self.dummy.kind = -1
        self.dummy.name = None
        self.unrelated = self.dummy
        self.inter: list[_InterNode] = []
        self.inter_seq = 0
        self.ris: dict[int, RI] = {}
        self.lis: dict[int, LI] = {}
        self.out: list[str] = []

    def ri(self, case) -> RI:
        r = self.ris.get(case)
        if r is None:
            r = self.ris[case] = RI(case, self.origin, self.end)
        return r

    def li(self, case) -> LI:
        l = self.lis.get(case)
        if l is None:
            l = self.lis[case] = LI(case, self.dummy)
        return l

    # -- scoring (score.cpp:151-178) -------------------------------------
    def score_all(self, up: Frag, down: Frag, case: int) -> np.float32:
        if up.name != down.name and (case >> RELSHIFT) != UNRELATED:
            return NEGINF
        best = NEGINF
        fns = self.score_fns.get(case, ())
        for fn in fns:
            s = fn.get(up, down)
            if s > best:
                best = s
        if best == NEGINF and not fns:
            self.out.append(f"Score function case not handled::{case}\n")
        return best

    def set_score(self, cur: Frag, owner: Frag, case: int):
        """fragmentSetScore (score.cpp:181-233)."""
        t = self.score_all(owner, cur, case)
        if t == NEGINF:
            if cur.total <= 0:
                cur.total = cur.score
                cur.back = owner
        elif f32(t + cur.score) > cur.total:
            cur.total = f32(t + cur.score)
            cur.back = owner

    # -- right influence (rightinfluence.cpp) ----------------------------
    def ri_owner_start(self, r: RI, cur: Frag) -> Frag:
        k = r.act.pred_of_upper(cur.seq2_start(r.reflect) - cur.s1s)
        return r.act.vals[k]

    def ri_owner_end(self, r: RI, cur: Frag) -> Frag:
        k = r.act.pred_of_upper(cur.seq2_end(r.reflect) - cur.s1e)
        return r.act.vals[k]

    def ri_winner(self, r: RI, first: Frag, second: Frag) -> bool:
        if first.kind == -1 or second.kind == -2:
            return False
        if second.kind == -1 or first.kind == -2:
            return True
        dummy = Frag()
        dummy.s1s = max(first.s1e, second.s1e) + 1
        dummy.s2s = max(first.seq2_end(r.reflect),
                        second.seq2_end(r.reflect)) + 2
        src = (first if first.seq2_end(r.reflect) > second.seq2_end(r.reflect)
               else second)
        dummy.name = src.name
        return bool(self.score_all(first, dummy, r.score_index)
                    > self.score_all(second, dummy, r.score_index))

    def ri_frag_key(self, r: RI, frag: Frag) -> int:
        if frag.kind == -1:
            return NEGINF_KEY
        if frag.kind == -2:
            return INF
        return frag.seq2_end(r.reflect) - frag.s1e

    def ri_commit(self, r: RI, cur: Frag):
        owner = self.ri_owner_end(r, cur)
        if self.ri_winner(r, owner, cur):
            return
        k = r.act.succ(self.ri_frag_key(r, owner))
        while True:
            nxt = r.act.vals[k] if k is not None else None
            if nxt is not None and self.ri_winner(r, cur, nxt):
                k2 = r.act.succ(k)
                r.act.erase(k)
                k = k2
            else:
                break
        r.act.set(cur.seq2_end(r.reflect) - cur.s1e, cur)

    # -- left influence (leftinfluence.cpp) ------------------------------
    def li_owner_node(self, l: LI, seq1: int, seq2: int):
        """LILookUpOwnerIterator: the owner _Node, or None for o.end()."""
        ck = l.c.pred_of_lower(seq2)
        if ck is None:
            return None
        dk = l.d.pred_of_upper(seq2 - seq1)
        if dk is None:
            return l.c.vals[ck]
        if (ck - dk) > seq1:
            return l.c.vals[ck]
        return l.d.vals[dk]

    def li_owner_frag(self, l: LI, seq1: int, seq2: int) -> Frag:
        n = self.li_owner_node(l, seq1, seq2)
        return self.dummy if n is None else n.frag

    def li_winner(self, l: LI, first: Frag, second: Frag) -> bool:
        if first.kind == -1:
            return False
        if second.kind == -1:
            return True
        dummy = Frag()
        dummy.s1s = max(first.s1e, second.s1e) + 2
        dummy.s2s = max(first.seq2_end(l.reflect),
                        second.seq2_end(l.reflect)) + 1
        src = (first if first.seq2_end(l.reflect) > second.seq2_end(l.reflect)
               else second)
        dummy.name = src.name
        return bool(self.score_all(first, dummy, l.score_index)
                    >= self.score_all(second, dummy, l.score_index))

    def _mk_inter(self, li: LI, col: int, diag: int, ci_key: int,
                  di_key: int):
        """CreateIntersectionPoint (leftinfluence.cpp:431-446)."""
        node = _InterNode(col - diag, col, self.inter_seq, li)
        self.inter_seq += 1
        i = bisect_right([x.key() for x in self.inter], node.key())
        self.inter.insert(i, node)
        li.ci.vals[ci_key] = node
        li.di.vals[di_key] = node

    def li_commit(self, l: LI, cur: Frag):
        """LICommitPoint (leftinfluence.cpp:171-210)."""
        s2 = cur.seq2_end(l.reflect)
        s1 = cur.s1e
        owner_node = self.li_owner_node(l, s1, s2)
        ck = l.c.pred_of_lower(s2)
        dk = l.d.pred_of_upper(s2 - s1)
        owner = self.dummy if owner_node is None else owner_node.frag
        if ck is None or dk is None:
            col_flag = True
        else:
            col_flag = l.c.vals[ck] is owner_node
        if self.li_winner(l, owner, cur):
            return
        if col_flag:
            self._li_commit_column(l, cur, owner, ck)
        else:
            self._li_commit_diagonal(l, cur, owner, ck, dk)

    def _li_commit_column(self, l: LI, cur: Frag, owner: Frag, ck):
        """LI_CommitColumnOwner (leftinfluence.cpp:355-428)."""
        s2 = cur.seq2_end(l.reflect)
        diag = s2 - cur.s1e
        if not l.c:
            node = l.o.insert_after(l.o.begin(), cur)
            l.c.set(s2, node)
            l.ci.set(s2, None)
            node2 = l.o.insert_after(node, self.dummy)
            l.d.set(diag, node2)
            l.di.set(diag, None)
            return
        nk = l.c.succ(ck) if ck is not None else l.c.keys[0]
        if nk is None or nk > s2:
            if ck is not None:
                node = l.o.insert_after(l.c.vals[ck], cur)
            else:
                node = l.o.insert_after(l.o.begin(), cur)
            l.c.set(s2, node)
            l.ci.set(s2, None)
            node2 = l.o.insert_after(node, owner)
            l.d.set(diag, node2)
            l.di.set(diag, None)
            if nk is not None and l.ci.vals[nk] is None:
                self._mk_inter(l, nk, diag, nk, diag)
        else:
            if self.li_winner(l, l.c.vals[nk].frag, cur):
                return
            node = l.o.insert_before(l.c.vals[nk], cur)
            l.d.set(diag, l.c.vals[nk])
            l.di.set(diag, None)
            l.c.vals[nk] = node
            nk2 = l.c.succ(nk)
            if nk2 is not None and l.ci.vals[nk2] is None:
                self._mk_inter(l, nk2, diag, nk2, diag)

    def _li_commit_diagonal(self, l: LI, cur: Frag, owner: Frag, ck, dk):
        """LI_CommitDiagonalOwner (leftinfluence.cpp:219-352)."""
        s2 = cur.seq2_end(l.reflect)
        diag = s2 - cur.s1e
        cdi = l.di.vals[dk]
        nk = l.c.succ(ck)
        if nk is None or nk > s2:
            if dk < diag:
                # FIRSTCASE: new column + new diagonal inside the region
                node = l.o.insert_after(l.d.vals[dk], cur)
                l.c.set(s2, node)
                l.ci.set(s2, None)
                node2 = l.o.insert_after(node, owner)
                l.d.set(diag, node2)
                l.di.set(diag, None)
                if nk is not None:
                    nci = l.ci.vals[nk]
                    if nci is cdi and cdi is not None:
                        self._del_inter(cdi, l, nk, dk)
                        self._mk_inter(l, nk, diag, nk, diag)
                    elif nci is None:
                        self._mk_inter(l, nk, diag, nk, diag)
                self._mk_inter(l, s2, dk, s2, dk)
            else:
                # SECONDCASE: column only, before the existing diagonal
                own = self.li_owner_node(l, cur.s1e, s2)
                if self.li_winner(l, own.prev.frag, cur):
                    return
                node = l.o.insert_before(own, cur)
                l.c.set(s2, node)
                l.ci.set(s2, None)
                pdk = l.d.prev_key(dk)
                if pdk is not None and l.di.vals[pdk] is None:
                    self._mk_inter(l, s2, pdk, s2, pdk)
        else:
            # THIRDCASE: insert before the next column boundary
            if self.li_winner(l, l.c.vals[nk].frag, cur):
                return
            node = l.o.insert_before(l.c.vals[nk], cur)
            l.d.set(diag, l.c.vals[nk])
            l.di.set(diag, None)
            l.c.vals[nk] = node
            nk2 = l.c.succ(nk)
            if nk2 is not None and l.ci.vals[nk2] is None:
                self._mk_inter(l, nk2, diag, nk2, diag)

    def _del_inter(self, node: _InterNode, l: LI, ci_key, di_key):
        self.inter.remove(node)
        l.ci.vals[ci_key] = None
        l.di.vals[di_key] = None

    def handle_intersection(self):
        """HandleOneIntersectionPoint (leftinfluence.cpp:457-555)."""
        head = self.inter[0]
        l = head.li
        col = head.seq2
        diag = head.seq2 - head.seq1
        del_node = l.d.vals[diag]
        left = del_node.prev
        right = del_node.next
        if self.li_winner(l, left.frag, right.frag):
            # the diagonal continues; the column boundary dies
            l.d.vals[diag] = l.c.vals[col]
            nk = l.c.succ(col)
            l.c.erase(col)
            l.ci.erase(col)
            l.di.vals[diag] = None
            if nk is not None and l.ci.vals[nk] is None:
                self._mk_inter(l, nk, diag, nk, diag)
        else:
            # the column continues; the diagonal boundary dies
            pdk = l.d.prev_key(diag)
            l.d.erase(diag)
            l.di.erase(diag)
            l.ci.vals[col] = None
            if pdk is not None and l.di.vals[pdk] is None:
                self._mk_inter(l, col, pdk, col, pdk)
        l.o.erase(del_node)
        self.inter.pop(0)


_HIT_RE = re.compile(
    r"^\s*(\S+)[^;]*?(\d+)\s+(\d+);\s*(\S+)[^;]*?(\d+)\s+(\d+);"
    r"\s*score\s*=\s*(\S+)\s*\((.)\)")


def parse_hits(text: str) -> list[Frag]:
    frags = []
    for line in text.split("\n"):
        m = _HIT_RE.match(line)
        if not m:
            continue
        score = f32(m.group(7))
        if score < 0:  # CUTOFF (io.cpp:190)
            continue
        fr = Frag()
        fr.s1name = m.group(1)
        fr.s2name = m.group(4)
        fr.name = fr.s2name
        fr.s1s, fr.s1e = int(m.group(2)), int(m.group(3))
        fr.s2s, fr.s2e = int(m.group(5)), int(m.group(6))
        fr.strand = POSITIVE if m.group(8) == "+" else NEGATIVE
        fr.score = score
        if fr.s1s > fr.s1e:
            fr.s1s, fr.s1e = fr.s1e, fr.s1s
        frags.append(fr)
    return frags


def glocal_chain(hits_text: str, score_text: str = DEFAULT_SCORE) -> str:
    """stdout of ``glocal hits score`` for the given CHAOS hit list."""
    out, chain = _run_chain(hits_text, score_text)
    for cur in chain:
        strand = "+" if cur.strand == POSITIVE else "-"
        out.append(
            f"({cur.s1s} {cur.s1e})=({cur.s2s - cur.base} "
            f"{cur.s2e - cur.base}) {float(cur.score):f} {strand} "
            f"[{float(cur.total):f}] s1:{cur.s1name} s2: {cur.s2name}\n")
    return "".join(out)


def _run_chain(hits_text: str,
               score_text: str) -> tuple[list[str], list[Frag]]:
    """Run the sweep; returns (diagnostic lines, best chain last-first)."""
    frags = parse_hits(hits_text)
    g = Glocal(parse_score_file(score_text))
    if not frags:
        return [], []
    # contig bases in name-sorted order (io.cpp:252-276)
    maxes: dict[str, int] = {}
    for fr in frags:
        sz = max(fr.s2s, fr.s2e)
        if maxes.get(fr.name, -1) < sz:
            maxes[fr.name] = sz
    offset = 0
    bases: dict[str, int] = {}
    for nm in sorted(maxes):
        bases[nm] = offset
        offset += 10 + maxes[nm]
    for fr in frags:
        fr.base = bases[fr.name]
        fr.s2s += fr.base
        fr.s2e += fr.base

    starts = []
    ends = []
    for fr in frags:
        starts.append((fr.s1s, fr.s2s, fr))
        starts.append((fr.s1s, -fr.s2s, fr))
        ends.append([fr.s1e, fr.s2e, fr])
    starts.sort(key=lambda t: (t[0], t[1]))
    ends.sort(key=lambda t: (t[0], t[1]))

    best: Frag | None = None
    best_score = NEGINF
    si = ei = 0
    break_flag = False

    def start_row():
        nonlocal si, best, best_score
        row = starts[si][0]
        while si < len(starts) and starts[si][0] == row:
            _, s2, fr = starts[si]
            rel = RIGHT if s2 > 0 else LEFT
            # glocal.cpp:127-151: up=+ consults LI then RI; up=- RI then LI
            case = (fr.strand << DOWNSHIFT | POSITIVE << UPSHIFT
                    | rel << RELSHIFT)
            lio = g.li(case)
            g.set_score(fr, g.li_owner_frag(
                lio, fr.s1s, fr.seq2_start(lio.reflect)), case)
            g.set_score(fr, g.ri_owner_start(g.ri(case), fr), case)
            case = (fr.strand << DOWNSHIFT | NEGATIVE << UPSHIFT
                    | rel << RELSHIFT)
            g.set_score(fr, g.ri_owner_start(g.ri(case), fr), case)
            lio = g.li(case)
            g.set_score(fr, g.li_owner_frag(
                lio, fr.s1s, fr.seq2_start(lio.reflect)), case)
            ucase = (fr.strand << DOWNSHIFT | g.unrelated.strand << UPSHIFT
                     | UNRELATED << RELSHIFT)
            g.set_score(fr, g.unrelated, ucase)
            if fr.total > best_score:
                best_score = fr.total
                best = fr
            si += 1
        return starts[si][0] if si < len(starts) else INF

    def end_row():
        nonlocal ei
        row = ends[ei][0]
        while ei < len(ends) and ends[ei][0] == row:
            # duplicate end points: only the best-scoring commits
            # (glocal.cpp:199-210)
            while (ei + 1 < len(ends) and ends[ei + 1][0] == ends[ei][0]
                   and ends[ei + 1][1] == ends[ei][1]):
                if ends[ei][2].total > ends[ei + 1][2].total:
                    ends[ei][2], ends[ei + 1][2] = (ends[ei + 1][2],
                                                    ends[ei][2])
                ei += 1
            fr = ends[ei][2]
            for down in (0, 1):
                for rel in (0, 1):
                    case = (down << DOWNSHIFT | fr.strand << UPSHIFT
                            | rel << RELSHIFT)
                    g.ri_commit(g.ri(case), fr)
                    g.li_commit(g.li(case), fr)
            if fr.total > g.unrelated.total:
                g.unrelated = fr
            ei += 1
        return ends[ei][0] if ei < len(ends) else INF

    next_start = starts[0][0]
    next_end = ends[0][0]
    while True:
        next_inter = g.inter[0].seq1 if g.inter else INF
        if next_start <= next_end:
            if next_start < next_inter:
                next_start = start_row()
                if next_start == INF:
                    break_flag = True
            else:
                g.handle_intersection()
        else:
            if next_end < next_inter:
                next_end = end_row()
                if break_flag:
                    break
            else:
                g.handle_intersection()

    chain = []
    cur = best
    while cur is not None:
        if cur.kind == 0:
            chain.append(cur)
        cur = cur.back
    return g.out, chain


_RC = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")


_SMAP_RE = re.compile(
    r"(\S+) (\d+) (\d+)   (\S+) (\d+) (\d+) ([+-]) \((M1|DM|M2), (\d+)")


def slagan_pairwise(seq1: bytes, name1: str, seq2: bytes, name2: str, *,
                    wl: int = 11, nd: int = 1, co: int = 10,
                    rsc: int = 2250,
                    score_text: str = DEFAULT_SCORE) -> list[dict]:
    """SLAGAN pairwise glocal alignment map (the slagan.pl driver flow,
    src/lagan/slagan.pl:86-150).

    Both-strand CHAOS hits (chaos -b: the minus strand searched on the
    reverse complement, fchaos.c) go through the supermap pipeline
    (align/supermap.py — glocal chaining + M1/DM/M2 region clustering,
    byte-parity-verified against supermap.pl), and each region is
    aligned with the exact LAGAN engine.  Returns regions in .smap
    order: ``{"s1": (b1, e1), "s2": (b2, e2), "strand", "type",
    "n_aligns", "rows": (row1, row2)}`` with 1-based inclusive bounds,
    minus regions aligned against the reverse complement of the seq2
    span.  Empty when every sequence's chain total falls below the
    score file's unrelated penalty (the reference driver dies there).
    """
    from ..native import lagan_chaos
    from .lagan_exact import align_pair_exact
    from .supermap import supermap

    pairs = f"-s1 1 {len(seq1)} -s2 1 {len(seq2)}\n"
    hits = lagan_chaos(seq1, name1, seq2, name2, pairs,
                       wl, nd, co, rsc, gfc=False, ext=True) or ""
    rc2 = seq2.translate(_RC)[::-1]
    minus = lagan_chaos(seq1, name1, rc2, name2, pairs,
                        wl, nd, co, rsc, gfc=False, ext=True) or ""
    n2 = len(seq2)
    lines = [l for l in hits.split("\n") if l]
    for line in minus.split("\n"):
        m = _HIT_RE.match(line)
        if not m:
            continue
        s2s, s2e = n2 + 1 - int(m.group(5)), n2 + 1 - int(m.group(6))
        lines.append(f"{m.group(1)} {m.group(2)} {m.group(3)}; "
                     f"{m.group(4)} {s2s} {s2e}; "
                     f"score = {m.group(7)} (-)")
    try:
        smap = supermap("\n".join(lines) + "\n", {name1: len(seq1)},
                        {name2: len(seq2)}, score_text=score_text)
    except RuntimeError:
        return []

    out = []
    for line in smap.split("\n"):
        m = _SMAP_RE.match(line)
        if not m:
            continue
        b1, e1 = int(m.group(2)), int(m.group(3))
        b2, e2 = int(m.group(5)), int(m.group(6))
        strand = m.group(7)
        sub1 = seq1[b1 - 1:e1]
        sub2 = seq2[b2 - 1:e2]
        if strand == "-":
            sub2 = sub2.translate(_RC)[::-1]
        rows = align_pair_exact(sub1, sub2)
        out.append({"s1": (b1, e1), "s2": (b2, e2), "strand": strand,
                    "type": m.group(8), "n_aligns": int(m.group(9)),
                    "rows": rows})
    return out
