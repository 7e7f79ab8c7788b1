"""Bulge detection and greedy collapse — the graph simplification engine.

Semantics-exact re-expression of the reference's bulge removal
(reference: src/bulgeremoval.cpp, src/blockfinder.cpp:16-51) over flat
arrays. All walks operate on per-position bifurcation-mark arrays instead
of pointer chasing; the collapse is a span splice plus the reference's
erase / replace / re-add protocol:

  1. EraseBifurcations (bulgeremoval.cpp:55-95): drop every bifurcation
     point on both strands across the target branch, recording the marks
     overlapping the start k-mer (opposite strand, "lookBack") and the
     end k-mer (branch strand, "lookForward").
  2. DNASequence::Replace (dnasequence.cpp:189-252): overwrite the target
     branch interior with the source branch's spelling, then linearly
     interpolate original positions over the new span (float64
     accumulation, truncation, clamped at the following element's
     original position — replicated exactly).
  3. UpdateBifurcations (bulgeremoval.cpp:238-282): re-add the recorded
     flank marks at the same k-mer offsets, then copy every mark of the
     source branch onto the corresponding target element, both strands.

A strand position is (strand, chr, pos) in the positive frame; advancing
n steps on strand s lands at pos + n (s=0) or pos - n (s=1).
"""
from __future__ import annotations

import bisect

import numpy as np

from ..core.boost_unordered import Boost154Map
from .bifstore import NO_BIFURCATION, BifStore
from .sequence import COMP_LUT, MutableSequence

EMPTY = ord(" ")


def _advance(pos: int, strand: int, n: int) -> int:
    return pos + n if strand == 0 else pos - n


def _proper_kmer(seq: MutableSequence, strand: int, c: int, pos: int, k: int) -> bool:
    """k consecutive valid positions from (strand, c, pos)
    (reference: src/dnasequence.h:154-165)."""
    if strand == 0:
        return pos >= 0 and pos + k <= seq.chr_len(c)
    return pos < seq.chr_len(c) and pos - k >= -1


def _end_char(seq: MutableSequence, strand: int, c: int, pos: int, k: int) -> int:
    """Char spelled at branch element k."""
    q = _advance(pos, strand, k)
    return seq.char_at(strand, c, q)


def _fill_visit(store: BifStore, strand: int, c: int, pos: int,
                min_branch: int) -> list[tuple[int, int]]:
    """Bif marks on the branch from (strand,c,pos), sorted by (bifId, step)
    (reference: bulgeremoval.cpp:122-146)."""
    start = store.get_bif(strand, c, pos)
    steps, nodes = store.scan_forward(strand, c, pos, min_branch)
    out = []
    nb = store.node_bif
    for s, nidx in zip(steps.tolist(), nodes.tolist()):
        b = int(nb[nidx])
        if b == start:
            break
        out.append((b, s))
    out.sort()
    return out


def _any_bulges(store: BifStore, start_nodes: list[int], end_char: list[int],
                min_branch: int) -> list[list[int]]:
    """Find groups of branches that meet at a shared downstream bifurcation
    with differing leading chars (reference: bulgeremoval.cpp:158-218).

    The reference collects candidates in a boost::unordered_map and emits
    bulges in its ITERATION order, which decides collapse order — we use an
    exact boost-1.54 container emulation (core/boost_unordered.py)."""
    visit = Boost154Map()
    nb = store.node_bif
    for i, idx in enumerate(start_nodes):
        if end_char[i] == EMPTY:
            continue
        strand = int(store.node_strand[idx])
        c = int(store.node_chr[idx])
        pos = int(store.node_pos[idx])
        start = store.get_bif(strand, c, pos)
        steps, nodes = store.scan_forward(strand, c, pos, min_branch)
        for _, nidx in zip(steps.tolist(), nodes.tolist()):
            b = int(nb[nidx])
            if b == start:
                break
            entry = visit.find(b)
            if entry is None:
                visit.insert(b, (end_char[i], [i]))
            elif entry[0] != end_char[i]:
                entry[1].append(i)
                break
    return [v[1] for _, v in visit.items() if len(v[1]) > 1]


def _overlap(store: BifStore, k: int, a_idx: int, a_dist: int,
             b_idx: int, b_dist: int) -> bool:
    """Do the two branches share sequence elements?
    (reference: bulgeremoval.cpp:97-120 via element ids; here: positive-
    frame interval intersection, which is equivalent)."""
    ca = int(store.node_chr[a_idx])
    cb = int(store.node_chr[b_idx])
    if ca != cb:
        return False

    def span(idx, dist):
        s = int(store.node_strand[idx])
        p = int(store.node_pos[idx])
        if s == 0:
            return p, p + dist + k
        return p - dist - k + 1, p + 1

    a0, a1 = span(a_idx, a_dist)
    b0, b1 = span(b_idx, b_dist)
    return a0 < b1 and b0 < a1


def _max_bif_multiplicity(store: BifStore, idx: int, distance: int) -> int:
    """Max bifurcation multiplicity over branch interior steps 1..distance-1
    (reference: bulgeremoval.cpp:39-53; counts include lazily-dead entries).
    """
    strand = int(store.node_strand[idx])
    c = int(store.node_chr[idx])
    pos = int(store.node_pos[idx])
    steps, nodes = store.scan_forward(strand, c, pos, distance)
    ret = 0
    nb = store.node_bif
    for nidx in nodes.tolist():
        ret = max(ret, store.count_bifurcations(int(nb[nidx])))
    return ret


TRACE = None  # set to a file-like object to trace collapses (debug parity)
_TRACE_COUNT = [0]


def _trace_path(seq, store, idx, dist, k):
    s = int(store.node_strand[idx])
    c = int(store.node_chr[idx])
    p = int(store.node_pos[idx])
    glob = sum(seq.chr_len(j) + 1 for j in range(c)) + p
    return (("+" if s == 0 else "-") + str(glob) + " "
            + seq.spell(s, c, p, dist + k).decode())


def collapse_bulge(seq: MutableSequence, store: BifStore, k: int,
                   src_idx: int, src_dist: int,
                   tgt_idx: int, tgt_dist: int) -> None:
    """Collapse one bulge: rewrite the target branch with the source branch
    (reference: bulgeremoval.cpp:284-327)."""
    if TRACE is not None:
        TRACE.write(f"Bulge #{_TRACE_COUNT[0]}\n")
        _TRACE_COUNT[0] += 1
        TRACE.write("Source branch: \n")
        TRACE.write(_trace_path(seq, store, src_idx, src_dist, k) + "\n")
        TRACE.write("Target branch: \n")
        TRACE.write(_trace_path(seq, store, tgt_idx, tgt_dist, k) + "\n")
    s_t = int(store.node_strand[tgt_idx])
    c_t = int(store.node_chr[tgt_idx])
    p_t = int(store.node_pos[tgt_idx])
    s_s = int(store.node_strand[src_idx])
    c_s = int(store.node_chr[src_idx])
    p_s = int(store.node_pos[src_idx])
    td, sd = tgt_dist, src_dist

    # 1. EraseBifurcations -------------------------------------------------
    look_back: list[tuple[int, int]] = []
    look_forward: list[tuple[int, int]] = []
    for i in range(k):
        a_coord = p_t + k - 1 - i if s_t == 0 else p_t - (k - 1 - i)
        b = store.get_bif(1 - s_t, c_t, a_coord)
        if b != NO_BIFURCATION:
            store.erase_point(1 - s_t, c_t, a_coord)
            look_back.append((i, b))
        b_coord = _advance(p_t, s_t, td + i)
        b = store.get_bif(s_t, c_t, b_coord)
        if b != NO_BIFURCATION:
            store.erase_point(s_t, c_t, b_coord)
            look_forward.append((i, b))
    for e in range(k + td):
        if e > 0:
            store.erase_point(s_t, c_t, _advance(p_t, s_t, e))
        store.erase_point(1 - s_t, c_t, _advance(p_t, s_t, k + td - 1 - e))

    # 2. Replace -----------------------------------------------------------
    src_interior = seq.spell(s_s, c_s, _advance(p_s, s_s, k), sd)
    content = np.frombuffer(src_interior, dtype=np.uint8)
    if s_t == 0:
        span_start, span_stop = p_t + k, p_t + k + td
    else:
        span_start, span_stop = p_t - k - td + 1, p_t - k + 1
        content = COMP_LUT[content][::-1]
    first_pos = int(seq.origpos[c_t][span_start])
    last_pos = seq.origpos_at(c_t, span_start + td)
    seq.splice(c_t, span_start, span_stop, content)
    store.apply_splice(c_t, span_start, span_stop, sd)
    # original-position interpolation (reference: dnasequence.cpp:221-227;
    # float64 accumulation with truncation, clamped at last_pos)
    acc = float(first_pos)
    ssize = float(td) / float(sd)
    op = seq.origpos[c_t]
    for step in range(sd):
        op[span_start + step] = min(last_pos, int(acc))
        acc += ssize

    # 3. UpdateBifurcations ------------------------------------------------
    p_t = int(store.node_pos[tgt_idx])  # re-read: splice may have shifted
    p_s = int(store.node_pos[src_idx])
    anear = bnear = 0
    for i in range(k):
        a_coord = p_t + k - 1 - i if s_t == 0 else p_t - (k - 1 - i)
        if anear < len(look_back) and look_back[anear][0] == i:
            store.add_point(1 - s_t, c_t, a_coord, look_back[anear][1])
            anear += 1
        b_coord = _advance(p_t, s_t, sd + i)
        if bnear < len(look_forward) and look_forward[bnear][0] == i:
            store.add_point(s_t, c_t, b_coord, look_forward[bnear][1])
            bnear += 1
    for i in range(sd + 1):
        b = store.get_bif(s_s, c_s, _advance(p_s, s_s, i))
        if b != NO_BIFURCATION:
            store.add_point(s_t, c_t, _advance(p_t, s_t, i), b)
        off = sd + k - 1 - i
        b = store.get_bif(1 - s_s, c_s, _advance(p_s, s_s, off))
        if b != NO_BIFURCATION:
            store.add_point(1 - s_t, c_t, _advance(p_t, s_t, off), b)


def remove_bulges(seq: MutableSequence, store: BifStore, k: int,
                  min_branch: int, bif_id: int) -> int:
    """Process one vertex id (reference: bulgeremoval.cpp:330-431)."""
    ret = 0
    start_nodes = store.list_positions(bif_id)
    if len(start_nodes) < 2:
        return ret

    end_char = []
    for idx in start_nodes:
        strand = int(store.node_strand[idx])
        c = int(store.node_chr[idx])
        pos = int(store.node_pos[idx])
        if _proper_kmer(seq, strand, c, pos, k + 1):
            end_char.append(_end_char(seq, strand, c, pos, k))
        else:
            end_char.append(EMPTY)

    bulges = _any_bulges(store, start_nodes, end_char, min_branch)
    if not bulges:
        return ret

    nb = store.node_bif
    for bulge in bulges:
        for id_i in range(len(bulge)):
            kmer_i = bulge[id_i]
            node_i = start_nodes[kmer_i]
            if not store.node_valid(node_i):
                continue
            si = int(store.node_strand[node_i])
            ci = int(store.node_chr[node_i])
            pi = int(store.node_pos[node_i])
            visit = _fill_visit(store, si, ci, pi, min_branch)
            for id_j in range(id_i + 1, len(bulge)):
                kmer_j = bulge[id_j]
                node_j = start_nodes[kmer_j]
                if not store.node_valid(node_j) or end_char[kmer_i] == end_char[kmer_j]:
                    continue
                sj = int(store.node_strand[node_j])
                cj = int(store.node_chr[node_j])
                pj = int(store.node_pos[node_j])
                steps, nodes = store.scan_forward(sj, cj, pj, min_branch)
                for step, nidx in zip(steps.tolist(), nodes.tolist()):
                    now_bif = int(nb[nidx])
                    if now_bif == bif_id:
                        break
                    at = bisect.bisect_left(visit, (now_bif, 0))
                    if at < len(visit) and visit[at][0] == now_bif:
                        j_dist = step
                        i_dist = visit[at][1]
                        if _overlap(store, k, node_i, i_dist, node_j, j_dist):
                            break
                        ret += 1
                        imlp = _max_bif_multiplicity(store, node_i, i_dist)
                        jmlp = _max_bif_multiplicity(store, node_j, j_dist)
                        iless = imlp > jmlp or (imlp == jmlp and kmer_i < kmer_j)
                        if iless:
                            end_char[kmer_j] = end_char[kmer_i]
                            collapse_bulge(seq, store, k, node_i, i_dist, node_j, j_dist)
                        else:
                            end_char[kmer_i] = end_char[kmer_j]
                            collapse_bulge(seq, store, k, node_j, j_dist, node_i, i_dist)
                            pi = int(store.node_pos[node_i])
                            visit = _fill_visit(store, si, ci, pi, min_branch)
                        break

    store.cleanup()
    return ret


def simplify_graph(seq: MutableSequence, store: BifStore, k: int,
                   min_branch: int, max_iterations: int,
                   progress=None, invariant_check=None) -> int:
    """Reference: src/blockfinder.cpp:16-51. Note the reference accumulates
    `totalBulges` across iterations without resetting, so once any bulge is
    found the loop always runs the full max_iterations.

    invariant_check: optional callable run after every vertex whose
    bulge removal collapsed something — the _DEBUG-mode Test() hook
    (bulgeremoval.cpp:301,324); wire with SIBELIA_TPU_CHECK=1."""
    total_bulges = 0
    iterations = 0
    # 50-dot bar pacing exactly as the reference (blockfinder.cpp:28-40)
    count = 0
    total_progress = 0
    threshold = max(1, ((store.max_id + 1) * max_iterations) // 50)
    if progress is not None:
        progress(0, 0)
    while True:
        iterations += 1
        for bif_id in range(store.max_id + 1):
            removed = remove_bulges(seq, store, k, min_branch, bif_id)
            total_bulges += removed
            if removed and invariant_check is not None:
                invariant_check()
            count += 1
            if count >= threshold and progress is not None:
                count = 0
                total_progress = min(total_progress + 1, 50)
                progress(total_progress, 1)
        if not (total_bulges > 0 and iterations < max_iterations):
            break
    if progress is not None:
        progress(50, 2)
    return total_bulges
