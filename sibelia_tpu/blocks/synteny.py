"""Synteny block generation: edge grouping, overlap resolution, trimming.

Reference: src/synteny.cpp. Order-sensitive steps use the libstdc++
std::sort emulation (core/stdsort.py) because the reference's output
depends on the exact permutation unstable sorts leave equal elements in.
"""
from __future__ import annotations

import numpy as np

from ..core.glibc_rand import GlibcRand
from ..core.stdsort import group_by, std_sort
from ..graph.indexed import build_index
from ..graph.sequence import MutableSequence
from ..io.fasta import FASTARecord
from .edges import Edge
from .instance import BlockInstance

POS_FREE = 0
POS_OCCUPIED = 1
_OO = (1 << 32) - 1  # reference: const size_t oo = UINT_MAX (synteny.cpp:42)


def _cmp_edges_naturally(a: Edge, b: Edge) -> bool:
    return a.group_key() < b.group_key()


def _cmp_edges_by_direction(a: Edge, b: Edge) -> bool:
    return a.direction < b.direction


def resolve_overlap(group: list[Edge], min_size: int,
                    overlap: list[np.ndarray]) -> list[Edge]:
    """Greedy per-edge claim of the longest free original-coordinate run
    (reference: synteny.cpp:124-166). `overlap` is the global occupancy;
    claims within this group are tracked locally and only committed by the
    caller after trimming succeeds."""
    now_block: list[Edge] = []
    local: dict[int, np.ndarray] = {}
    for e in group:
        chr_n = e.chr
        start = e.original_position
        end = start + e.original_length
        glob = overlap[chr_n][start:end]
        loc = local.get(chr_n)
        if loc is None:
            free = glob == POS_FREE
        else:
            free = (glob == POS_FREE) & (~loc[start:end])
        # first maximal run of maximum length (strictly-greater updates)
        padded = np.concatenate([[False], free, [False]])
        d = np.diff(padded.astype(np.int8))
        run_starts = np.flatnonzero(d == 1)
        run_ends = np.flatnonzero(d == -1)
        best_start = best_end = 0
        for rs, re_ in zip(run_starts.tolist(), run_ends.tolist()):
            if re_ - rs > best_end - best_start:
                best_start, best_end = rs, re_
        if best_end - best_start >= min_size:
            if loc is None:
                loc = np.zeros(len(overlap[chr_n]), dtype=bool)
                local[chr_n] = loc
            loc[start + best_start:start + best_end] = True
            now_block.append(Edge(e.chr, e.direction, e.start_vertex, e.end_vertex,
                                  e.actual_position, e.actual_length,
                                  start + best_start, best_end - best_start,
                                  e.first_char))
    return now_block


def trim_blocks(chr_list: list[FASTARecord], block: list[Edge], trim_k: int,
                min_size: int, rand: GlibcRand | None) -> bool:
    """Trim each copy to the outermost trim_k-mer shared with another copy
    (reference: synteny.cpp:31-122). Mutates `block` in place; returns True
    if some copy had no shared k-mer at all (caller loops to fixpoint)."""
    block_seq = []
    for e in block:
        s = chr_list[e.chr].sequence[e.original_position:
                                     e.original_position + e.original_length]
        block_seq.append(s.encode())
    seq = MutableSequence(block_seq)
    store = build_index(seq, trim_k, rand)

    drop = False
    ret: list[Edge] = []
    for chr_i, e in enumerate(block):
        d = e.direction
        L = seq.chr_len(chr_i)
        # walk coordinates in strand order; distances use original positions
        # which are the identity here (fresh unsimplified index)
        begin_coord = 0 if d == 0 else L - 1
        end_coord = L - 1 if d == 0 else 0
        min_bif_start = min_bif_end = _OO
        min_start_sum = min_end_sum = _OO
        trim_start = trim_end = None
        walk = range(L) if d == 0 else range(L - 1, -1, -1)
        arr = store.bif_at[d][chr_i]
        nb = store.node_bif
        nchr = store.node_chr
        npos = store.node_pos
        nstr = store.node_strand
        for coord in walk:
            nidx = arr[coord]
            if nidx < 0:
                continue
            bif_id = int(nb[nidx])
            for kidx in store.list_positions(bif_id):
                kmer_chr = int(nchr[kidx])
                if kmer_chr == chr_i:
                    continue
                kc = int(npos[kidx])
                kd = block[kmer_chr].direction
                kl = seq.chr_len(kmer_chr)
                k_begin = 0 if kd == 0 else kl - 1
                k_end = kl - 1 if kd == 0 else 0
                kmer_start_dist = abs(kc - k_begin)
                kmer_end_dist = abs(kc - k_end)
                it_start_dist = abs(coord - begin_coord)
                it_end_dist = abs(coord - end_coord)
                now_start = kmer_start_dist + it_start_dist
                now_end = kmer_end_dist + it_end_dist
                if now_start < min_start_sum or (now_start == min_start_sum
                                                 and bif_id < min_bif_start):
                    min_bif_start = bif_id
                    min_start_sum = now_start
                    trim_start = coord
                if now_end < min_end_sum or (now_end == min_end_sum
                                             and bif_id < min_bif_end):
                    min_bif_end = bif_id
                    min_end_sum = now_end
                    trim_end = coord
        if min_start_sum < _OO and min_end_sum < _OO:
            size = abs(trim_start - trim_end) + trim_k
            if size >= min_size:
                te = trim_end + (trim_k - 1) if d == 0 else trim_end - (trim_k - 1)
                start = e.original_position + min(trim_start, te)
                end = e.original_position + max(trim_start, te) + 1
                ret.append(Edge(e.chr, e.direction, e.start_vertex, e.end_vertex,
                                e.actual_position, e.actual_length,
                                start, end - start, e.first_char))
        else:
            drop = True
    block[:] = ret
    return drop


def generate_synteny_blocks(chr_list: list[FASTARecord],
                            raw_seq: list[bytes],
                            original_pos: list[np.ndarray],
                            original_size: list[int],
                            k: int, trim_k: int, min_size: int,
                            shared_only: bool,
                            rand: GlibcRand | None,
                            list_edges_fn) -> list[BlockInstance]:
    """Reference: BlockFinder::GenerateSyntenyBlocks (synteny.cpp:229-287)."""
    overlap = [np.zeros(sz, dtype=np.int8) for sz in original_size]

    seq = MutableSequence(raw_seq, original_pos)
    store = build_index(seq, k, rand)
    edges = list_edges_fn(seq, store, k)

    block: list[BlockInstance] = []
    block_count = 1
    edges = [e for e in edges if e.original_length >= min_size]
    groups = group_by(edges, _cmp_edges_naturally)
    std_sort(groups, lambda a, b: (a[1] - a[0]) > (b[1] - b[0]))
    for g0, g1 in groups:
        seg = edges[g0:g1]
        std_sort(seg, _cmp_edges_by_direction)
        edges[g0:g1] = seg
        if g1 - g0 < 2 or not any(e.direction == 0 for e in seg):
            continue
        now_block = resolve_overlap(seg, min_size, overlap)
        while trim_blocks(chr_list, now_block, trim_k, min_size, rand):
            pass
        occur = [0] * len(raw_seq)
        for e in now_block:
            occur[e.chr] += 1
        if len(now_block) > 1 and (not shared_only
                                   or occur.count(1) == len(raw_seq)):
            for e in now_block:
                strand = +1 if e.direction == 0 else -1
                start = e.original_position
                end = start + e.original_length
                overlap[e.chr][start:end] = POS_OCCUPIED
                block.append(BlockInstance(block_count * strand,
                                           chr_list[e.chr], start, end))
            block_count += 1

    std_sort(block, lambda a, b: (a.chr_id, a.start) < (b.chr_id, b.start))
    return block
