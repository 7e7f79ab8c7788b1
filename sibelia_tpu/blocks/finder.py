"""BlockFinder: pipeline state across simplification stages.

Reference: src/blockfinder.{h,cpp}. Holds the working sequence (raw_seq)
and per-element original positions; each stage rebuilds the index at that
stage's k, simplifies, and writes the shrunken sequence back.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.glibc_rand import GlibcRand
from ..graph.indexed import build_index
from ..graph.sequence import MutableSequence
from ..graph.simplify import simplify_graph
from ..io.fasta import FASTARecord
from .edges import list_edges
from .instance import BlockInstance
from .synteny import generate_synteny_blocks


class BlockFinder:
    def __init__(self, chr_list: list[FASTARecord], rand: GlibcRand | None = None):
        self.chr_list = chr_list
        self.rand = rand if rand is not None else GlibcRand(1)
        # working sequence as uint8 arrays (adopted by MutableSequence
        # each stage without copying; rebound from it afterwards)
        self.raw_seq: list[np.ndarray] = [
            np.frombuffer(r.sequence.encode(), dtype=np.uint8).copy()
            for r in chr_list]
        self.original_size = [len(s) for s in self.raw_seq]
        self.original_pos = [np.arange(len(s), dtype=np.int32) for s in self.raw_seq]

    def perform_graph_simplifications(self, k: int, min_branch: int,
                                      max_iterations: int,
                                      progress=None) -> int:
        """Reference: blockfinder.cpp:78-98. Uses the native C++ engine
        when available (sibelia_tpu/native), else the Python engine —
        both produce identical results (tests/test_native_engine.py)."""
        from ..core import timings
        from ..graph import simplify as simplify_mod
        from ..graph.indexed import randomize_and_enumerate, store_from_enum
        from ..native import simplify_native
        seq = MutableSequence(self.raw_seq, self.original_pos)
        # seq ADOPTS the arrays (no copy); drop the finder's aliases so
        # the native engine's buffer release (simplify_native) actually
        # frees them — they are rebound from seq below either way
        self.raw_seq = self.original_pos = None
        with timings.phase("enumeration"):
            enum = randomize_and_enumerate(seq, k, self.rand, min_branch)
        ret = None
        check = os.environ.get("SIBELIA_TPU_CHECK") == "1"
        if simplify_mod.TRACE is None and not check:
            with timings.phase("simplification"):
                ret = simplify_native(seq, enum, k, min_branch,
                                      max_iterations,
                                      candidates=enum.candidates,
                                      release_enum=True, progress=progress)
        if ret is None:
            store = store_from_enum(seq, enum)
            checker = None
            if check:
                # runtime invariant mode (IndexedSequence::Test twin)
                from ..graph.indexed import check_invariants, kmer_id_map
                idmap = kmer_id_map(seq, enum, k)
                check_invariants(seq, store, k, idmap)
                checker = lambda: check_invariants(seq, store, k, idmap)
            ret = simplify_graph(seq, store, k, min_branch, max_iterations,
                                 progress, invariant_check=checker)
        self.raw_seq = seq.chars
        self.original_pos = seq.origpos
        return ret

    def generate_synteny_blocks(self, k: int, trim_k: int, min_size: int,
                                shared_only: bool = False,
                                progress=None) -> list[BlockInstance]:
        from ..core import timings
        with timings.phase("block_generation"):
            return generate_synteny_blocks(
                self.chr_list, self.raw_seq, self.original_pos,
                self.original_size, k, trim_k, min_size, shared_only,
                self.rand, list_edges, progress=progress)

    def serialize_condensed_graph(self, k: int, out, progress=None) -> None:
        """Reference: serialization.cpp:88-110 (dot format); progress =
        PutProgressChr-style bar over the edge list (sibelia.cpp:261)."""
        seq = MutableSequence(self.raw_seq, self.original_pos)
        store = build_index(seq, k, self.rand)
        edges = list_edges(seq, store, k)
        if progress is not None:
            progress(0, 0)
        out.write("digraph G\n{\n")
        out.write("rankdir=LR\n")
        # pace the 50-dot bar over the edge list, as the reference's
        # PutProgressChr does over its serialization work
        n_edges = len(edges)
        for i, e in enumerate(edges):
            if progress is not None and n_edges:
                progress((i + 1) * 50 // n_edges, 1)
            color = "blue" if e.direction == 0 else "red"
            out.write(
                f"{e.start_vertex} -> {e.end_vertex} "
                f"[color=\"{color}\", label=\"chr={e.chr} pos={e.actual_position} "
                f"len={e.actual_length} orpos={e.original_position} "
                f"orlen={e.original_length}  ch='{chr(e.first_char)}'\"];\n")
        out.write("}\n")
        if progress is not None:
            progress(50, 2)


# ---------------------------------------------------------------------------
# Checkpoint / resume (new aux capability; the reference has none — its
# inter-stage state is exactly (rawSeq_, originalPos_), blockfinder.cpp:85-95,
# which is what gets persisted here, plus the N-randomization rand state)
# ---------------------------------------------------------------------------

def save_checkpoint(finder: "BlockFinder", path: str, stage_idx: int,
                    history=None) -> None:
    """Persist the inter-stage pipeline state after stage `stage_idx`."""
    import pickle
    arrays = {}
    for i, (s, op) in enumerate(zip(finder.raw_seq, finder.original_pos)):
        arrays[f"seq_{i}"] = np.asarray(s, dtype=np.uint8)
        arrays[f"op_{i}"] = op
    arrays["rand_buf"] = np.asarray(finder.rand._buf, dtype=np.int64)
    arrays["meta"] = np.asarray([stage_idx, len(finder.raw_seq)],
                                dtype=np.int64)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    with open(path + ".hist.tmp", "wb") as h:
        h.write(pickle.dumps(history))
    os.replace(tmp, path)
    os.replace(path + ".hist.tmp", path + ".hist")


def load_checkpoint(finder: "BlockFinder", path: str):
    """Restore pipeline state; returns (stage_idx, history)."""
    import pickle
    data = np.load(path)
    stage_idx, n_chr = (int(x) for x in data["meta"])
    finder.raw_seq = [data[f"seq_{i}"].copy() for i in range(n_chr)]
    finder.original_pos = [data[f"op_{i}"].astype(np.int32) for i in range(n_chr)]
    finder.rand._buf = [int(x) for x in data["rand_buf"]]
    with open(path + ".hist", "rb") as h:
        history = pickle.loads(h.read())
    return stage_idx, history
