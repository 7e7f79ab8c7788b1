"""Prolagan driver: progressive alignment of two pre-aligned profiles.

Behavioral port of the reference binary (src/lagan/src/prolagan.c, unused
by C-Sibelia but shipped with the LAGAN toolkit): every input sequence
must belong to exactly one of the two gapped profiles; anchors are
computed pairwise across profiles (rechaos without -gfc,
prolagan.c:290-337), remapped through each profile's gap structure into
profile-column coordinates (prolagan.c:1030-1047), collapsed along the
given phylogenetic tree, and one profile-profile DP produces the merged
alignment (processAlign, prolagan.c:564-580).

Note: the reference's else-branch remap (prolagan.c:1045) indexes
pro1ptr with the wrong loop counter — undefined behavior when profile
memberships interleave in file order; this port uses the row of the
sequence actually being remapped.
"""
from __future__ import annotations

import re

from ..native import load_lagan, prolagan_native
from .lagan_exact import rechaos

_ANCHOR_RE = re.compile(r"\((\d+) (\d+)\)=\((\d+) (\d+)\) (.*)")


def available() -> bool:
    return load_lagan() is not None


def parse_profile(fasta_text: str) -> list[tuple[str, str]]:
    """(name, gapped_row) pairs from a gapped FASTA profile."""
    rows: list[tuple[str, str]] = []
    name = None
    cur: list[str] = []
    for line in fasta_text.split("\n"):
        if line.startswith(">"):
            if name is not None:
                rows.append((name, "".join(cur)))
            name = line[1:].strip()
            cur = []
        elif line.strip():
            cur.append(line.strip())
    if name is not None:
        rows.append((name, "".join(cur)))
    return rows


def prolagan_fasta(seqs: list[bytes], names: list[str],
                   profile1: list[tuple[str, str]],
                   profile2: list[tuple[str, str]],
                   tree: str) -> str:
    """FASTA text of the profile-profile alignment (prolagan stdout).

    profile1/profile2: (seq name, gapped row) pairs; each name must match
    exactly one entry of ``names`` (getSeqNumber, prolagan.c:151-160) and
    the row's ungapped letters must equal that sequence.
    """
    n = len(seqs)
    by_name = {nm: i for i, nm in enumerate(names)}
    profs: list[list[tuple[int, str]]] = []
    seen: set[int] = set()
    for prof in (profile1, profile2):
        rows: list[tuple[int, str]] = []
        for nm, row in prof:
            if nm not in by_name:
                raise ValueError(f"profile row {nm!r} not among input sequences")
            idx = by_name[nm]
            if idx in seen:
                raise ValueError(f"sequence {nm!r} found in both profiles")
            seen.add(idx)
            if row.replace("-", "").upper().encode() != seqs[idx].upper():
                raise ValueError(f"profile row {nm!r} does not match sequence")
            rows.append((idx, row))
        profs.append(rows)
    if len(seen) != n:
        missing = [nm for nm, i in by_name.items() if i not in seen]
        raise ValueError(f"sequences not found in either profile: {missing}")

    pair_lines: dict[tuple[int, int], list] = {}
    for a, _ in profs[0]:
        for b, _ in profs[1]:
            i, j = (a, b) if a < b else (b, a)
            text = rechaos(seqs[i], names[i], seqs[j], names[j], gfc=False)
            lines = []
            for line in text.split("\n"):
                m = _ANCHOR_RE.match(line)
                if m:
                    lines.append((int(m.group(1)), int(m.group(2)),
                                  int(m.group(3)), int(m.group(4)),
                                  float(m.group(5))))
            pair_lines[(i, j)] = lines
    out = prolagan_native(seqs, names, profs, pair_lines, tree)
    if out is None:
        raise RuntimeError("prolagan: malformed tree or native engine missing")
    return out


def align_profiles(seqs: list[bytes], names: list[str],
                   profile1: list[tuple[str, str]],
                   profile2: list[tuple[str, str]],
                   tree: str) -> list[str]:
    """Aligned rows re-ordered to match ``names``."""
    fasta = prolagan_fasta(seqs, names, profile1, profile2, tree)
    rows: dict[str, str] = {}
    cur_name = None
    cur: list[str] = []
    for line in fasta.split("\n"):
        if line.startswith(">"):
            if cur_name is not None:
                rows[cur_name] = "".join(cur)
            cur_name = line[1:]
            cur = []
        elif line:
            cur.append(line)
    if cur_name is not None:
        rows[cur_name] = "".join(cur)
    return [rows[nm] for nm in names]
