"""Drop-in ``glocal`` CLI (reference: src/lagan/src/glocal/glocal.cpp
main — ``glocal hitfile scorefile`` printing the max chain to stdout)."""
from __future__ import annotations

import sys

from ..align.glocal import DEFAULT_SCORE, glocal_chain


def run(argv: list[str]) -> int:
    if not argv or len(argv) > 2:
        print("usage: glocal hitfile [scorefile]", file=sys.stderr)
        return 1
    hits = open(argv[0]).read()
    score = open(argv[1]).read() if len(argv) > 1 else DEFAULT_SCORE
    sys.stdout.write(glocal_chain(hits, score))
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
