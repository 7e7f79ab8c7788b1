"""Drop-in ``supermap`` CLI (reference: src/lagan/supermap.pl flag
surface for the file-based CHAOS workflow; GPDB/cluster options are out
of scope — everything runs in process)."""
from __future__ import annotations

import argparse
import sys

from ..align.glocal import DEFAULT_SCORE
from ..align.supermap import supermap


def _read_sizes(path: str) -> dict[str, int]:
    sizes = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 2:
            sizes[parts[0]] = int(parts[1])
    return sizes


def run(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="supermap", add_help=True)
    p.add_argument("infile", nargs="?", help="CHAOS hit file")
    p.add_argument("-infile", dest="infile_opt")
    p.add_argument("-sizes1", required=True)
    p.add_argument("-sizes2", required=True)
    p.add_argument("-outfile", default="supermap.out")
    p.add_argument("-score", help="SLAGAN score file")
    p.add_argument("-glocal_out", help="save intermediate glocal chains")
    p.add_argument("-bacteria", action="store_true")
    p.add_argument("-expand_length", type=int, default=30000)
    p.add_argument("-max_length", type=int, default=1500000)
    p.add_argument("-min_seq_score", type=int, default=None)
    p.add_argument("-no_aligntotals", action="store_true")
    p.add_argument("-print_chains", action="store_true")
    p.add_argument("-f", action="store_true")  # accepted; always overwrite
    p.add_argument("-q", action="store_true")
    p.add_argument("-v", action="store_true")
    p.add_argument("-no_clust_run", action="store_true")  # always local
    args = p.parse_args(argv)

    infile = args.infile or args.infile_opt
    if not infile:
        p.error("input hit file required")
    score_text = open(args.score).read() if args.score else DEFAULT_SCORE
    out = supermap(open(infile).read(),
                   _read_sizes(args.sizes1), _read_sizes(args.sizes2),
                   score_text=score_text,
                   min_seq_score=args.min_seq_score,
                   max_expand_len=args.expand_length,
                   max_chainlen=args.max_length,
                   proflip=args.bacteria,
                   print_chains=args.print_chains,
                   no_aligntotals=args.no_aligntotals)
    with open(args.outfile, "w") as fh:
        fh.write(out)
    if not args.q:
        print(f"supermap: Output written to {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
