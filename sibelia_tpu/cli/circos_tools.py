"""Circos helper tools: sequence sorting and hiding mapped contigs.

Ports of reference src/utils/sortsequences.py and hidemappedcontigs.py
(see reference CIRCOS_HELPER.md for usage semantics).
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys


def sort_sequences(argv: list[str]) -> int:
    """Append a circos `chromosomes_order` line derived from orderchr."""
    parser = argparse.ArgumentParser(
        description="A script for sorting sequences in Sibelia output.")
    parser.add_argument("-o", "--out_config", default=None)
    parser.add_argument("input_folder")
    parser.add_argument("orderchr_path")
    args = parser.parse_args(argv)

    circos_folder = os.path.join(args.input_folder, "circos")
    out_config = args.out_config or os.path.join(circos_folder, "sorted.circos.conf")
    cmd = ["perl", args.orderchr_path,
           "-links", os.path.join(circos_folder, "circos.segdup.txt"),
           "-karyotype", os.path.join(circos_folder, "circos.sequences.txt")]
    order = ""
    try:
        out = subprocess.run(cmd, capture_output=True, text=True).stdout
        for line in out.splitlines():
            if "chromosomes_order" in line:
                order = line
                break
    except OSError:
        pass
    shutil.copy(os.path.join(circos_folder, "circos.conf"), out_config)
    with open(out_config, "a") as f:
        f.write(order + "\n")
    return 0


def _read_permutations(lines: list[str]):
    lines = [ln.strip() for ln in lines if ln.strip()]
    perm = []
    for i in range(0, len(lines), 2):
        pid = lines[i][1:]
        body = [int(n) for n in lines[i + 1].split()[:-1]]
        perm.append((pid, body))
    return perm


def _match(reference: list[int], query: list[int]) -> bool:
    m, n = len(query), len(reference)
    for i in range(0, n - m + 1):
        if all(a == b for a, b in zip(reference[i:i + m], query)):
            return True
    return False


def hide_mapped_contigs(argv: list[str]) -> int:
    """Generate circos configs hiding contigs whose signed permutation
    embeds perfectly in a reference permutation."""
    parser = argparse.ArgumentParser(
        description="Hides all perfectly mapped contigs on the circos picture.")
    parser.add_argument("input_folder")
    parser.add_argument("reference")
    parser.add_argument("-o", "--out_config", default=None)
    parser.add_argument("-i", "--in_config", default="circos.conf")
    args = parser.parse_args(argv)

    circos_folder = os.path.join(args.input_folder, "circos")
    out_config = args.out_config or os.path.join(circos_folder, "unmapped.circos.conf")
    with open(os.path.join(args.input_folder, "genomes_permutations.txt")) as f:
        perm = _read_permutations(f.readlines())
    reference_header = [ln[1:].strip() for ln in open(args.reference)
                        if ln.startswith(">")]

    def is_reference(h):
        return any(h in header for header in reference_header)

    reference_perm = [p for p in perm if is_reference(p[0])]
    ref_headers = {p[0] for p in reference_perm}
    leave = []
    for header, body in perm:
        if header in ref_headers:
            continue
        neg = [-x for x in reversed(body)]
        if not any(_match(rbody, body) or _match(rbody, neg)
                   for _, rbody in reference_perm):
            leave.append(header)

    karyotype = os.path.join(circos_folder, "circos.sequences.txt")
    id_to_seq = {}
    for ln in open(karyotype):
        parts = ln.split()
        if len(parts) >= 4:
            id_to_seq[parts[3]] = parts[2]
    unmapped_seq = [id_to_seq[h] for h in leave if h in id_to_seq]
    reference_seq = [id_to_seq[h] for h in ref_headers if h in id_to_seq]

    config = os.path.join(circos_folder, args.in_config)
    groups = [unmapped_seq] + [[s] for s in unmapped_seq]
    files = [out_config] + [os.path.join(circos_folder, s[0] + ".circos.conf")
                            for s in groups[1:]]
    for seqs, fname in zip(groups, files):
        shutil.copy(config, fname)
        with open(fname, "a") as f:
            f.write("chromosomes = " + ";".join(seqs + reference_seq) + "\n")
            f.write("chromosomes_display_default = no\n")
    return 0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "hide":
        sys.exit(hide_mapped_contigs(sys.argv[2:]))
    sys.exit(sort_sequences(sys.argv[1:]))


if __name__ == "__main__":
    main()
