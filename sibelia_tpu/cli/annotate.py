"""snpEff variant annotation driver.

Port of reference src/annotation/snpEffAnnotate.py: derives the snpEff
database name from the VCF's ##reference header (via a bundled
genomes.txt index if present), downloads the database, and runs
`snpEff.jar eff` producing variant_ann.vcf. Requires Java and a snpEff
distribution on disk, exactly like the reference.
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

FILENAME = "variant_ann.vcf"


def derive_db_name(vcf_path: str, genomes_txt: str) -> str | None:
    chrom_name = ""
    with open(vcf_path) as f:
        for line in f:
            if line.startswith("##reference"):
                assembly_name = line.strip().split("=")[1]
                m = re.search(r"\|(\w+)(\.\d+)?\|$", assembly_name)
                chrom_name = assembly_name if not m else m.group(1)
                break
    if not os.path.exists(genomes_txt):
        return None
    with open(genomes_txt) as f:
        for line in f:
            fields = line.strip().split("/")
            if fields[-1] == chrom_name + ".val":
                return fields[1]
    return None


def run(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(description="Script for variants annotation")
    parser.add_argument("-i", dest="source", default="./variant.vcf")
    parser.add_argument("-o", dest="dest", default="annotation")
    parser.add_argument("--db", dest="db")
    parser.add_argument("-c", dest="config")
    parser.add_argument("--snpeff-dir", dest="snpeff_dir", default=".",
                        help="directory containing snpEff.jar / snpEff.config / genomes.txt")
    args = parser.parse_args(argv)

    source = os.path.abspath(args.source)
    if not os.path.exists(source):
        print("Please specify source variants file", file=sys.stderr)
        return -1
    config = os.path.abspath(args.config or os.path.join(args.snpeff_dir, "snpEff.config"))
    jar = os.path.join(os.path.abspath(args.snpeff_dir), "snpEff.jar")
    os.makedirs(args.dest, exist_ok=True)

    db = args.db or derive_db_name(source, os.path.join(args.snpeff_dir, "genomes.txt"))
    if not db:
        print("Couldn't get database name from vcf, please provide it manually",
              file=sys.stderr)
        return -1

    cwd = os.getcwd()
    os.chdir(args.dest)
    try:
        if not os.path.exists(f"snpEff_v3_1_{db}.zip"):
            if subprocess.call(["java", "-jar", jar, "download", "-c", config, db]) != 0:
                print("Database was not loaded", file=sys.stderr)
                return -1
        with open(FILENAME, "w") as dest:
            return subprocess.call(["java", "-jar", jar, "eff", "-c", config,
                                    db, source], stdout=dest)
    finally:
        os.chdir(cwd)


def main() -> None:
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
