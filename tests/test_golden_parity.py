"""Full-example parity tests vs the rebuilt reference binary.

These take minutes and need the differential oracle built at
.ref_build/Sibelia, so they run only when SIBELIA_TPU_GOLDEN=1 is set
(e.g. in the long verification pass); the fast randomized differential
coverage lives in scripts/diffref.py runs.
"""
import contextlib
import io
import os
import subprocess

import pytest

REF_BIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".ref_build", "Sibelia")
HP = "/root/reference/examples/Sibelia/Helicobacter_pylori/Helicobacter_pylori.fasta"

pytestmark = pytest.mark.skipif(
    os.environ.get("SIBELIA_TPU_GOLDEN") != "1" or not os.path.exists(REF_BIN)
    or not os.path.exists(HP),
    reason="set SIBELIA_TPU_GOLDEN=1 with the oracle built to run")


def test_h_pylori_loose_matches_reference(tmp_path):
    from sibelia_tpu.cli.sibelia import run
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "mine"
    ref_out.mkdir()
    my_out.mkdir()
    subprocess.run([REF_BIN, "-s", "loose", "-m", "5000", "-r",
                    "-o", str(ref_out), HP], check=True, capture_output=True)
    with contextlib.redirect_stdout(io.StringIO()):
        assert run(["-s", "loose", "-m", "5000", "-r",
                    "-o", str(my_out), HP]) == 0
    for fn in ("blocks_coords.txt", "coverage_report.txt",
               "genomes_permutations.txt"):
        assert (ref_out / fn).read_text() == (my_out / fn).read_text(), fn


SA_DIR = "/root/reference/examples/C-Sibelia/Staphylococcus_aureus"


def test_s_aureus_two_strain_loose_matches_reference(tmp_path):
    """Two real S. aureus genomes (the bundled C-Sibelia pair; the
    4-strain Sibelia example ships outputs only, no input FASTA) at
    -s loose — a repeat-rich 5.6 MB differential case."""
    from sibelia_tpu.cli.sibelia import run
    fastas = [os.path.join(SA_DIR, f)
              for f in ("NCTC8325.fasta", "RN4220.fasta")]
    ref_out = tmp_path / "ref"
    my_out = tmp_path / "mine"
    ref_out.mkdir()
    my_out.mkdir()
    subprocess.run([REF_BIN, "-s", "loose", "-r", "-o", str(ref_out)]
                   + fastas, check=True, capture_output=True)
    with contextlib.redirect_stdout(io.StringIO()):
        assert run(["-s", "loose", "-r", "-o", str(my_out)] + fastas) == 0
    for fn in ("blocks_coords.txt", "coverage_report.txt",
               "genomes_permutations.txt"):
        assert (ref_out / fn).read_text() == (my_out / fn).read_text(), fn
