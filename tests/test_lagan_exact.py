"""Exact-LAGAN engine tests.

Self-contained checks always run; byte-level differential tests against the
rebuilt reference LAGAN binaries run only when they exist at .lagan_build/
(build: copy /root/reference/src/lagan, add -fcommon to src/Makefile CFLAGS,
make) and SIBELIA_TPU_GOLDEN=1 is set.
"""
import os
import random
import subprocess

import pytest

from sibelia_tpu.align import lagan_exact
from sibelia_tpu.align.lagan_exact import align_pair_exact, lagan_pl_mfa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAGAN_DIR = os.path.join(REPO, ".lagan_build")

needs_native = pytest.mark.skipif(not lagan_exact.available(),
                                  reason="native engine unavailable")
needs_oracle = pytest.mark.skipif(
    os.environ.get("SIBELIA_TPU_GOLDEN") != "1"
    or not os.path.exists(os.path.join(LAGAN_DIR, "lagan.pl")),
    reason="oracle binaries not built or SIBELIA_TPU_GOLDEN unset")


def _mutate(s, sub, ind, rng):
    out = []
    for c in s:
        r = rng.random()
        if r < sub:
            out.append(rng.choice("ACGT"))
        elif r < sub + ind / 2:
            pass
        elif r < sub + ind:
            out.append(c + rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


@needs_native
def test_identical_sequences_align_identity():
    rng = random.Random(5)
    s = "".join(rng.choice("ACGT") for _ in range(3000)).encode()
    r0, r1 = align_pair_exact(s, s)
    assert r0 == r1 == s.decode()


@needs_native
def test_substitutions_no_gaps():
    rng = random.Random(11)
    s = "".join(rng.choice("ACGT") for _ in range(2000))
    t = _mutate(s, 0.02, 0.0, rng)
    r0, r1 = align_pair_exact(s.encode(), t.encode())
    assert "-" not in r0 and "-" not in r1
    assert r0 == s and r1 == t


@needs_native
def test_indels_recovered():
    rng = random.Random(13)
    s = "".join(rng.choice("ACGT") for _ in range(4000))
    t = s[:1000] + s[1010:]  # 10bp deletion
    r0, r1 = align_pair_exact(s.encode(), t.encode())
    assert r0.replace("-", "") == s
    assert r1.replace("-", "") == t
    assert r1.count("-") - r0.count("-") == 10


def _oracle_mfa(s1, n1, s2, n2, tmpdir):
    f1 = os.path.join(tmpdir, "a.fa")
    f2 = os.path.join(tmpdir, "b.fa")
    out = os.path.join(tmpdir, "o.mfa")
    with open(f1, "w") as h:
        h.write(f">{n1}\n{s1.decode()}\n")
    with open(f2, "w") as h:
        h.write(f">{n2}\n{s2.decode()}\n")
    env = dict(os.environ, LAGAN_DIR=LAGAN_DIR)
    subprocess.run(["perl", os.path.join(LAGAN_DIR, "lagan.pl"),
                    f1, f2, "-mfa", "-out", out],
                   env=env, cwd=tmpdir, check=True, capture_output=True)
    with open(out) as h:
        return h.read()


@needs_native
@needs_oracle
def test_differential_vs_lagan_pl(tmp_path):
    for seed in range(8):
        rng = random.Random(seed * 31 + 7)
        size = rng.choice([60, 400, 3000, 12000])
        s = "".join(rng.choice("ACGT") for _ in range(size))
        t = _mutate(s, rng.choice([0.0, 0.02, 0.1]),
                    rng.choice([0.0, 0.01]), rng)
        if rng.random() < 0.4:
            t = "".join("N" if rng.random() < 0.02 else c for c in t)
        n1 = "gi|999|ref|NC_9.9|1_%d" % len(s)
        n2 = "contig_%d" % seed
        oracle = _oracle_mfa(s.encode(), n1, t.encode(), n2, str(tmp_path))
        mine = lagan_pl_mfa(s.encode(), n1, t.encode(), n2)
        assert mine == oracle, f"seed {seed}"


@needs_native
@needs_oracle
def test_mlagan_differential(tmp_path):
    from sibelia_tpu.align.mlagan_exact import mlagan_fasta
    for seed in (1, 2):
        rng = random.Random(seed * 7 + 1)
        base = "".join(rng.choice("ACGT") for _ in range(1500))
        seqs, names, files = [], [], []
        for c in range(3):
            s = _mutate(base, 0.05, 0.005, rng)
            nm = f"rep{c}_block_{len(s)}"
            seqs.append(s.encode())
            names.append(nm)
            f = tmp_path / f"m{c}.fa"
            f.write_text(f">{nm}\n{s}\n")
            files.append(str(f))
        env = dict(os.environ, LAGAN_DIR=LAGAN_DIR)
        r = subprocess.run([os.path.join(LAGAN_DIR, "mlagan")] + files,
                           env=env, cwd=str(tmp_path), capture_output=True)
        assert r.returncode == 0
        assert mlagan_fasta(seqs, names) == r.stdout.decode(), seed


# ---------------------------------------------------------------------------
# Translated (6-frame peptide) chaos — fchaos -t twin
# ---------------------------------------------------------------------------

def _translated_pair(seed, n_codons=300, mut=0.10):
    # codon-structured homologs with moderate divergence: the regime
    # where the reference `chaos -t` terminates (it degenerates on
    # near-identical inputs — the char-width flag truncation inflates
    # its word stream quadratically; see lagan_chaos.cpp)
    rng = random.Random(seed)
    codons = [a + b + c for a in "ACGT" for b in "ACGT" for c in "ACGT"]
    a = [rng.choice(codons) for _ in range(n_codons)]
    b = [(rng.choice(codons) if rng.random() < mut else cd) for cd in a]
    return "".join(a).encode(), "".join(b).encode()


@needs_native
@pytest.mark.parametrize("seed,both,gfc", [(1, False, False),
                                           (2, True, False),
                                           (3, False, True)])
def test_chaos_translated_vs_reference(seed, both, gfc, tmp_path):
    from sibelia_tpu.native import lagan_chaos_translated
    sa, sb = _translated_pair(seed)
    got = lagan_chaos_translated(sa, "seqA", sb, "seqB", both=both, gfc=gfc)
    assert got is not None

    chaos_bin = os.path.join(LAGAN_DIR, "chaos")
    if (os.environ.get("SIBELIA_TPU_GOLDEN") != "1"
            or not os.path.exists(chaos_bin)):
        pytest.skip("oracle binary not built or SIBELIA_TPU_GOLDEN unset")

    def wrap(seq):
        return "\n".join(seq[i:i + 60] for i in range(0, len(seq), 60))

    fa = tmp_path / "a.fa"
    fb = tmp_path / "b.fa"
    fa.write_text(">seqA\n" + wrap(sa.decode()) + "\n")
    fb.write_text(">seqB\n" + wrap(sb.decode()) + "\n")
    args = [chaos_bin, str(fa), str(fb), "-t"]
    if both:
        args.append("-b")
    if gfc:
        args.append("-gfc")
    env = dict(os.environ)
    env["LAGAN_DIR"] = os.path.abspath(LAGAN_DIR)
    r = subprocess.run(args, capture_output=True, text=True, timeout=300,
                       env=env)
    assert r.returncode == 0, r.stderr[-1500:]
    assert r.stdout == got
