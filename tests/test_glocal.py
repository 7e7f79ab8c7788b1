"""Glocal (SLAGAN) chaining tests.

Self-contained checks always run; randomized byte-level differential
sweeps against the rebuilt reference glocal binary run with
SIBELIA_TPU_GOLDEN=1 and the .lagan_build oracle.  The reference binary
segfaults on some dense random inputs (its intersection-point handler
re-processes a point and corrupts its owner list); crashing seeds are
skipped — our port survives them.
"""
import os
import random
import re
import subprocess

import pytest

from sibelia_tpu.align.glocal import glocal_chain, parse_hits

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAGAN_DIR = os.path.join(REPO, ".lagan_build")
GLOCAL_BIN = os.path.join(LAGAN_DIR, "glocal")
SCORE_FILE = "/root/reference/src/lagan/src/glocal/default.score"

needs_oracle = pytest.mark.skipif(
    os.environ.get("SIBELIA_TPU_GOLDEN") != "1"
    or not os.path.exists(GLOCAL_BIN),
    reason="oracle binaries not built or SIBELIA_TPU_GOLDEN unset")


def _hit(s1, e1, s2, e2, score, strand, nm="ctg0"):
    return f"seqA {s1} {e1}; {nm} {s2} {e2}; score = {score} ({strand})"


_OUT_RE = re.compile(r"\((\d+) (\d+)\)=\((-?\d+) (-?\d+)\) (\S+) (.) ")


def _parse_out(text):
    rows = []
    for line in text.strip().split("\n"):
        m = _OUT_RE.match(line)
        if m:
            rows.append((int(m.group(1)), int(m.group(2)),
                         int(m.group(3)), int(m.group(4)),
                         m.group(6)))
    return rows


def test_collinear_hits_chain_fully():
    hits = "\n".join(_hit(i * 1000, i * 1000 + 400,
                          i * 1000, i * 1000 + 400, 500.0, "+")
                     for i in range(1, 6))
    rows = _parse_out(glocal_chain(hits))
    assert len(rows) == 5
    # chain prints last fragment first
    assert [r[0] for r in rows] == [5000, 4000, 3000, 2000, 1000]


def test_inversion_is_chained_not_dropped():
    # scores high enough that paying the inversion open penalty (3000/7000
    # in default.score) beats skipping the inverted segment
    hits = "\n".join([
        _hit(1000, 1400, 1000, 1400, 20000.0, "+"),
        _hit(2000, 2400, 2400, 2000, 20000.0, "-"),  # inverted segment
        _hit(3000, 3400, 3000, 3400, 20000.0, "+"),
    ])
    rows = _parse_out(glocal_chain(hits))
    assert len(rows) == 3
    assert [r[4] for r in rows] == ["+", "-", "+"]


def test_cross_contig_jump_uses_unrelated_penalty():
    # two contigs: chaining across them is only possible through the
    # unrelated (U) score function
    hits = "\n".join([
        _hit(1000, 1400, 1000, 1400, 31000.0, "+", "ctgA"),
        _hit(2000, 2400, 1000, 1400, 31000.0, "+", "ctgB"),
    ])
    out = glocal_chain(hits)
    assert len(_parse_out(out)) == 2
    names = {line.split("s2: ")[1] for line in out.strip().split("\n")}
    assert names == {"ctgA", "ctgB"}


def test_low_scoring_neighbors_are_skipped():
    hits = "\n".join([
        _hit(1000, 1400, 1000, 1400, 5000.0, "+"),
        _hit(1500, 1600, 90000, 90100, 1.0, "+"),  # absurd jump, tiny score
        _hit(2000, 2400, 2000, 2400, 5000.0, "+"),
    ])
    rows = _parse_out(glocal_chain(hits))
    assert [r[0] for r in rows] == [2000, 1000]


def test_negative_score_hits_filtered():
    assert parse_hits(_hit(1, 10, 1, 10, -5.0, "+")) == []


def _gen(seed):
    rng = random.Random(seed)
    lines = []
    p1 = p2 = 1000
    for _ in range(rng.randrange(20, 90)):
        kind = rng.random()
        ln = rng.randrange(50, 400)
        if kind < 0.6:
            p1 += rng.randrange(20, 800)
            p2 += rng.randrange(20, 800)
            s1, s2, strand = p1, p2, "+"
        elif kind < 0.8:
            p1 += rng.randrange(20, 800)
            s1, s2, strand = p1, max(1, p2 + rng.randrange(-2000, 2000)), "-"
        else:
            s1 = rng.randrange(1, 200000)
            s2 = rng.randrange(1, 200000)
            strand = rng.choice("+-")
        sc = round(rng.uniform(10, 8000), 2)
        nm = f"ctg{rng.randrange(2)}"
        lines.append(_hit(s1, s1 + ln, s2, s2 + ln, sc, strand, nm))
    return "\n".join(lines) + "\n"


def test_slagan_pairwise_recovers_inversion():
    from sibelia_tpu.align import lagan_exact
    from sibelia_tpu.align.glocal import slagan_pairwise
    if not lagan_exact.available():
        pytest.skip("native engine unavailable")
    rng = random.Random(9)
    a = "".join(rng.choice("ACGT") for _ in range(3000))
    rc = a[1060:1940][::-1].translate(str.maketrans("ACGT", "TGCA"))
    spacer = lambda: "".join(rng.choice("ACGT") for _ in range(60))
    b = a[:1000] + spacer() + rc + spacer() + a[2000:]
    regs = slagan_pairwise(a.encode(), "sA", b.encode(), "sB")
    assert [r["strand"] for r in regs] == ["+", "-", "+"]
    assert regs[0]["s1"][0] == 1 and regs[-1]["s1"][1] == 3000
    assert all(r["type"] == "DM" for r in regs)
    for r in regs:
        # supermap expands regions into their neighbor gaps, so the
        # aligned rows carry mismatched flanks around the core
        r1, r2 = r["rows"]
        ident = sum(x == y for x, y in zip(r1, r2)) / len(r1)
        assert ident > 0.5


@needs_oracle
def test_glocal_differential(tmp_path):
    matched = 0
    for seed in range(40):
        hits = _gen(seed)
        p = tmp_path / "hits.txt"
        p.write_text(hits)
        r = subprocess.run([GLOCAL_BIN, str(p), SCORE_FILE],
                           capture_output=True)
        if r.returncode != 0:
            continue  # reference crash (see module docstring)
        assert glocal_chain(hits) == r.stdout.decode(), seed
        matched += 1
    assert matched >= 20
