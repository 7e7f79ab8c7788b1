"""Supermap (piecewise-monotonic map generator) tests.

Self-contained checks always run.  The byte-level differential against
the reference supermap.pl runs with SIBELIA_TPU_GOLDEN=1: the Perl
script is driven with our glocal plugged in as the SLAGAN binary (a
wrapper script), so the comparison isolates supermap's own sort/chain/
expand logic, with the chaining DP held identical on both sides.
"""
import os
import random
import stat
import subprocess
import sys

import pytest

from sibelia_tpu.align.supermap import get_min_seq_score, supermap

SUPERMAP_PL = "/root/reference/src/lagan/supermap.pl"

needs_oracle = pytest.mark.skipif(
    os.environ.get("SIBELIA_TPU_GOLDEN") != "1"
    or not os.path.exists(SUPERMAP_PL),
    reason="SIBELIA_TPU_GOLDEN unset or reference supermap.pl missing")


def test_min_seq_score_from_score_file():
    assert get_min_seq_score("{+U+;+U-;-U+;-U-}{30000 0 0 0}\n") == 30000


def test_single_dm_region():
    hits = ("sA 1000 5000; cX 1000 5000; score = 50000.0 (+)\n")
    out = supermap(hits, {"sA": 10000}, {"cX": 10000})
    lines = out.strip().split("\n")
    assert len(lines) == 1
    assert "(DM, 1 aligns)" in lines[0]
    assert lines[0].startswith("sA ")
    assert " cX " in lines[0] and " + " in lines[0]


def test_inversion_produces_minus_region():
    hits = "\n".join([
        "sA 1000 3000; cX 1000 3000; score = 50000.0 (+)",
        "sA 4000 6000; cX 6000 4000; score = 50000.0 (-)",
        "sA 7000 9000; cX 7000 9000; score = 50000.0 (+)",
    ]) + "\n"
    out = supermap(hits, {"sA": 20000}, {"cX": 20000})
    orients = [l.split(" (")[0].split()[-1] for l in out.strip().split("\n")]
    assert "-" in orients and "+" in orients


def test_chained_collinear_hits_merge():
    # monotone hits with gaps chain into one region
    hits = "\n".join(
        f"sA {i * 2000} {i * 2000 + 800}; cX {i * 2000} {i * 2000 + 800}; "
        f"score = 50000.0 (+)" for i in range(1, 6)) + "\n"
    out = supermap(hits, {"sA": 20000}, {"cX": 20000})
    lines = out.strip().split("\n")
    assert any("5 aligns" in l for l in lines)


def test_low_total_score_sequences_dropped():
    # total below the U-penalty threshold (30000 in the default score
    # file) drops the sequence entirely
    hits = "sA 1000 2000; cX 1000 2000; score = 100.0 (+)\n"
    assert supermap(hits, {"sA": 10000}, {"cX": 10000}) == ""


def _gen(seed):
    rng = random.Random(seed)
    n1 = 1 + rng.randrange(2)
    n2 = 1 + rng.randrange(2)
    sizes1 = {f"sq{i}": rng.randrange(200000, 500000) for i in range(n1)}
    sizes2 = {f"ct{i}": rng.randrange(200000, 500000) for i in range(n2)}
    lines = []
    for _ in range(rng.randrange(2, 5)):
        q = rng.choice(list(sizes1))
        t = rng.choice(list(sizes2))
        p1 = rng.randrange(1, 50000)
        p2 = rng.randrange(1, 50000)
        strand = rng.choice("+-")
        for _ in range(rng.randrange(5, 25)):
            ln = rng.randrange(100, 2000)
            p1 += rng.randrange(50, 4000)
            p2 += rng.randrange(50, 4000)
            if p1 + ln >= sizes1[q] or p2 + ln >= sizes2[t]:
                break
            sc = round(rng.uniform(2000, 50000), 1)
            if strand == "+":
                lines.append(f"{q} {p1} {p1 + ln}; {t} {p2} {p2 + ln}; "
                             f"score = {sc} (+)")
            else:
                lines.append(f"{q} {p1} {p1 + ln}; {t} {p2 + ln} {p2}; "
                             f"score = {sc} (-)")
            if rng.random() < 0.15:
                strand = "+" if strand == "-" else "-"
    for _ in range(rng.randrange(5, 20)):
        q = rng.choice(list(sizes1))
        t = rng.choice(list(sizes2))
        ln = rng.randrange(50, 1500)
        s1 = rng.randrange(1, sizes1[q] - ln - 1)
        s2 = rng.randrange(1, sizes2[t] - ln - 1)
        sc = round(rng.uniform(100, 40000), 1)
        lines.append(f"{q} {s1} {s1 + ln}; {t} {s2} {s2 + ln}; "
                     f"score = {sc} ({rng.choice('+-')})")
    rng.shuffle(lines)
    return "\n".join(lines) + "\n", sizes1, sizes2


def _make_lagan_dir(tmp_path):
    lagan_dir = tmp_path / "lagan"
    lagan_dir.mkdir()
    wrapper = lagan_dir / "glocal"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wrapper.write_text(
        "#!/bin/sh\n"
        f'exec {sys.executable} -c "\n'
        "import sys\n"
        f"sys.path.insert(0, '{repo}')\n"
        "from sibelia_tpu.align.glocal import glocal_chain\n"
        "sys.stdout.write(glocal_chain(open(sys.argv[1]).read(),"
        " open(sys.argv[2]).read()))\n"
        '" "$1" "$2"\n')
    wrapper.chmod(wrapper.stat().st_mode | stat.S_IEXEC)
    (lagan_dir / "test.score").write_text(
        open("/root/reference/src/lagan/src/glocal/default.score").read())
    (lagan_dir / "Utils.pm").write_text(
        open("/root/reference/src/lagan/Utils.pm").read())
    return lagan_dir


def _run_reference(lagan_dir, d, extra=()):
    env = dict(os.environ, LAGAN_DIR=str(lagan_dir), LC_ALL="C")
    return subprocess.run(
        ["perl", SUPERMAP_PL, "-sizes1=s1", "-sizes2=s2", "hits.txt",
         "-no_clust_run", "-f", "-outfile=out.smap", "-q", *extra],
        cwd=str(d), env=env, capture_output=True, timeout=300)


@needs_oracle
def test_supermap_differential(tmp_path):
    lagan_dir = _make_lagan_dir(tmp_path)
    matched = 0
    for seed in range(12):
        hits, sizes1, sizes2 = _gen(7000 + seed)
        d = tmp_path / f"run{seed}"
        d.mkdir()
        (d / "hits.txt").write_text(hits)
        (d / "s1").write_text(
            "".join(f"{k} {v}\n" for k, v in sizes1.items()))
        (d / "s2").write_text(
            "".join(f"{k} {v}\n" for k, v in sizes2.items()))
        r = _run_reference(lagan_dir, d)
        if r.returncode != 0:
            continue
        ref = (d / "out.smap").read_text()
        assert supermap(hits, sizes1, sizes2) == ref, seed
        matched += 1
    assert matched >= 8


@needs_oracle
def test_supermap_bacteria_flip_differential(tmp_path):
    lagan_dir = _make_lagan_dir(tmp_path)
    matched = 0
    for seed in range(6):
        rng = random.Random(500 + seed)
        sz1 = rng.randrange(100000, 200000)
        sz2 = rng.randrange(100000, 200000)
        lines = []
        for _ in range(rng.randrange(10, 40)):
            ln = rng.randrange(100, 2000)
            s1 = rng.randrange(1, sz1 - ln - 1)
            s2 = rng.randrange(1, sz2 - ln - 1)
            sc = round(rng.uniform(2000, 50000), 1)
            lines.append(f"chrA {s1} {s1 + ln}; chrB {s2} {s2 + ln}; "
                         f"score = {sc} ({rng.choice('+-')})")
        hits = "\n".join(lines) + "\n"
        d = tmp_path / f"flip{seed}"
        d.mkdir()
        (d / "hits.txt").write_text(hits)
        (d / "s1").write_text(f"chrA {sz1}\n")
        (d / "s2").write_text(f"chrB {sz2}\n")
        r = _run_reference(lagan_dir, d, extra=("-bacteria",))
        if r.returncode != 0:
            continue
        ref = (d / "out.smap").read_text()
        assert supermap(hits, {"chrA": sz1}, {"chrB": sz2},
                        proflip=True) == ref, seed
        matched += 1
    assert matched >= 4


def test_cli_wrappers(tmp_path):
    from sibelia_tpu.cli import glocal_cli, supermap_cli
    hits = tmp_path / "hits.txt"
    hits.write_text("sA 1000 5000; cX 1000 5000; score = 50000.0 (+)\n")
    (tmp_path / "s1").write_text("sA 10000\n")
    (tmp_path / "s2").write_text("cX 10000\n")
    out = tmp_path / "out.smap"
    rc = supermap_cli.run([str(hits), "-sizes1", str(tmp_path / "s1"),
                           "-sizes2", str(tmp_path / "s2"),
                           "-outfile", str(out), "-q"])
    assert rc == 0
    assert "(DM, 1 aligns)" in out.read_text()
    rc = glocal_cli.run([str(hits)])
    assert rc == 0


@needs_oracle
def test_supermap_blat_input_differential(tmp_path):
    lagan_dir = _make_lagan_dir(tmp_path)
    matched = 0
    for seed in range(5):
        rng = random.Random(300 + seed)
        lines = []
        for _ in range(rng.randrange(15, 50)):
            ln = rng.randrange(200, 3000)
            s1 = rng.randrange(1, 300000 - ln - 1)
            s2 = rng.randrange(1, 300000 - ln - 1)
            match = rng.randrange(200, 3000)
            mism = rng.randrange(0, 50)
            qg, qgb = rng.randrange(0, 4), rng.randrange(0, 100)
            tg, tgb = rng.randrange(0, 4), rng.randrange(0, 100)
            lines.append(f"sqA {s1} {s1 + ln} {rng.choice('+-')} ctB "
                         f"{s2} {s2 + ln} {match} {mism} 0 0 "
                         f"{qg} {qgb} {tg} {tgb}")
        hits = "\n".join(lines) + "\n"
        d = tmp_path / f"blat{seed}"
        d.mkdir()
        (d / "hits.txt").write_text(hits)
        (d / "s1").write_text("sqA 300000\n")
        (d / "s2").write_text("ctB 300000\n")
        r = _run_reference(lagan_dir, d)
        if r.returncode != 0:
            continue
        ref = (d / "out.smap").read_text()
        assert supermap(hits, {"sqA": 300000}, {"ctB": 300000}) == ref, seed
        matched += 1
    assert matched >= 3
