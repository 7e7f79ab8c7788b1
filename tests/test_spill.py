"""External-memory (spill) mode: byte parity + activation.

SIBELIA_TPU_SPILL_DIR routes the native ranking arenas onto unlinked
temp files (MAP_SHARED) with windowed MADV_DONTNEED drops, bounding
process RSS (native/ranking.cpp spill block).  The env is latched at
first use inside the shared library, so each configuration runs in a
subprocess (same pattern as the wave-scheduler window test).
"""
import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

from sibelia_tpu.native import load_ranking

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import hashlib, sys
import numpy as np
sys.path.insert(0, %r)
from tests.test_native_engine import _rand_genomes
from sibelia_tpu.io.fasta import FASTARecord
from sibelia_tpu.blocks.finder import BlockFinder

genomes = _rand_genomes(7, 3, 9000)
recs = [FASTARecord(g.decode(), "chr%%d" %% i, i + 1)
        for i, g in enumerate(genomes)]
bf = BlockFinder(list(recs))
for (k, d) in ((10, 60), (20, 200), (40, 300)):
    bf.perform_graph_simplifications(k, d, 4)
blocks = bf.generate_synteny_blocks(30, 30, 100)
h = hashlib.sha256()
for c in bf.raw_seq:
    h.update(np.ascontiguousarray(c).tobytes())
for op in bf.original_pos:
    h.update(np.ascontiguousarray(op).tobytes())
for b in sorted(blocks, key=lambda b: (b.signed_id, b.start, b.end)):
    h.update(repr((b.signed_id, b.start, b.end)).encode())
print("HASH", h.hexdigest())
"""


def _run(extra_env, tmp):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    r = subprocess.run([sys.executable, "-c", _SCRIPT % REPO_ROOT],
                       env=env, capture_output=True, text=True,
                       timeout=600, cwd=str(tmp))
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


def test_spill_mode_byte_parity(tmp_path):
    """Pipeline output (sequence, positions, blocks) must be identical
    with spill mode forced onto every arena (SPILL_MIN=0) vs in-RAM,
    including with the resolve prep forced into many tiny key ranges
    (BUDGET_MB=0 drives the range partitioner to its floor)."""
    if load_ranking() is None:
        pytest.skip("native ranking unavailable")
    base = _run({}, tmp_path)
    spill = _run({"SIBELIA_TPU_SPILL_DIR": str(tmp_path),
                  "SIBELIA_TPU_SPILL_MIN": "0"}, tmp_path)
    assert base == spill
    multirange = _run({"SIBELIA_TPU_SPILL_DIR": str(tmp_path),
                       "SIBELIA_TPU_SPILL_MIN": "0",
                       "SIBELIA_TPU_SPILL_BUDGET_MB": "0"}, tmp_path)
    assert base == multirange


_REPEAT_SCRIPT = """
import hashlib, sys
import numpy as np
sys.path.insert(0, %r)
from sibelia_tpu.index.ranking import encode
from sibelia_tpu.native import kmer_ranks_native

# Low-complexity input: a ~1.2 Mbp period-4 repeat makes single rank
# groups of ~300k identical 40-mers — larger than the prep buffers'
# 2 MB-rounded capacity at the BUDGET_MB=0 range floor (4096 rows ->
# 262144 u64 slots) — so a group straddling a resolve range boundary
# forces the boundary extension far past range_rows (regression:
# prep buffers sized to range_rows overflowed).
rng = np.random.default_rng(7)
tail = "".join("ACGT"[c] for c in rng.integers(0, 4, 5000))
s = "#" + "ACGT" * 300000 + tail + "#"
codes = encode(s)
rank, order = kmer_ranks_native(codes, 40)
h = hashlib.sha256()
h.update(np.ascontiguousarray(rank).tobytes())
h.update(np.ascontiguousarray(order).tobytes())
print("HASH", h.hexdigest())
"""


def _run_repeat(extra_env, tmp):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    r = subprocess.run([sys.executable, "-c", _REPEAT_SCRIPT % REPO_ROOT],
                       env=env, capture_output=True, text=True,
                       timeout=600, cwd=str(tmp))
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


def test_spill_resolve_oversized_rank_group(tmp_path):
    """A rank group larger than the resolve range and straddling its
    boundary must not overflow the prep buffers (ADVICE r4 high:
    native/ranking.cpp prep sizing vs boundary extension)."""
    if load_ranking() is None:
        pytest.skip("native ranking unavailable")
    base = _run_repeat({}, tmp_path)
    spill = _run_repeat({"SIBELIA_TPU_SPILL_DIR": str(tmp_path),
                         "SIBELIA_TPU_SPILL_MIN": "0",
                         "SIBELIA_TPU_SPILL_BUDGET_MB": "0"}, tmp_path)
    assert base == spill


def test_spill_auto_activation_on_small_host(tmp_path):
    """A host whose available memory (simulated via
    SIBELIA_TPU_MEMAVAIL_MB) cannot hold the stage-plan-derived in-RAM
    estimate must pick external-memory mode through the normal CLI path
    and complete with output identical to the in-RAM run."""
    if load_ranking() is None:
        pytest.skip("native ranking unavailable")
    import numpy as np
    rng = np.random.default_rng(11)
    fasta = tmp_path / "g.fasta"
    with open(fasta, "w") as f:
        base = rng.choice(list("ACGT"), size=120000)
        for i in range(3):
            mut = base.copy()
            pos = rng.integers(0, len(mut), size=400)
            mut[pos] = rng.choice(list("ACGT"), size=400)
            f.write(">chr%d\n%s\n" % (i, "".join(mut)))

    def run_cli(outdir, extra_env):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.update(extra_env)
        r = subprocess.run(
            [sys.executable, "-m", "sibelia_tpu.cli.sibelia", "-s", "fine",
             "-m", "500", "-t", str(tmp_path), "-o", str(outdir),
             str(fasta)],
            env=env, capture_output=True, text=True, timeout=600,
            cwd=REPO_ROOT)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stderr

    out_ram = tmp_path / "out_ram"
    out_sp = tmp_path / "out_sp"
    run_cli(out_ram, {})
    # ~0.36 MB input * 120 B/B ~ 43 MB estimate; 16 MB "available"
    # forces the spill decision; SPILL_MIN=0 makes every arena eligible
    # so the mode is actually exercised at this size
    err = run_cli(out_sp, {"SIBELIA_TPU_MEMAVAIL_MB": "16",
                           "SIBELIA_TPU_SPILL_MIN": "0"})
    assert "external-memory mode" in err
    for fn in ("blocks_coords.txt", "coverage_report.txt",
               "genomes_permutations.txt"):
        with open(out_ram / fn, "rb") as a, open(out_sp / fn, "rb") as b:
            assert a.read() == b.read(), fn


def test_spill_files_are_unlinked(tmp_path):
    """Spill temp files must be unlinked at creation (no disk litter)."""
    if load_ranking() is None:
        pytest.skip("native ranking unavailable")
    _run({"SIBELIA_TPU_SPILL_DIR": str(tmp_path),
          "SIBELIA_TPU_SPILL_MIN": "0"}, tmp_path)
    left = [p for p in os.listdir(tmp_path) if p.startswith("sibelia_")]
    assert left == [], left
