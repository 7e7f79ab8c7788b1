"""Differential test: native C++ engine vs Python engine (exact)."""
import os

import numpy as np
import pytest

from sibelia_tpu.graph.indexed import randomize_and_enumerate, store_from_enum
from sibelia_tpu.graph.sequence import MutableSequence
from sibelia_tpu.graph.simplify import simplify_graph
from sibelia_tpu.native import load, simplify_native

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rand_genomes(seed, n_chr, size):
    rng = np.random.default_rng(seed)
    base = bytes(rng.choice([65, 67, 71, 84], size=size).astype(np.uint8))
    out = [base]
    for _ in range(n_chr - 1):
        s = bytearray(base)
        for _ in range(size // 40):
            s[int(rng.integers(0, len(s)))] = int(rng.choice([65, 67, 71, 84]))
        for _ in range(size // 150):
            i = int(rng.integers(0, len(s)))
            if rng.integers(0, 2):
                s.insert(i, int(rng.choice([65, 67, 71, 84])))
            else:
                del s[i]
        out.append(bytes(s))
    return out


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("k,d", [(8, 30), (11, 60)])
def test_native_matches_python(seed, k, d):
    if load() is None:
        pytest.skip("native engine unavailable")
    genomes = _rand_genomes(seed, 3, 1500)

    seq_py = MutableSequence(genomes)
    enum_py = randomize_and_enumerate(seq_py, k)
    store = store_from_enum(seq_py, enum_py)
    n_py = simplify_graph(seq_py, store, k, d, 4)

    seq_nat = MutableSequence(genomes)
    enum_nat = randomize_and_enumerate(seq_nat, k)
    n_nat = simplify_native(seq_nat, enum_nat, k, d, 4)

    assert n_nat == n_py
    for c in range(3):
        assert seq_nat.chars[c].tobytes() == seq_py.chars[c].tobytes(), c
        np.testing.assert_array_equal(seq_nat.origpos[c], seq_py.origpos[c])


@pytest.mark.parametrize("seed", range(2))
def test_wave_scheduler_window_invariant(seed):
    """The wave scheduler must be byte-invariant to its window size
    (including fully serial): detection caching + epoch invalidation may
    only change WHERE detection work happens, never the output.  Each
    window setting runs in a subprocess because the engine caches
    SIBELIA_TPU_WAVE on first use."""
    if load() is None:
        pytest.skip("native engine unavailable")
    import os
    import subprocess
    import sys
    script = """
import hashlib, sys
import numpy as np
sys.path.insert(0, %r)
from tests.test_native_engine import _rand_genomes
from sibelia_tpu.graph.indexed import randomize_and_enumerate
from sibelia_tpu.graph.sequence import MutableSequence
from sibelia_tpu.native import simplify_native
genomes = _rand_genomes(%d, 4, 4000)
seq = MutableSequence(genomes)
enum = randomize_and_enumerate(seq, 9)
n = simplify_native(seq, enum, 9, 45, 4)
h = hashlib.sha256()
for c in seq.chars:
    h.update(c.tobytes())
for op in seq.origpos:
    h.update(np.ascontiguousarray(op).tobytes())
print(n, h.hexdigest())
""" % (REPO_ROOT, 100 + seed)
    outs = []
    for win in ("0", "7", "64", "100000"):
        env = dict(os.environ)
        env["SIBELIA_TPU_WAVE"] = win
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=240)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout.strip().splitlines()[-1])
    assert all(o == outs[0] for o in outs), outs
