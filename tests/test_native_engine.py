"""Differential test: native C++ engine vs Python engine (exact)."""
import numpy as np
import pytest

from sibelia_tpu.graph.indexed import randomize_and_enumerate, store_from_enum
from sibelia_tpu.graph.sequence import MutableSequence
from sibelia_tpu.graph.simplify import simplify_graph
from sibelia_tpu.native import load, simplify_native


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
