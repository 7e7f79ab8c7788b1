"""Byte parity of the device order-band DP against the native host
engine (which is byte-identical to the reference `order` binary)."""
import numpy as np
import pytest

from sibelia_tpu.align import lagan_exact
from sibelia_tpu.kernels.order_device import (order_mfa_device,
                                              order_mfa_device_batch)
from sibelia_tpu.native import lagan_order, load_lagan

pytestmark = pytest.mark.skipif(load_lagan() is None,
                                reason="native lagan engine unavailable")


def _pair(rng, n, muts, indel=0):
    a = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    b = a.copy()
    pos = rng.integers(0, len(b), size=muts)
    b[pos] = rng.choice(list(b"ACGT"), size=muts)
    if indel:
        b = np.concatenate([b[:n // 3], b[n // 3 + indel:]])
    return bytes(a), bytes(b)


@pytest.mark.parametrize("seed,n,muts,indel", [
    (0, 1500, 15, 0),
    (1, 4000, 60, 7),
    (2, 9000, 40, 120),
])
def test_device_order_matches_host(seed, n, muts, indel):
    rng = np.random.default_rng(seed)
    sa, sb = _pair(rng, n, muts, indel)
    anch = lagan_exact.rechaos(sa, "x", sb, "y", gfc=True)
    host = lagan_order(sa, "x", sb, "y", anch)
    dev = order_mfa_device(sa, "x", sb, "y", anch)
    assert dev is not None
    assert dev == host


def test_device_order_with_n_chars():
    rng = np.random.default_rng(5)
    sa, sb = _pair(rng, 3000, 25, 3)
    sa = sa[:400] + b"N" * 30 + sa[430:]
    anch = lagan_exact.rechaos(sa, "x", sb, "y", gfc=True)
    host = lagan_order(sa, "x", sb, "y", anch)
    dev = order_mfa_device(sa, "x", sb, "y", anch)
    assert dev == host


def test_device_order_batch_matches_host():
    rng = np.random.default_rng(9)
    jobs = []
    hosts = []
    for i in range(5):
        sa, sb = _pair(rng, 2000 + 150 * i, 20, i % 3)
        anch = lagan_exact.rechaos(sa, "a", sb, "b", gfc=True)
        jobs.append((sa, "a", sb, "b", anch))
        hosts.append(lagan_order(sa, "a", sb, "b", anch))
    res = order_mfa_device_batch(jobs)
    for got, want in zip(res, hosts):
        assert got == want


def test_device_order_routing_in_lagan_pl(monkeypatch):
    """lagan_pl_mfa must produce identical text with the device DP
    forced on vs off."""
    rng = np.random.default_rng(13)
    sa, sb = _pair(rng, 2500, 30, 11)
    monkeypatch.setenv("SIBELIA_TPU_DEVICE_ORDER", "0")
    host = lagan_exact.lagan_pl_mfa(sa, "p", sb, "q")
    monkeypatch.setenv("SIBELIA_TPU_DEVICE_ORDER", "1")
    dev = lagan_exact.lagan_pl_mfa(sa, "p", sb, "q")
    monkeypatch.delenv("SIBELIA_TPU_DEVICE_ORDER")
    assert dev == host


def test_device_order_batch_sharded_matches_unsharded():
    """Mesh-sharded batch order (pairs axis data-parallel over the
    virtual device mesh) must be byte-identical to the unsharded batch
    and to the host engine, including a batch size that does not divide
    the mesh (padding replicas dropped)."""
    import jax
    from sibelia_tpu.parallel.sharded import make_mesh
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    rng = np.random.default_rng(77)
    jobs = []
    host = []
    for i in range(5):  # 5 % 2 != 0: exercises the padding path
        sa, sb = _pair(rng, 1200 + 37 * i, 12, 3 if i % 2 else 0)
        anch = lagan_exact.rechaos(sa, "a", sb, "b", gfc=True)
        jobs.append((sa, "a", sb, "b", anch))
        host.append(lagan_order(sa, "a", sb, "b", anch))
    plain = order_mfa_device_batch(jobs)
    mesh = make_mesh(min(n_dev, 2), axis="pairs")
    sharded = order_mfa_device_batch(jobs, mesh=mesh)
    for p, s, h in zip(plain, sharded, host):
        assert s == p
        assert s is None or s == h
