"""Backend classification for the compute dispatch decisions.

The pipeline has two implementations of every hot step: a device array
program (JAX/XLA/Pallas) and a native host kernel. Which one wins depends
on where the device physically is:

  * ``tpu`` / ``gpu``  — locally attached accelerator: device paths win,
    host<->device transfers ride PCIe/NVLink.
  * ``axon``           — a real TPU chip reached through a network tunnel
    (development harness). Per-dispatch latency and transfer bandwidth are
    orders of magnitude worse than a local attach; good for *kernel
    benchmarking* with device-resident data, catastrophic for e2e
    pipelines that move megabytes per stage.
  * ``cpu``            — no accelerator: native host kernels win.

``device_dispatch()`` centralizes the decision. Overrides:

  * ``SIBELIA_TPU_DEVICE=1`` forces device paths (any backend),
    ``SIBELIA_TPU_DEVICE=0`` forces host paths.
  * ``SIBELIA_TPU_FORCE_DEVICE_ENUM=1`` is honored as a legacy alias
    for forcing the device path (used by parity tests).
"""
from __future__ import annotations

import os

_LOCAL_BACKENDS = ("tpu", "gpu", "cuda", "rocm")


def backend_name() -> str:
    try:
        import jax

        return jax.default_backend()
    except Exception:
        return "cpu"


def is_tunneled() -> bool:
    """True when the accelerator is reached through the axon network
    tunnel (the PJRT plugin reports platform "tpu", so default_backend()
    alone cannot tell; the platform list and the PJRT platform_version
    both carry the plugin name)."""
    try:
        import jax

        platforms = jax.config.jax_platforms or ""
        if "axon" in platforms:
            return True
        from jax._src import xla_bridge

        ver = getattr(xla_bridge.get_backend(), "platform_version", "") or ""
        return ver.startswith("axon") or "\naxon" in ver or " axon " in ver
    except Exception:
        return False


# --------------------------------------------------------------------------
# Host<->device round-trip accounting (SIBELIA_TPU_COUNT_SYNCS=1): every
# device-path call site notes its blocking transfers, so an e2e run can
# be decomposed into device-compute + syncs * per-sync latency — the
# basis of the real-hardware statement in bench.py (a tunneled dev chip
# pays ~24 ms/sync; a locally attached TPU host ~0.2 ms).
# --------------------------------------------------------------------------

SYNC_COUNTS: dict = {}


def note_sync(tag: str, n: int = 1) -> None:
    if os.environ.get("SIBELIA_TPU_COUNT_SYNCS") == "1":
        SYNC_COUNTS[tag] = SYNC_COUNTS.get(tag, 0) + n


def device_dispatch() -> bool:
    """True when data-heavy pipeline steps should run on the JAX device."""
    env = os.environ.get("SIBELIA_TPU_DEVICE")
    if env is not None:
        return env != "0"
    if os.environ.get("SIBELIA_TPU_FORCE_DEVICE_ENUM") == "1":
        return True
    # Cheap pre-checks that avoid importing (and initializing) jax on
    # the pure-host path: an explicit CPU pin or the axon tunnel env
    # decide the answer without paying backend init inside the pipeline.
    plats = os.environ.get("JAX_PLATFORMS", "")
    plist = [p.strip() for p in plats.split(",") if p.strip()]
    if plist and all(p == "cpu" for p in plist):
        return False
    if "axon" in plats or os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False  # tunneled dev chip: host paths win (see module doc)
    return backend_name() in _LOCAL_BACKENDS and not is_tunneled()
