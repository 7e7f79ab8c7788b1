"""Multi-host runtime layer (SURVEY §2e row 1).

The reference has no distributed runtime at all (fork/exec + temp files,
C-Sibelia.py:289,556); the TPU framework introduces one:

  * ``init_distributed()`` — `jax.distributed.initialize` from env or
    args, so N processes (one per host) form a single SPMD program.
    Env: SIBELIA_TPU_COORD (host:port), SIBELIA_TPU_NPROCS,
    SIBELIA_TPU_PROC_ID.  A no-op when unset (single-process).
  * ``host_chip_mesh()`` — the ('host', 'chip') mesh over all global
    devices, host-major, so the 'chip' axis rides ICI within a slice
    and the 'host' axis crosses DCN.  Shardings that keep their heavy
    collectives on the 'chip' axis (e.g. P(('host','chip')) with
    host-major layout) exchange mostly over ICI.
  * ``seq_mesh()`` — the flat 1-axis mesh the sharded enumeration uses;
    identical device order (host-major), so a sequence shard's
    neighbors are intra-host first.

Multi-host behavior is CI-testable without a pod: N processes on one
machine, each with XLA_FLAGS=--xla_force_host_platform_device_count=C,
form an N*C-device CPU mesh (tests/test_multihost.py; SURVEY §4).
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the multi-process JAX runtime.  Returns True when a
    multi-process runtime was started, False for single-process runs."""
    coordinator = coordinator or os.environ.get("SIBELIA_TPU_COORD")
    if num_processes is None:
        num_processes = int(os.environ.get("SIBELIA_TPU_NPROCS", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("SIBELIA_TPU_PROC_ID", "-1") or -1)
    if not coordinator or num_processes <= 1 or process_id < 0:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_chip_mesh(n_hosts: int | None = None,
                   chips_per_host: int | None = None) -> Mesh:
    """('host', 'chip') mesh over all global devices, host-major.

    jax.devices() orders devices by owning process, so row h of the mesh
    holds host h's chips: collectives on the 'chip' axis stay on ICI,
    only the 'host' axis crosses DCN."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    grid = np.asarray(devs[:n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host)
    return Mesh(grid, ("host", "chip"))


def seq_mesh(n_devices: int | None = None) -> Mesh:
    """Flat sequence-shard mesh over global devices (host-major order:
    neighbor shards are intra-host first, so ppermute halo exchange
    rides ICI except at host boundaries)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.asarray(devs[:n_devices]), ("seq",))
