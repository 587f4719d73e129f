"""Mesh helpers (single-host and multi-host)."""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize JAX's multi-process runtime for pod-slice deployments.

    Call ONCE per host process before any jax computation; afterwards
    ``jax.devices()`` spans the whole slice, so every mesh built by
    ``make_mesh`` (fleet dp, sequence-parallel sp, dp x tp training) is a
    GLOBAL mesh and GSPMD lays its collectives over ICI/DCN as the
    sharding dictates — no code change anywhere else in the package.

    Arguments default to the standard env contract
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). On
    Cloud TPU multi-host slices where none of those are exported, set
    ``AME_TPU_DISTRIBUTED=1`` (or pass arguments): that forces
    ``jax.distributed.initialize()`` whose TPU-metadata auto-detect
    fills everything in. Without ANY of these signals this is a no-op —
    single-host boxes must keep working untouched, and auto-calling
    initialize() on them would hang waiting for a coordinator. Returns
    the process count."""
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    forced = (os.environ.get("AME_TPU_DISTRIBUTED") == "1"
              or "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""))
    if (coordinator_address is None and num_processes is None
            and process_id is None and not forced):
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_count()


def make_mesh(axis_specs: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh. Default: all devices on one 'data' axis (GLOBAL
    devices when ``init_distributed`` ran — jax.devices() spans every
    process of the slice)."""
    devices = devices if devices is not None else jax.devices()
    if axis_specs is None:
        axis_specs = {"data": len(devices)}
    names = tuple(axis_specs)
    shape = tuple(axis_specs.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev, names)
