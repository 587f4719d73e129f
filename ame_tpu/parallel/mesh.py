"""Mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_specs: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh. Default: all devices on one 'data' axis."""
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
