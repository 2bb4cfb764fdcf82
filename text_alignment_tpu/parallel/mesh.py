"""Device-mesh construction for multi-chip scale-out.

The reference's only concurrency was two ocropus worker processes and
Rodan-level job fan-out (SURVEY.md §2, alignToOCR.py:24,143). Here the
scale-out story is a JAX mesh: folios/line-batches are data-parallel over
ICI, with an optional model axis for sharding the recognizer's widest
matmuls. No custom comm layer: XLA emits the collectives.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def _devices_for(n: int | None):
    """Devices of the default backend, falling back to the CPU backend when
    the default can't supply n devices (e.g. one real TPU available but a
    dry run wants an 8-way virtual CPU mesh via
    --xla_force_host_platform_device_count)."""
    devs = jax.devices()
    if n is not None and len(devs) < n:
        cpu = jax.devices("cpu")
        if len(cpu) >= n:
            devs = cpu
        else:
            raise ValueError(
                f"need {n} devices; have {len(devs)} default / {len(cpu)} cpu"
            )
    return devs


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over the first n devices."""
    devs = _devices_for(n_devices)
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def data_model_mesh(n_devices: int | None = None,
                    model_parallel: int | None = None) -> Mesh:
    """2-D ('data', 'model') mesh. model axis defaults to 2 when the device
    count allows, else 1 (pure DP)."""
    devs = _devices_for(n_devices)
    n = n_devices or len(devs)
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 2 else 1
    assert n % model_parallel == 0
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))
