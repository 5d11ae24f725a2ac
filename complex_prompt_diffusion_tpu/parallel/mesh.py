"""Mesh + sharding helpers.

Axis convention (SURVEY.md §5 "Distributed communication backend"):
  * ``data``  — batch / frame parallelism (the workload's natural axis:
    per-image and per-frame independence; 64-frame animation -> 8 chips).
  * ``model`` — reserved tensor-parallel axis (head/channel sharding for
    large-batch or hi-res serving experiments).

Weights are replicated: SD-1.5's 860M bf16 params ~ 1.7 GB, resident in every
chip's HBM — the entire reference vram.py offload machinery
(/root/reference/cpd/vram.py:50-153) is deleted by design.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_batch", "data_parallel_sharding"]


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ("data", "model") mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (weights) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [batch, ...] arrays: batch split over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of [batch, ...] arrays with batch sharded over data."""
    return jax.device_put(tree, data_parallel_sharding(mesh))
