"""Mesh context for SPMD-partitioned Pallas kernels.

The Pallas kernels (ops/attention.py, ops/groupnorm.py) are custom calls
GSPMD cannot partition: under a mesh with sharded operands XLA inserts
all-gathers and runs the kernel fully REPLICATED on every device — correct,
but it silently discards the parallelism (measured: a sharded-input
pallas_call returns a P() replicated output). The fix is the standard one:
wrap the kernel in ``jax.shard_map`` so each device runs it on its local
shard; batch and heads are embarrassingly parallel in the kernel grid, so
no in-kernel communication is needed.

``ShardCtx`` carries the mesh + axis names through the existing
``use_pallas`` dispatch argument (UNetConfig.use_pallas) — hashable, so it
composes with the jit caches. ``parallel.tp.shard_bundle`` installs it;
single-device paths never see it.

No reference counterpart — the reference is single-GPU by design (SURVEY §2
"Parallelism & distributed communication").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from jax.sharding import Mesh

__all__ = ["ShardCtx", "axis_if_divisible"]


@dataclasses.dataclass(frozen=True)
class ShardCtx:
    """Mesh context threaded through ``use_pallas``.

    data_axis shards the batch dim, model_axis the heads dim (attention).
    ``interpret=True`` forces Pallas interpret mode inside the shard_map —
    used by CPU-mesh tests to exercise the kernel+shard_map composition
    (the default on CPU otherwise dispatches to the XLA path locally).
    """

    mesh: Mesh
    data_axis: Optional[str] = "data"
    model_axis: Optional[str] = "model"
    interpret: bool = False

    def axis_size(self, name: Optional[str]) -> int:
        if name is None or name not in self.mesh.shape:
            return 1
        return self.mesh.shape[name]

    def local_use_pallas(self):
        """use_pallas value for the per-shard kernel call inside shard_map.

        Returns the ``"interpret"`` sentinel when this ctx is in interpret
        mode so consumers that only receive a use_pallas channel (the tiled
        UNet's local config, the non-divisible attention fallback) keep the
        interpret flag instead of lowering real Mosaic kernels on CPU.
        """
        return "interpret" if self.interpret else None


def axis_if_divisible(ctx: ShardCtx, name: Optional[str], dim: int):
    """Return the axis name when sharding `dim` over it is well-formed."""
    size = ctx.axis_size(name)
    if size > 1 and dim % size == 0:
        return name
    return None
