"""Tensor-parallel inference: Megatron-style UNet weight sharding.

No reference counterpart — the reference is single-GPU by design (SURVEY §2
"Parallelism & distributed communication"). This is the TPU-native scaling
path: annotate weight shardings over the mesh's "model" axis and let XLA's
SPMD partitioner insert the collectives (the scaling-book recipe — shardings
in, psum/all-gather out; no hand-written comms).

Sharding rules (the classic attention/MLP pair pattern):
  * attention to_q / to_k / to_v kernels  -> column-parallel  P(None, "model")
  * attention to_out kernel               -> row-parallel     P("model", None)
  * feed-forward proj (GEGLU in) kernel   -> column-parallel
  * feed-forward out kernel               -> row-parallel
  * everything else (convs, norms, time embedding) replicated — conv FLOPs
    are HBM-bound at inference batch sizes and the GroupNorm group stats
    stay local this way.

Pallas note: GSPMD cannot partition the custom flash-attention/GroupNorm
kernels (it would replicate them with inserted all-gathers), so
``shard_bundle`` installs an :class:`ops.sharding.ShardCtx` as the bundle's
``use_pallas`` value: the kernels then wrap themselves in ``jax.shard_map``
— batch over the "data" axis, attention heads over the "model" axis — and
each device runs its local kernel slab, composing with the row-parallel
out-projection psums GSPMD inserts outside. Sites that cannot shard (heads
not divisible by the model size, short-KV cross-attention) fall back
per-site to the XLA path, which GSPMD partitions cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from complex_prompt_diffusion_tpu.parallel.mesh import replicate

__all__ = ["unet_tp_shardings", "shard_bundle"]

# kernel-sharding rule by (parent module, leaf name); biases follow the
# output axis of their kernel
_COLUMN = ("to_q", "to_k", "to_v")


def _spec_for(path) -> P:
    names = [
        p.key if isinstance(p, jax.tree_util.DictKey) else None for p in path
    ]
    leaf = names[-1] if names else None
    parent = names[-2] if len(names) >= 2 else None
    is_ff = "ff" in names
    if leaf == "kernel":
        if parent in _COLUMN or (is_ff and parent == "proj"):
            return P(None, "model")
        if parent == "to_out" or (is_ff and parent == "out"):
            return P("model", None)
    if leaf == "bias" and (parent in _COLUMN or (is_ff and parent == "proj")):
        return P("model")
    return P()


def unet_tp_shardings(unet_params: Any, mesh: Mesh):
    """NamedSharding pytree for the UNet params (same structure)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path)), unet_params
    )


def shard_bundle(bundle, mesh: Mesh, *, interpret: bool = False):
    """Place a ModelBundle on the mesh: UNet weights tensor-parallel over
    "model", VAE/CLIP replicated. Returns a new bundle whose jit cache is
    fresh (the placement is part of the compiled program).

    ``interpret=True`` forces Pallas interpret mode inside the shard_map
    wrappers (CPU-mesh tests of the kernel+TP composition)."""
    from complex_prompt_diffusion_tpu.ops.sharding import ShardCtx

    model_size = mesh.shape.get("model", 1)
    unet_params = jax.device_put(
        bundle.unet_params, unet_tp_shardings(bundle.unet_params, mesh)
    )
    unet_cfg = bundle.unet_cfg
    if getattr(unet_cfg, "use_pallas", None) is not False:
        ctx = ShardCtx(
            mesh=mesh, data_axis="data", model_axis="model",
            interpret=interpret,
        )
        unet_cfg = dataclasses.replace(unet_cfg, use_pallas=ctx)
    return dataclasses.replace(
        bundle,
        unet_cfg=unet_cfg,
        unet_params=unet_params,
        vae_params=replicate(mesh, bundle.vae_params),
        clip_params=replicate(mesh, bundle.clip_params),
        _jit_cache={},
    )
