"""DAAM word heat maps from cross-attention probabilities.

Parity target: the DAAM capture machinery in
/root/reference/cpd/models/attention.py:30-67 (global heat_maps registry)
and :206-277 (daam_forward / _up_sample_attn): per-token cross-attention
probability maps, upsampled to a common grid and aggregated over heads and
layers.

Usage: run ``unet_apply(..., collect_attn_maps=True)`` once at the
timestep(s) of interest, then aggregate here. No global mutable state (the
reference's module-level defaultdict is noted in SURVEY §5 as thread-unsafe).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["aggregate_heat_maps", "word_heat_map"]


def aggregate_heat_maps(
    attn_maps: Sequence[jax.Array],
    out_size: int = 64,
    method: str = "bicubic",
    batch_idx: int = 0,
) -> jax.Array:
    """Aggregate per-site cross-attention maps into per-token heat maps.

    attn_maps: sequence of [B, heads, HW, L] (one per cross-attn site, as
    returned by ``collect_attn_maps``). Each site's maps are reshaped to its
    spatial grid, upsampled to [out_size, out_size] (the reference's
    _up_sample_attn bicubic path), then averaged over heads and sites.
    Returns [L, out_size, out_size].
    """
    acc = None
    count = 0
    for maps in attn_maps:
        b, heads, hw, L = maps.shape
        side = int(math.sqrt(hw))
        m = maps[batch_idx].astype(jnp.float32)  # [heads, HW, L]
        m = m.transpose(2, 0, 1).reshape(L * heads, side, side)
        m = jax.image.resize(m, (L * heads, out_size, out_size), method=method)
        m = m.reshape(L, heads, out_size, out_size).mean(axis=1)  # [L, H, W]
        acc = m if acc is None else acc + m
        count += 1
    return acc / max(count, 1)


def word_heat_map(
    attn_maps: Sequence[jax.Array],
    token_idxs: Sequence[int],
    out_size: int = 64,
    normalize: bool = True,
    batch_idx: int = 0,
) -> jax.Array:
    """Heat map for a word spanning ``token_idxs`` (mean over its tokens).
    Returns [out_size, out_size] in [0, 1] when normalized."""
    maps = aggregate_heat_maps(attn_maps, out_size, batch_idx=batch_idx)
    hm = maps[jnp.asarray(list(token_idxs))].mean(axis=0)
    if normalize:
        hm = (hm - hm.min()) / (hm.max() - hm.min() + 1e-12)
    return hm
