"""Attention-saliency guidance (self-attention/skip-feature guidance).

Parity target: DDIMSampler._attn_guidance
(/root/reference/cpd/samplers/ddim.py:190-249) and its wiring in
_calculate_epsilon (:268-271, 305-306, 331-333): on the last few sampling
steps, a saliency mask is derived from one of the UNet's encoder skip
tensors (the reference's "attn" outputs — actually feature maps,
unet.py:799-803), the predicted x0 is blurred inside the salient region,
re-noised, and a second UNet evaluation on that degraded input provides a
contrast signal:

    e_t_final = e_attn + attn_guide_scale * (e_t_cfg - e_attn)

pushing the result away from what the model does on the blurred input (a
SAG-style self-guidance).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.ops import gaussian_blur
from complex_prompt_diffusion_tpu.schedules import InferenceTables

__all__ = ["AttnGuidanceConfig", "make_attn_guidance"]


@dataclasses.dataclass(frozen=True)
class AttnGuidanceConfig:
    """ddim.py:195-202 / :269-272 flags."""

    scale: float = 1.1  # attn_guide_scale
    rounds: int = 4  # apply on the last N steps (attn_guide_rounds)
    skip_idx: int = -1  # which skip tensor provides the saliency map
    mask_threshold: float = 90.0  # percentile (attn_guide_mask_threshold)
    blur_k: int = 31  # attn_guide_blur_k
    mask_batch_idx: int = 0


def saliency_mask(
    skip_feat: jax.Array, threshold_pct: float, out_hw, batch_idx: int = 0
):
    """Feature map [N, h, w, C] -> binary mask [1, H, W, 1] by channel-mean +
    percentile binarization + resize (ddim.py:215-221)."""
    m = jnp.mean(skip_feat.astype(jnp.float32), axis=-1, keepdims=True)
    s = jnp.quantile(m, threshold_pct / 100.0)
    m = jnp.where(m > s, 1.0, 0.0)
    m = m[batch_idx : batch_idx + 1]
    return jax.image.resize(m, (1,) + tuple(out_hw) + (1,), method="nearest")


def make_attn_guidance(
    unet_skips_fn: Callable,
    unet_uncond_fn: Callable,
    itables: InferenceTables,
    acfg: AttnGuidanceConfig = AttnGuidanceConfig(),
):
    """Build attn_guide(x, t, idx, e_t_cfg, e_uncond_input) -> e_t.

    unet_skips_fn(x, t) -> (eps, skips tuple) for the unconditional input;
    unet_uncond_fn(x, t) -> eps for the degraded input (single factor).
    ``idx`` is the descending table index; guidance runs only when the
    caller's per-step flag says so (the reference gates on
    t_idx > total - rounds, ddim.py:271).
    """
    it = jax.tree_util.tree_map(jnp.asarray, itables)

    def attn_guide(x, t, idx, e_t_cfg):
        eps_u, skips = unet_skips_fn(x, t)
        mask = saliency_mask(
            skips[acfg.skip_idx], acfg.mask_threshold, x.shape[1:3],
            acfg.mask_batch_idx,
        )

        a_t = jnp.take(it.alphas_cumprod_t, idx)
        a_prev = jnp.take(it.alphas_cumprod_prev_t, idx)
        sqrt_1m = jnp.take(it.sqrt_one_minus_alphas_cumprod_t, idx)

        # deterministic step to x0-space (attn_guide_mode=2, ddim.py:223-227)
        pred_x0 = (x - sqrt_1m * eps_u) / jnp.sqrt(a_t)
        blurred = gaussian_blur(pred_x0, acfg.blur_k)
        # undo the step: re-noise the blurred sample back to t
        blur_x = jnp.sqrt(a_t) * blurred + sqrt_1m * eps_u

        guide_x = blur_x * mask + x * (1.0 - mask)
        e_attn = unet_uncond_fn(guide_x, t)
        return e_attn + acfg.scale * (e_t_cfg - e_attn)

    return attn_guide
