"""Multi-factor classifier-free guidance — the framework's denoising core.

Implements the reference's CFG contract (ddim.py:251-383 and
extension/denoiser.py:324-542) as pure jit-compatible functions:

  * All prompt factors (1 uncond + K and/not factors) are batched through ONE
    UNet call (reference ddim.py:297-311).
  * eps = e_uncond + guidance_scale_t * sum_k mask_k * scale_k * (e_k - e_uncond)
    where `not` factors carry negative scale (ddim.py:295,324-329).
  * Optional per-step scale decay (ddim.py:346-360), dynamic scale clip
    (ddim.py:372-376), unconditional-blur on late steps (ddim.py:261-266,313),
    eps thresholding via the score-corrector chain (ddim.py:379-380).
  * Depth conditioning: the depth map is concatenated as an extra latent
    channel before factor tiling (ddim.py:274-276,299-302).

Host-side prompt algebra (complex_prompt_diffusion_tpu.prompts) compiles down
to a fixed-shape :class:`GuidanceSpec`, so the jit'd loop never sees Python
prompt objects. K is static per compilation; pad factors (scale=0) to reuse
compiled graphs across prompt edits.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from complex_prompt_diffusion_tpu.guidance.threshold import (
    dynamic_clip,
    get_thresholder,
)
from complex_prompt_diffusion_tpu.ops import gaussian_blur

__all__ = [
    "GuidanceSpec",
    "GuidanceConfig",
    "cfg_epsilon",
    "cfg_epsilon_deepcache",
    "make_denoiser",
    "make_uc_scale_schedule",
    "sigma_to_t_cont",
]


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, f) for f in fields), None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class GuidanceSpec:
    """Stacked guidance factors (the compiled form of a complex prompt).

    uncond:  [L, D]      unconditional (negative-prompt) embedding
    factors: [K, L, D]   conditioning embeddings (and-factors then not-factors)
    scales:  [K]         per-factor weights; negative for "not" factors
    masks:   [K, h, w, 1] or [K, 1, 1, 1]   spatial masks over the latent
    """

    uncond: jax.Array
    factors: jax.Array
    scales: jax.Array
    masks: jax.Array

    @staticmethod
    def single(cond: jax.Array, uncond: jax.Array, scale: float = 1.0) -> "GuidanceSpec":
        """Plain one-prompt CFG."""
        return GuidanceSpec(
            uncond=jnp.asarray(uncond),
            factors=jnp.asarray(cond)[None],
            scales=jnp.asarray([scale], jnp.float32),
            masks=jnp.ones((1, 1, 1, 1), jnp.float32),
        )

    @property
    def num_factors(self) -> int:
        return self.factors.shape[0]


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Static CFG behavior switches (the typed replacement for the
    reference's kwargs cascade, ddim.py:252-276 and :337-368)."""

    guidance_scale: float = 7.5  # unconditional_guidance_scale
    # per-step scale decay (decaying_uc_scale, ddim.py:346-360)
    decay_scale: bool = False
    decay_scale_min: float = 0.0
    decay_scale_start: Optional[int] = None  # default: total_steps
    # post-sum dynamic clip (ddim.py:367-376)
    dynamic_scale_clip: bool = False
    dynamic_scale_clip_threshold: float = 99.9
    # unconditional blur on the last N steps (ddim.py:261-266)
    uc_blur: bool = False
    uc_blur_k: int = 7
    uc_blur_rounds: Optional[int] = None  # default: total_steps // 10
    # eps thresholding (score corrector, ddim.py:379-380)
    threshold_e: Optional[str] = None
    threshold_e_value: float = 99.66
    # attention-saliency (SAG-style) guidance on the last N steps
    # (ddim.py:268-272; see guidance.attn_guidance)
    attn_guide: bool = False
    attn_guide_rounds: int = 4
    attn_guide_scale: float = 1.1
    attn_guide_skip_idx: int = -1
    attn_guide_mask_threshold: float = 90.0
    attn_guide_blur_k: int = 31


def make_uc_scale_schedule(
    gcfg: GuidanceConfig, total_steps: int
) -> np.ndarray:
    """Per-step guidance scale [S], replicating the inline log-decay of
    ddim.py:346-360 (t_idx is the loop iteration, 0 = most noisy)."""
    out = np.full(total_steps, gcfg.guidance_scale, dtype=np.float64)
    if gcfg.decay_scale:
        start = (
            gcfg.decay_scale_start
            if gcfg.decay_scale_start is not None
            else total_steps
        )
        uc = gcfg.guidance_scale
        for t_idx in range(total_steps):
            if start < t_idx:
                start = min(t_idx, start)
                uc = max(
                    gcfg.decay_scale_min,
                    uc - uc * (np.log(t_idx + 1 - start) / np.log(total_steps)),
                )
            out[t_idx] = uc
    return out


def make_uc_blur_schedule(gcfg: GuidanceConfig, total_steps: int) -> np.ndarray:
    """Per-step blur flag [S] (ddim.py:263-264: blur when
    t_idx > total_steps - rounds)."""
    if not gcfg.uc_blur:
        return np.zeros(total_steps, dtype=bool)
    rounds = (
        gcfg.uc_blur_rounds
        if gcfg.uc_blur_rounds is not None
        else total_steps // 10
    )
    t_idx = np.arange(total_steps)
    return t_idx > (total_steps - rounds)


def stacked_context(spec: "GuidanceSpec", batch_size: int) -> jax.Array:
    """The [(1+K)*B, L, D] factor-major context the batched UNet call sees
    (uncond first, then factors; ddim.py:297-304). Exposed so callers can
    precompute loop-invariant cross-attention k/v from it
    (models.precompute_cross_kv) outside the sampling scan."""
    ctx = jnp.concatenate([spec.uncond[None], spec.factors], axis=0)  # [1+K, L, D]
    return jnp.repeat(ctx, batch_size, axis=0)  # factor-major


def _batched_inputs(x, t, spec, depth_mask):
    """Tile x/t and stack contexts for the one-call factor batch
    (ddim.py:297-304)."""
    b = x.shape[0]
    k = spec.num_factors
    if depth_mask is not None:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(depth_mask, x.shape[:3] + (depth_mask.shape[-1],))],
            axis=-1,
        )
    x_in = jnp.tile(x, (1 + k, 1, 1, 1))
    t_b = jnp.broadcast_to(jnp.asarray(t), (b,))
    t_in = jnp.tile(t_b, (1 + k,))
    return x_in, t_in, stacked_context(spec, b)


def _split_and_sum(out, spec, b, gcfg, uc_blur_on):
    """CFG weighted masked sum from the batched UNet output
    (ddim.py:311-329)."""
    k = spec.num_factors
    out = out.reshape((1 + k, b) + out.shape[1:])
    e_uncond = out[0]
    e_factors = out[1:]  # [K, B, H, W, C]

    if uc_blur_on is not None and gcfg.uc_blur:
        e_uncond = jax.lax.cond(
            uc_blur_on,
            lambda e: gaussian_blur(e, gcfg.uc_blur_k),
            lambda e: e,
            e_uncond,
        )
    weights = spec.scales.reshape(k, 1, 1, 1, 1) * spec.masks[:, None]
    e_sum = jnp.sum(weights * (e_factors - e_uncond[None]), axis=0)
    return e_uncond, e_sum


def _combine(e_uncond, e_sum, uc_scale, gcfg):
    """e_t = e_uncond + scale * e_sum with clip/threshold post-processing
    (_epsilon_t, ddim.py:370-380)."""
    scaled = uc_scale * e_sum
    if gcfg.dynamic_scale_clip:
        scaled = dynamic_clip(scaled, gcfg.dynamic_scale_clip_threshold)
    e_t = e_uncond + scaled
    if gcfg.threshold_e:
        e_t = get_thresholder(gcfg.threshold_e)(e_t, gcfg.threshold_e_value)
    return e_t


def cfg_epsilon(
    unet_eps: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    x: jax.Array,
    t: jax.Array,
    spec: GuidanceSpec,
    uc_scale: jax.Array,
    *,
    gcfg: GuidanceConfig = GuidanceConfig(),
    depth_mask: Optional[jax.Array] = None,
    uc_blur_on: Optional[jax.Array] = None,
) -> jax.Array:
    """One guided eps evaluation.

    unet_eps(x_in, t_in, context) -> eps, where x_in [(1+K)*B, H, W, C],
    t_in [(1+K)*B], context [(1+K)*B, L, D].
    x: [B, H, W, C]; t: scalar or [B]; uc_scale: scalar (this step's scale).
    """
    x_in, t_in, ctx_in = _batched_inputs(x, t, spec, depth_mask)
    out = unet_eps(x_in, t_in, ctx_in)
    e_uncond, e_sum = _split_and_sum(out, spec, x.shape[0], gcfg, uc_blur_on)
    return _combine(e_uncond, e_sum, uc_scale, gcfg)


def cfg_epsilon_deepcache(
    unet_full: Callable,
    unet_shallow: Callable,
    x: jax.Array,
    t: jax.Array,
    spec: GuidanceSpec,
    uc_scale: jax.Array,
    is_full,
    deep: jax.Array,
    *,
    gcfg: GuidanceConfig = GuidanceConfig(),
    depth_mask: Optional[jax.Array] = None,
    uc_blur_on: Optional[jax.Array] = None,
):
    """DeepCache variant of :func:`cfg_epsilon` (opt-in approximate mode;
    see models/unet.py unet_apply).

    unet_full(x_in, t_in, ctx) -> (eps, deep'), unet_shallow(x_in, t_in,
    ctx, deep) -> eps. On cache steps (``is_full`` true) the full UNet runs
    and refreshes the deep feature; on retrieval steps only the shallow
    subgraph runs against the carried one. Returns (e_t, deep').
    """
    x_in, t_in, ctx_in = _batched_inputs(x, t, spec, depth_mask)
    out, deep = jax.lax.cond(
        is_full,
        lambda d: unet_full(x_in, t_in, ctx_in),
        lambda d: (unet_shallow(x_in, t_in, ctx_in, d), d),
        deep,
    )
    e_uncond, e_sum = _split_and_sum(out, spec, x.shape[0], gcfg, uc_blur_on)
    return _combine(e_uncond, e_sum, uc_scale, gcfg), deep


def make_denoiser_deepcache(
    unet_full: Callable,
    unet_shallow: Callable,
    spec: GuidanceSpec,
    *,
    interval: int,
    gcfg: GuidanceConfig = GuidanceConfig(),
    model_sigmas: Optional[jax.Array] = None,
    parameterization: str = "eps",
    depth_mask: Optional[jax.Array] = None,
) -> Callable:
    """Sigma-space DeepCache denoiser for the k-diffusion samplers.

    Returns ``den_fn(x, sigma, uc_scale, i, deep) -> (denoised, deep')`` —
    the stateful protocol threaded by kdiff._den2: the full UNet runs on
    every ``interval``-th sampler step (refreshing the carried deep
    feature); in between only the shallow retrieval subgraph runs (see
    :func:`cfg_epsilon_deepcache`). Multi-eval samplers (Heun, DPM2,
    DPM++ 2S) evaluate twice with the same step index, so on cache steps
    both evals are full (the second refresh lands closer to the next
    step); retrieval steps stay shallow for both.

    Same input-scaling / v-param contract as make_denoiser's denoised_fn
    (the reference Denoiser.forward, extension/denoiser.py:362-393,528-542).
    """
    if model_sigmas is None:
        # mirror make_denoiser.denoised_fn's explicit contract: without the
        # model sigma table the sigma->t mapping is undefined (misuse would
        # otherwise surface as a cryptic jnp.asarray(None) inside
        # sigma_to_t_cont mid-trace)
        raise ValueError("make_denoiser_deepcache requires model_sigmas")

    def den_fn(x, sigma, uc_scale, i, deep):
        sigma = jnp.asarray(sigma, jnp.float32)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        t = sigma_to_t_cont(sigma, model_sigmas)
        e_t, deep = cfg_epsilon_deepcache(
            unet_full, unet_shallow, x * c_in, t, spec, uc_scale,
            (i % interval) == 0, deep,
            gcfg=gcfg, depth_mask=depth_mask,
        )
        if parameterization == "v":
            alpha = 1.0 / jnp.sqrt(1.0 + sigma**2)
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma * alpha
            return x * c_skip + e_t * c_out, deep
        return x - sigma * e_t, deep

    return den_fn


def cfg_epsilon_attn_guided(
    unet_eps: Callable,
    unet_eps_skips: Callable,
    x: jax.Array,
    t: jax.Array,
    spec: GuidanceSpec,
    uc_scale: jax.Array,
    step_coeffs,
    *,
    gcfg: GuidanceConfig,
    depth_mask: Optional[jax.Array] = None,
    uc_blur_on: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention-saliency-guided variant (_attn_guidance + the blend in
    _calculate_epsilon, ddim.py:190-249, 305-306, 331-333).

    unet_eps_skips(x_in, t_in, ctx) -> (eps, skip tensors); step_coeffs =
    (a_t, sqrt_one_minus_a_t) for the blur/renoise roundtrip. The saliency
    mask comes from one encoder skip tensor; the blurred-salient-region input
    is re-evaluated with the uncond context alone and the CFG sum is pushed
    away from it: e_sum' = e_attn + scale * (e_sum - e_attn).
    """
    b = x.shape[0]
    x_in, t_in, ctx_in = _batched_inputs(x, t, spec, depth_mask)
    out, skips = unet_eps_skips(x_in, t_in, ctx_in)
    e_uncond, e_sum = _split_and_sum(out, spec, b, gcfg, uc_blur_on)

    # saliency mask from the configured skip tensor (uncond batch slice)
    feat = skips[gcfg.attn_guide_skip_idx][:b]
    m = jnp.mean(feat.astype(jnp.float32), axis=-1, keepdims=True)
    thresh = jnp.quantile(m, gcfg.attn_guide_mask_threshold / 100.0)
    m = jnp.where(m > thresh, 1.0, 0.0)
    mask = jax.image.resize(m, (b,) + x.shape[1:3] + (1,), method="nearest")

    a_t, sqrt_1m = step_coeffs
    pred_x0 = (x - sqrt_1m * e_uncond) / jnp.sqrt(a_t)
    blurred = gaussian_blur(pred_x0, gcfg.attn_guide_blur_k)
    blur_x = jnp.sqrt(a_t) * blurred + sqrt_1m * e_uncond
    guide_x = blur_x * mask + x * (1.0 - mask)

    if depth_mask is not None:
        guide_x = jnp.concatenate(
            [guide_x, jnp.broadcast_to(depth_mask, guide_x.shape[:3] + (depth_mask.shape[-1],))],
            axis=-1,
        )
    t_b = jnp.broadcast_to(jnp.asarray(t), (b,))
    e_attn = unet_eps(guide_x, t_b, jnp.repeat(spec.uncond[None], b, axis=0))

    e_sum = e_attn + gcfg.attn_guide_scale * (e_sum - e_attn)
    return _combine(e_uncond, e_sum, uc_scale, gcfg)


def sigma_to_t_cont(sigma: jax.Array, model_sigmas: jax.Array) -> jax.Array:
    """Continuous sigma -> fractional trained timestep, linear interpolation
    against the ascending model sigma table (reference discrete.py:120-131),
    on-device."""
    sigma = jnp.asarray(sigma)
    table = jnp.asarray(model_sigmas)
    hi = jnp.clip(jnp.searchsorted(table, sigma), 1, table.shape[0] - 1)
    lo = hi - 1
    w = (sigma - table[lo]) / (table[hi] - table[lo])
    w = jnp.clip(w, 0.0, 1.0)
    return lo.astype(jnp.float32) + w


def make_denoiser(
    unet_eps: Callable,
    spec: GuidanceSpec,
    *,
    gcfg: GuidanceConfig = GuidanceConfig(),
    model_sigmas: Optional[jax.Array] = None,
    parameterization: str = "eps",
    depth_mask: Optional[jax.Array] = None,
):
    """Build the two denoising closures the samplers consume.

    Returns (eps_fn, denoised_fn):
      * eps_fn(x, t, uc_scale, uc_blur_on) — t-space (DDIM family).
      * denoised_fn(x, sigma, uc_scale) — sigma-space (k-diffusion family):
        scales input by c_in = 1/sqrt(sigma^2+1), converts sigma to a
        fractional timestep, and returns x - sigma * eps (the reference
        Denoiser.forward contract, extension/denoiser.py:362-393,528-542).
    """

    def eps_fn(x, t, uc_scale, uc_blur_on=None):
        return cfg_epsilon(
            unet_eps, x, t, spec, uc_scale,
            gcfg=gcfg, depth_mask=depth_mask, uc_blur_on=uc_blur_on,
        )

    def denoised_fn(x, sigma, uc_scale):
        if model_sigmas is None:
            raise ValueError("denoised_fn requires model_sigmas")
        sigma = jnp.asarray(sigma, jnp.float32)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        t = sigma_to_t_cont(sigma, model_sigmas)
        e_t = cfg_epsilon(
            unet_eps, x * c_in, t, spec, uc_scale,
            gcfg=gcfg, depth_mask=depth_mask,
        )
        if parameterization == "v":
            # v-param: denoised = c_skip * x + c_out * v with VP scalings
            alpha = 1.0 / jnp.sqrt(1.0 + sigma**2)
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma * alpha
            return x * c_skip + e_t * c_out
        return x - sigma * e_t

    return eps_fn, denoised_fn
