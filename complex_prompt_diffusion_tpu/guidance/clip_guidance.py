"""CLIP gradient guidance.

Parity target: DDIMSampler._get_clip_guide
(/root/reference/cpd/samplers/ddim.py:385-550) and the sigma-space variant
(extension/denoiser.py:76-265), plus the standalone CLIPGuidedStableDiffusion
cond_fn (/root/reference/cpd/pipeline/clipguided_txt2img.py:127-194).

The computation: predict x0 from (x, eps) -> VAE decode -> resize 224 ->
CLIP-normalize -> CLIP image embedding -> mean of three spherical distance
losses against the text embedding (plain / midpoint / difference,
ddim.py:498-526) -> gradient wrt x -> inf-norm normalize, scale by
grad_scale/100 -> e_t = e_t_original - sqrt(1 - a_t) * grads.

Where the reference fights requires_grad/auto-cast gymnastics across module
offloads (ddim.py:407-410,533-549), this is one ``jax.grad`` through a pure
function.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.models.clip import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIPVisionConfig,
    clip_vision_apply,
)

__all__ = ["ClipGuidanceConfig", "spherical_dist_loss", "make_clip_guidance"]


def spherical_dist_loss(x, y):
    """2 * arcsin(||x_hat - y_hat|| / 2)^2 (ddim.py:823-826)."""
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return 2.0 * jnp.arcsin(jnp.linalg.norm(x - y, axis=-1) / 2.0) ** 2


@dataclasses.dataclass(frozen=True)
class ClipGuidanceConfig:
    """Flag surface of ddim.py:386-404."""

    loss_scale: float = 1.0
    grad_scale: float = 1.0
    freq: int = 1  # apply every Nth timestep
    mode: int = 0  # 0: closed-form x0; 1: scheduler-step x0
    factor_limit: int = 1  # unused here: guidance uses the combined e_t


def make_clip_guidance(
    vae_decode_fn: Callable,
    vision_cfg: CLIPVisionConfig,
    vision_params,
    text_embedding: jax.Array,
    gcfg: ClipGuidanceConfig = ClipGuidanceConfig(),
    latent_scale: float = 0.18215,
    eps_in_grad_fn: Optional[Callable] = None,
):
    """Build clip_guide(x, e_t, a_t) -> corrected e_t.

    vae_decode_fn(latents_unscaled) -> images [-1, 1];
    text_embedding [P] or [1, P] — the normalized guide-CLIP text embedding.

    ``eps_in_grad_fn(x) -> eps``: when given, the eps used for the x0
    prediction INSIDE the differentiated loss is recomputed from x, so the
    gradient flows through the UNet — the reference enables grad on the
    UNet and re-evaluates it on the requires_grad x (ddim.py:407-410,
    :417-466: the factor-combined eps). Without it, e_t is treated as a
    constant (the cheaper detached approximation)."""
    text_embedding = jnp.atleast_2d(text_embedding)
    mean = jnp.asarray(CLIP_IMAGE_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(CLIP_IMAGE_STD).reshape(1, 1, 1, 3)

    def loss_fn(x, e_t, a_t):
        if eps_in_grad_fn is not None:
            e_t = eps_in_grad_fn(x)
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        img = vae_decode_fn(pred_x0 / latent_scale)
        img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
        size = vision_cfg.image_size
        img = jax.image.resize(
            img, (img.shape[0], size, size, img.shape[-1]), method="bilinear"
        )
        img = (img - mean) / std

        image_emb = clip_vision_apply(vision_cfg, vision_params, img)
        text_emb = text_embedding
        mean_emb = (image_emb + text_emb) / 2.0
        diff_emb = image_emb - text_emb

        loss = (
            spherical_dist_loss(image_emb, text_emb).mean()
            + spherical_dist_loss(mean_emb, text_emb).mean()
            + spherical_dist_loss(diff_emb, text_emb).mean()
        ) * (gcfg.loss_scale / 3.0)
        return loss

    def clip_guide(x, e_t, a_t):
        """x: latents; e_t: current guided eps; a_t: alphas_cumprod at this
        step. Returns corrected eps (ddim.py:527-532)."""
        grads = -jax.grad(loss_fn)(x, e_t, a_t)
        if gcfg.grad_scale > 0:
            # reference: grads.norm(p=inf, dim=1, keepdim=True) on NCHW
            # (ddim.py:531) — a PER-PIXEL max over channels, not a global
            # max; channels are the last axis in our NHWC layout
            inf_norm = jnp.max(jnp.abs(grads), axis=-1, keepdims=True)
            grads = grads / jnp.maximum(inf_norm, 1e-12)
            grads = grads * (gcfg.grad_scale / 100.0)
        return e_t - jnp.sqrt(1.0 - a_t) * grads

    return clip_guide
