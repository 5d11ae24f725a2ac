"""CLIP-guided txt2img pipeline (standalone).

Parity target: /root/reference/cpd/pipeline/clipguided_txt2img.py:13-346
(CLIPGuidedStableDiffusion, crowsonkb/Jack000 lineage): per-step gradient
guidance of the latents toward a CLIP text embedding, with random cutouts
(MakeCutouts :13-35), spherical distance loss (:139-143), and the PNDM-style
blend sample = x0 * sqrt(1-a) + x * (1 - sqrt(1-a)) (:152-160).

JAX redesign: cutouts use a static cutout plan (sizes/offsets drawn host-side
per render — the reference also draws them with unseeded torch RNG per call)
so shapes stay static under jit; the gradient is one jax.grad through
UNet -> x0-blend -> VAE -> cutouts -> CLIP.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu import schedules as S
from complex_prompt_diffusion_tpu.guidance.clip_guidance import spherical_dist_loss
from complex_prompt_diffusion_tpu.models.clip import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIPVisionConfig,
    clip_vision_apply,
)
from complex_prompt_diffusion_tpu.pipeline import (
    LATENT_SCALE,
    ModelBundle,
    RenderConfig,
    decode_latents,
    encode_prompt,
)

__all__ = ["make_cutout_plan", "apply_cutouts", "clip_guided_txt2img"]


def make_cutout_plan(
    rng: np.random.Generator,
    side: int,
    cut_size: int,
    num_cutouts: int,
    cut_power: float = 1.0,
) -> List[Tuple[int, int, int]]:
    """Random (size, offset_y, offset_x) cutouts (MakeCutouts.forward,
    clipguided_txt2img.py:24-35), drawn host-side for static shapes."""
    max_size = side
    min_size = min(side, cut_size)
    plan = []
    for _ in range(num_cutouts):
        size = int(rng.random() ** cut_power * (max_size - min_size) + min_size)
        oy = int(rng.integers(0, side - size + 1))
        ox = int(rng.integers(0, side - size + 1))
        plan.append((size, oy, ox))
    return plan


def apply_cutouts(images: jax.Array, plan, cut_size: int) -> jax.Array:
    """Crop + resize each cutout to cut_size (adaptive_avg_pool equivalent).
    images: [N, H, W, 3] -> [num_cutouts * N, cut_size, cut_size, 3]."""
    outs = []
    n = images.shape[0]
    for size, oy, ox in plan:
        crop = jax.lax.dynamic_slice(
            images,
            (0, oy, ox, 0),
            (n, size, size, images.shape[-1]),
        )
        outs.append(
            jax.image.resize(
                crop, (n, cut_size, cut_size, images.shape[-1]), method="linear"
            )
        )
    return jnp.concatenate(outs, axis=0)


def clip_guided_txt2img(
    bundle: ModelBundle,
    vision_cfg: CLIPVisionConfig,
    vision_params,
    prompt: str,
    clip_prompt: Optional[str] = None,
    negative_prompt: str = "",
    cfg: RenderConfig = RenderConfig(),
    *,
    clip_guidance_scale: float = 100.0,
    num_cutouts: int = 4,
    use_cutouts: bool = True,
    key: Optional[jax.Array] = None,
    text_embedding_clip: Optional[jax.Array] = None,
):
    """txt2img with per-step CLIP cutout guidance (reference __call__,
    clipguided_txt2img.py:196-346). Uses the DDIM/PNDM-style t-space chain.

    ``text_embedding_clip``: normalized guide-CLIP text embedding [P]; if
    None, requires a guide text tower on the bundle (falls back to the
    pooled SD text embedding — useful for tests)."""
    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    k_init, k_cut, k_steps = jax.random.split(key, 3)

    cond = encode_prompt(bundle, prompt)
    uncond = encode_prompt(bundle, negative_prompt)
    if text_embedding_clip is None:
        from complex_prompt_diffusion_tpu.pipeline import _clip_encode_jit

        pooled = _clip_encode_jit(
            bundle.clip_cfg, bundle.clip_params,
            jnp.asarray(bundle.tokenizer(clip_prompt or prompt)), "pooled",
        )
        text_embedding_clip = pooled
    text_embedding_clip = jnp.atleast_2d(text_embedding_clip)

    itables = S.make_inference_tables(bundle.tables, cfg.steps, eta=cfg.eta)
    it = jax.tree_util.tree_map(jnp.asarray, itables)
    s_steps = itables.num_steps
    shape = (cfg.batch_size,) + cfg.latent_shape

    rng = np.random.default_rng(cfg.seed)
    cut = vision_cfg.image_size
    # decoded image side: latent side * VAE upsampling factor (the full SD
    # VAE restores cfg.height; test-scale VAEs may upsample less)
    decoded_side = (cfg.height // 8) * 2 ** (len(bundle.vae_cfg.ch_mult) - 1)
    plan = (
        make_cutout_plan(rng, decoded_side, min(cut, decoded_side), num_cutouts)
        if use_cutouts
        else None
    )

    mean = jnp.asarray(CLIP_IMAGE_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(CLIP_IMAGE_STD).reshape(1, 1, 1, 3)
    gs = cfg.guidance.guidance_scale

    def unet_eps(params, x, t, ctx):
        return M.unet_apply(bundle.unet_cfg, params, x, t, ctx)

    def cond_loss(latents, t, a_t, params):
        eps = unet_eps(
            params, latents, jnp.broadcast_to(t, (latents.shape[0],)), cond
        )
        pred_x0 = (latents - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        fac = jnp.sqrt(1 - a_t)
        sample = pred_x0 * fac + latents * (1 - fac)  # PNDM blend (:157-160)
        img = M.vae_decode(bundle.vae_cfg, bundle.vae_params, sample / LATENT_SCALE)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        if use_cutouts:
            img = apply_cutouts(img, plan, cut)
        else:
            img = jax.image.resize(
                img, (img.shape[0], cut, cut, 3), method="linear"
            )
        img = (img - mean) / std
        emb = clip_vision_apply(vision_cfg, vision_params, img)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        dists = spherical_dist_loss(emb, text_embedding_clip)
        if use_cutouts:
            dists = dists.reshape(num_cutouts, latents.shape[0], -1)
            return jnp.sum(jnp.mean(jnp.sum(dists, axis=2), axis=0)) * clip_guidance_scale
        return jnp.mean(dists) * clip_guidance_scale

    def run(params, x_T, step_key):
        def body(x, i):
            idx = s_steps - 1 - i
            t = jnp.take(it.timesteps, idx)
            a_t = jnp.take(it.alphas_cumprod_t, idx)
            a_prev = jnp.take(it.alphas_cumprod_prev_t, idx)
            # CFG eps
            x_in = jnp.concatenate([x, x])
            t_in = jnp.broadcast_to(t, (2 * x.shape[0],))
            ctx = jnp.concatenate([uncond, cond])
            out = unet_eps(params, x_in, t_in, ctx)
            e_u, e_c = jnp.split(out, 2)
            e_t = e_u + gs * (e_c - e_u)
            # CLIP cond_fn: grads wrt latents, eps correction (:152-193)
            grads = -jax.grad(cond_loss)(x, t, a_t, params)
            e_t = e_t - jnp.sqrt(1 - a_t) * grads
            pred_x0 = (x - jnp.sqrt(1 - a_t) * e_t) / jnp.sqrt(a_t)
            x = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1 - a_prev) * e_t
            return x, None

        x, _ = jax.lax.scan(body, x_T, jnp.arange(s_steps))
        return x

    run_jit = jax.jit(run, donate_argnums=(1,))
    x_T = jax.random.normal(k_init, shape, jnp.float32)
    latents = run_jit(bundle.unet_params, x_T, k_steps)
    return decode_latents(bundle, latents), latents
