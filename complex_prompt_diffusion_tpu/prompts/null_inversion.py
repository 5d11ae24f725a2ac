"""Null-text inversion (prompt-to-prompt editing support).

Parity target: NullInversionTransform / NullInversion
(/root/reference/cpd/embeddings/transforms.py:761-948 and the duplicate
/root/reference/cpd/samplers/extension/null_inversion.py:40-209; Mokady et
al., arXiv:2211.09794):

  1. ``ddim_loop`` — deterministic DDIM inversion of an image latent,
     recording the latent at every step (transforms.py:888-905).
  2. ``null_optimization`` — walking the chain backwards, optimize the
     *unconditional* embedding at each step so the CFG-guided DDIM step
     reproduces the recorded latent (transforms.py:916-948); Adam with a
     step-scaled learning rate, fixed inner-iteration budget.

Returns the per-step optimized uncond embeddings, which the sampling loop
consumes as a per-step conditioning table.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from complex_prompt_diffusion_tpu.schedules import InferenceTables

__all__ = ["ddim_invert_loop", "null_optimization", "null_text_inversion"]


def _step_coeffs(it: InferenceTables, idx):
    a_t = jnp.take(jnp.asarray(it.alphas_cumprod_t, jnp.float32), idx)
    a_prev = jnp.take(jnp.asarray(it.alphas_cumprod_prev_t, jnp.float32), idx)
    return a_t, a_prev


def ddim_invert_loop(
    cond_eps_fn: Callable,
    z0: jax.Array,
    itables: InferenceTables,
) -> jax.Array:
    """Forward DDIM inversion, recording every latent (transforms.py:888-905).

    cond_eps_fn(x, t) -> eps with the *conditional* embedding only (the
    inversion runs without CFG). Returns latents [S+1, ...] with
    latents[0] = z0, latents[-1] = the inverted noise.
    """
    it = jax.tree_util.tree_map(jnp.asarray, itables)
    s = int(itables.num_steps)

    def body(x, i):
        t = jnp.take(it.timesteps, i)
        eps = cond_eps_fn(x, t)
        a_t, a_prev = _step_coeffs(itables, i)
        # invert: x_{t+1} from x_t (next_step semantics)
        x0 = (x - jnp.sqrt(1 - a_prev) * eps) / jnp.sqrt(a_prev)
        x_next = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
        return x_next, x_next

    _, traj = jax.lax.scan(body, z0, jnp.arange(s))
    return jnp.concatenate([z0[None], traj], axis=0)


def null_optimization(
    cfg_eps_fn: Callable,
    latents: jax.Array,
    uncond_init: jax.Array,
    itables: InferenceTables,
    guidance_scale: float = 7.5,
    num_inner_steps: int = 10,
    lr: float = 1e-2,
) -> jax.Array:
    """Optimize a per-step uncond embedding table (transforms.py:916-948).

    cfg_eps_fn(x, t, uncond) -> (eps_uncond, eps_cond). Walks from the most
    noisy recorded latent down: at step index idx (descending), finds
    uncond s.t. the CFG DDIM step from latents[idx+1] lands on latents[idx].
    Returns uncond table [S, L, D].
    """
    it = jax.tree_util.tree_map(jnp.asarray, itables)
    s = int(itables.num_steps)
    uncond = jnp.asarray(uncond_init)

    opt = optax.adam(lr)

    def ddim_step_with(x, eps, idx):
        a_t, a_prev = _step_coeffs(itables, idx)
        pred_x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1 - a_prev) * eps

    @jax.jit
    def inner(uncond, x_cur, target, idx, t):
        def loss_fn(u):
            e_u, e_c = cfg_eps_fn(x_cur, t, u)
            eps = e_u + guidance_scale * (e_c - e_u)
            x_prev = ddim_step_with(x_cur, eps, idx)
            return jnp.mean((x_prev - target) ** 2)

        state = opt.init(uncond)

        def opt_body(carry, _):
            u, st = carry
            loss, g = jax.value_and_grad(loss_fn)(u)
            updates, st = opt.update(g, st, u)
            u = optax.apply_updates(u, updates)
            return (u, st), loss

        (uncond_out, _), losses = jax.lax.scan(
            opt_body, (uncond, state), None, length=num_inner_steps
        )
        return uncond_out, losses[-1]

    out = []
    # iterate descending: idx = s-1 (most noisy) .. 0
    for i in range(s):
        idx = s - 1 - i
        t = jnp.take(it.timesteps, idx)
        x_cur = latents[idx + 1]
        target = latents[idx]
        uncond, _ = inner(uncond, x_cur, target, jnp.asarray(idx), t)
        out.append(uncond)
    return jnp.stack(out)  # ordered most-noisy-first (loop iteration order)


def null_text_inversion(
    cond_eps_fn: Callable,
    cfg_eps_fn: Callable,
    z0: jax.Array,
    uncond_init: jax.Array,
    itables: InferenceTables,
    guidance_scale: float = 7.5,
    num_inner_steps: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Full pipeline (NullInversion.invert, transforms.py:950-960): returns
    (x_T, per-step uncond table)."""
    latents = ddim_invert_loop(cond_eps_fn, z0, itables)
    unconds = null_optimization(
        cfg_eps_fn, latents, uncond_init, itables,
        guidance_scale=guidance_scale, num_inner_steps=num_inner_steps,
    )
    return latents[-1], unconds
