"""RePaint inpainting sampler (Lugmayr et al. 2022, arXiv:2201.09865).

Parity targets:
  * jump-walk timesteps — /root/reference/cpd/scheduler/discrete.py:512-532
    (schedules.jump_timesteps)
  * masked known/unknown merge step — /root/reference/cpd/scheduler/
    repaint.py:191-285: DDIM-style unknown-region update (eta defaults 1),
    known region re-noised from the original image, then
    x = mask * known + (1-mask) * unknown (mask=1 keeps the original).
  * undo_step — repaint.py:287-297: renoise forward one coarse step via
    x = sqrt(1-beta) x + sqrt(beta) noise per trained timestep.

Note: the reference's step function references several undefined variables
(repaint.py:244,267,289 — it cannot run as written); this implements the
algorithm its comments cite, with the known region noised to the *previous*
timestep (RePaint Alg. 1 line 5, as in diffusers).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from complex_prompt_diffusion_tpu.schedules import DiffusionTables, jump_timesteps

__all__ = ["sample_repaint"]


def sample_repaint(
    eps_fn: Callable,
    original: jax.Array,
    mask: jax.Array,
    tables: DiffusionTables,
    steps: int = 50,
    jump_length: int = 10,
    jump_n_sample: int = 10,
    eta: float = 1.0,
    *,
    key: jax.Array,
    x_T: Optional[jax.Array] = None,
    uc_scale: float = 7.5,
):
    """Inpaint ``original`` where ``mask == 0`` (mask == 1 keeps the image).

    eps_fn(x, t, uc_scale, blur_flag) — the guidance closure. The jump walk
    is static; the loop is a lax.scan over per-transition coefficient rows.
    """
    walk = jump_timesteps(
        steps, tables.num_train_timesteps, jump_length, jump_n_sample
    )
    t_stride = tables.num_train_timesteps // steps
    ac = tables.alphas_cumprod
    betas = tables.betas

    # Build per-transition static coefficients. Walk entries are trained
    # timesteps; transition i goes from walk[i] to walk[i+1] (or to
    # walk[i]-stride at the end).
    t_cur = walk
    t_next = np.append(walk[1:], max(walk[-1] - t_stride, 0))
    is_reverse = t_next < t_cur

    a_t = ac[np.clip(t_cur, 0, None)]
    a_prev = ac[np.clip(t_next, 0, None)]
    sigma_t = eta * np.sqrt(
        np.where(
            is_reverse,
            (1 - a_prev) / np.maximum(1 - a_t, 1e-12)
            * (1 - a_t / np.maximum(a_prev, 1e-12)),
            0.0,
        )
    )
    # forward (undo) renoise: product of (1-beta) over the jumped range
    cum_keep = np.ones(len(walk))
    cum_var = np.zeros(len(walk))
    for i in range(len(walk)):
        if not is_reverse[i]:
            lo, hi = t_cur[i], t_next[i]
            keep = np.prod(1.0 - betas[lo:hi])
            cum_keep[i] = np.sqrt(keep)
            cum_var[i] = np.sqrt(1.0 - keep)

    coeffs = {
        "a_t": jnp.asarray(a_t, jnp.float32),
        "a_prev": jnp.asarray(a_prev, jnp.float32),
        "sigma_t": jnp.asarray(sigma_t, jnp.float32),
        "t": jnp.asarray(t_cur, jnp.float32),
        "reverse": jnp.asarray(is_reverse),
        "keep": jnp.asarray(cum_keep, jnp.float32),
        "add": jnp.asarray(cum_var, jnp.float32),
    }

    if x_T is None:
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, original.shape, jnp.float32)
    else:
        x = x_T
    mask = jnp.asarray(mask, jnp.float32)
    uc = jnp.asarray(uc_scale, jnp.float32)

    def body(x, i):
        k_i = jax.random.fold_in(key, i)
        noise = jax.random.normal(k_i, x.shape, jnp.float32)

        def reverse_step(x):
            e_t = eps_fn(x, coeffs["t"][i], uc, jnp.asarray(False))
            at = coeffs["a_t"][i]
            ap = coeffs["a_prev"][i]
            st = coeffs["sigma_t"][i]
            pred_x0 = (x - jnp.sqrt(1 - at) * e_t) / jnp.sqrt(at)
            dir_xt = jnp.sqrt(jnp.maximum(1 - ap - st**2, 0.0)) * e_t
            unknown = jnp.sqrt(ap) * pred_x0 + dir_xt + st * noise
            known = jnp.sqrt(ap) * original + jnp.sqrt(1 - ap) * noise
            return mask * known + (1.0 - mask) * unknown

        def undo_step(x):
            return coeffs["keep"][i] * x + coeffs["add"][i] * noise

        return jax.lax.cond(coeffs["reverse"][i], reverse_step, undo_step, x), None

    x, _ = jax.lax.scan(body, x, jnp.arange(len(walk)))
    return x
