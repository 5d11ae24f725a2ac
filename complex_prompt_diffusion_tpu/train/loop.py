"""Diffusion training losses + jit/pjit train step + EMA.

Parity targets:
  * q_sample + p_losses — /root/reference/cpd/models/ddpm.py:387-414:
    target eps (or x0 / v), l2 (or l1) loss, loss_simple weighting plus the
    lvlb elbo term with ``original_elbo_weight`` (default 0 in SD configs).
  * LitEma — /root/reference/cpd/models/ema.py:5-80 (decay with warmup
    min(decay, (1+step)/(10+step))).

The multi-chip story: ``make_train_step`` returns a pure (params, opt_state,
batch, key) step; shard it with jax.jit + NamedSharding over the ("data",
"model") mesh — batch on data, weights replicated (or model-sharded for the
tensor-parallel variant). All gradient reduction is implicit XLA psum over
ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.schedules import DiffusionTables

__all__ = ["p_losses", "make_train_step", "ema_update"]


def q_sample(tables: DiffusionTables, x0, t, noise):
    """Forward diffusion draw (ddpm.py:337-341 / discrete.py:708-711)."""
    sac = jnp.take(jnp.asarray(tables.sqrt_alphas_cumprod, jnp.float32), t)
    s1m = jnp.take(
        jnp.asarray(tables.sqrt_one_minus_alphas_cumprod, jnp.float32), t
    )
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return sac.reshape(shape) * x0 + s1m.reshape(shape) * noise


def get_v(tables: DiffusionTables, x0, noise, t):
    """v-parameterization target (ddpm.py get_v / discrete.py:681-685)."""
    sac = jnp.take(jnp.asarray(tables.sqrt_alphas_cumprod, jnp.float32), t)
    s1m = jnp.take(
        jnp.asarray(tables.sqrt_one_minus_alphas_cumprod, jnp.float32), t
    )
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return sac.reshape(shape) * noise - s1m.reshape(shape) * x0


def p_losses(
    apply_fn: Callable,
    params,
    tables: DiffusionTables,
    x0: jax.Array,
    context: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    *,
    parameterization: str = "eps",
    loss_type: str = "l2",
    elbo_weight: float = 0.0,
    l_simple_weight: float = 1.0,
):
    """DDPM training loss (ddpm.py:387-414). apply_fn(params, x_t, t, ctx)."""
    x_noisy = q_sample(tables, x0, t, noise)
    model_out = apply_fn(params, x_noisy, t, context)

    if parameterization == "eps":
        target = noise
    elif parameterization == "x0":
        target = x0
    elif parameterization == "v":
        target = get_v(tables, x0, noise, t)
    else:
        raise ValueError(parameterization)

    if loss_type == "l2":
        per = (model_out - target) ** 2
    elif loss_type == "l1":
        per = jnp.abs(model_out - target)
    else:
        raise ValueError(loss_type)
    per_sample = jnp.mean(per, axis=tuple(range(1, per.ndim)))

    loss = l_simple_weight * jnp.mean(per_sample)
    if elbo_weight:
        lvlb_w = _lvlb_weights(tables)
        loss_vlb = jnp.mean(jnp.take(lvlb_w, t) * per_sample)
        loss = loss + elbo_weight * loss_vlb
    return loss


def _lvlb_weights(tables: DiffusionTables):
    """eps-param elbo weights with the [0]=[1] patch (discrete.py:422-432)."""
    w = tables.betas**2 / (
        2
        * tables.posterior_variance
        * tables.alphas
        * (1 - tables.alphas_cumprod)
    )
    w = jnp.asarray(w, jnp.float32)
    return w.at[0].set(w[1])


def make_train_step(
    unet_cfg: M.UNetConfig,
    tables: DiffusionTables,
    optimizer: optax.GradientTransformation,
    *,
    parameterization: str = "eps",
    loss_type: str = "l2",
    elbo_weight: float = 0.0,
):
    """Build a pure train step: (params, opt_state, batch, key) ->
    (params, opt_state, loss). batch = {"latents": [B,h,w,4],
    "context": [B,77,D]}. jit/shard at the call site."""

    def apply_fn(params, x, t, ctx):
        return M.unet_apply(unet_cfg, params, x, t, ctx)

    def loss_fn(params, batch, key):
        b = batch["latents"].shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, tables.num_train_timesteps)
        noise = jax.random.normal(k_n, batch["latents"].shape, jnp.float32)
        return p_losses(
            apply_fn, params, tables, batch["latents"], batch["context"],
            t, noise,
            parameterization=parameterization,
            loss_type=loss_type,
            elbo_weight=elbo_weight,
        )

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def ema_update(ema_params, params, decay: float = 0.9999, step: Optional[int] = None):
    """EMA shadow update with warmup decay min(decay, (1+step)/(10+step))
    (ema.py:29-48)."""
    if step is not None:
        decay = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(
        lambda e, p: e * decay + (1.0 - decay) * p, ema_params, params
    )
