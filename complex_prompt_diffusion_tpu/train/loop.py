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

import contextlib
import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.schedules import DiffusionTables

__all__ = ["p_losses", "make_train_step", "ema_update", "LitEma", "ema_scope"]


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


@dataclasses.dataclass(frozen=True)
class LitEma:
    """Functional LitEma (ema.py:5-80): shadow weights + warmup decay +
    the store/copy_to/restore validation-swap scope.

    The reference mutates module parameters in place; here every method
    returns a new ``LitEma`` (and ``copy_to`` returns the weights to
    evaluate with), so the swap is explicit pytree plumbing instead of
    hidden state. ``num_updates`` drives the reference's warmup decay
    min(decay, (1+n)/(10+n)) and is disabled the same way
    (use_num_updates=False -> fixed decay)."""

    shadow: Any
    decay: float = 0.9999
    num_updates: int = 0
    use_num_updates: bool = True
    stored: Any = None

    @staticmethod
    def create(params, decay: float = 0.9999, use_num_updates: bool = True):
        """ema.py:13-27 — shadow starts as a copy of the online weights."""
        return LitEma(
            shadow=jax.tree.map(jnp.asarray, params),
            decay=decay,
            use_num_updates=use_num_updates,
        )

    def update(self, params) -> "LitEma":
        """ema.py:29-48 (forward/__call__): one shadow decay step."""
        n = self.num_updates + 1 if self.use_num_updates else self.num_updates
        step = n if self.use_num_updates else None
        return dataclasses.replace(
            self,
            shadow=ema_update(self.shadow, params, self.decay, step=step),
            num_updates=n,
        )

    def store(self, params) -> "LitEma":
        """ema.py:50-57: remember the online weights before a swap-in."""
        return dataclasses.replace(self, stored=params)

    def copy_to(self):
        """ema.py:59-68: the weights to run validation with."""
        return self.shadow

    def restore(self):
        """ema.py:70-80: the online weights remembered by ``store``."""
        if self.stored is None:
            raise ValueError("LitEma.restore called without a prior store")
        return self.stored


@contextlib.contextmanager
def ema_scope(params, ema: Optional[LitEma], enabled: bool = True):
    """The reference's ``ema_scope`` (ddpm.py use sites): within the block,
    evaluate with EMA weights; the caller's own ``params`` binding is its
    restore. Yields the weights to use (EMA shadow when enabled and
    available, the online weights otherwise)."""
    if enabled and ema is not None:
        yield ema.copy_to()
    else:
        yield params
