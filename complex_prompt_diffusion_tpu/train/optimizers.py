"""Adan optimizer as an optax GradientTransformation.

Parity target: /root/reference/cpd/train/optimizers.py:6-138 (the torch Adan
variant; Xie et al., arXiv:2208.06677). Same update:
  m_t = b1 m + (1-b1) g
  d_t = b2 d + (1-b2) (g - g_prev)
  n_t = b3 n + (1-b3) (g + b2 (g - g_prev))^2
  update = (m_t/bc1 + b2 d_t/bc2) / (sqrt(n_t/bc3) + eps)
  no_prox=False: p = (p - lr*update) / (1 + lr*wd)
  no_prox=True:  p = p*(1 - lr*wd) - lr*update
Optional global grad-norm clipping (max_grad_norm).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["adan"]


class AdanState(NamedTuple):
    count: chex.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    exp_avg_diff: optax.Updates
    pre_grad: optax.Updates


def adan(
    learning_rate=1e-3,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    no_prox: bool = False,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return AdanState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros(),
            exp_avg_sq=zeros(),
            exp_avg_diff=zeros(),
            pre_grad=zeros(),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adan requires params for the decoupled decay")
        count = state.count + 1

        if max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            clip = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
            grads = jax.tree.map(lambda g: g * clip, grads)

        # first step: pre_grad := grad (reference optimizers.py:115-116)
        pre_grad = jax.tree.map(
            lambda pg, g: jnp.where(count == 1, g, pg), state.pre_grad, grads
        )
        diff = jax.tree.map(lambda g, pg: g - pg, grads, pre_grad)
        upd = jax.tree.map(lambda g, d: g + b2 * d, grads, diff)

        exp_avg = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads
        )
        exp_avg_diff = jax.tree.map(
            lambda d_, d: b2 * d_ + (1 - b2) * d, state.exp_avg_diff, diff
        )
        exp_avg_sq = jax.tree.map(
            lambda n, u: b3 * n + (1 - b3) * u * u, state.exp_avg_sq, upd
        )

        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)
        bc3 = 1.0 - b3**count.astype(jnp.float32)

        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def step(p, m, d_, n):
            denom = jnp.sqrt(n / bc3) + eps
            u = (m / bc1 + b2 * d_ / bc2) / denom
            if no_prox:
                new_p = p * (1 - lr * weight_decay) - lr * u
            else:
                new_p = (p - lr * u) / (1 + lr * weight_decay)
            return new_p - p  # return the delta (optax convention)

        updates = jax.tree.map(step, params, exp_avg, exp_avg_diff, exp_avg_sq)
        new_state = AdanState(
            count=count,
            exp_avg=exp_avg,
            exp_avg_sq=exp_avg_sq,
            exp_avg_diff=exp_avg_diff,
            pre_grad=grads,
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
