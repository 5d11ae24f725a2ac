"""iPNDM — improved pseudo numerical methods (trig schedule + Adams-Bashforth).

Parity target: /root/reference/cpd/scheduler/ipndms.py (IPNDMScheduler,
crowsonkb v-diffusion style). The reference ships the scheduler but never
registers it with a sampler; here it is a first-class sampler.

Schedule (ipndms.py:25-30): on a unit grid t_i = linspace(1, 0, steps+1),
    beta_i  = sin(t_i * pi/2)^2
    alpha_i = (1 - beta_i^2)^(1/2)
(note the reference's quirk: alpha = sqrt(1 - sin^4), NOT cos — reproduced).

Step i (ipndms.py:63-90): the model output is blended into the multistep
buffer as ``ets = x*beta_i + e_t*alpha_i``, combined with Adams-Bashforth
coefficients of increasing order (1 / 2 / 3 / 4-step), then
    pred = (x - beta_i * ets_ab) / alpha_i
    x    = alpha_{i+1} * pred + beta_{i+1} * ets_ab

The reference's ``undo_step`` (ipndms.py:93-115) is broken as shipped
(calls ``_get_next_sample`` with a missing argument and the helper has no
return statement); it is deliberately not reproduced.

JAX redesign: fixed-size (4,) ets ring buffer carried through ``lax.scan``
with ``lax.switch`` on the effective order — no Python-side list growth, so
the whole sampler jits as one program.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ipndm_schedule", "sample_ipndm"]


def ipndm_schedule(steps: int):
    """(beta, alpha) arrays of length steps+1 on the unit grid (:25-28)."""
    t = np.linspace(1.0, 0.0, steps + 1)
    beta = np.sin(t * math.pi / 2) ** 2
    alpha = np.sqrt(1.0 - beta**2)
    return beta.astype(np.float32), alpha.astype(np.float32)


def _ab_combine(ets, n_seen):
    """Adams-Bashforth blend of the last 1-4 buffer entries (:67-74).

    ets: (4, ...) ring-ordered so index 0 is the newest entry.
    """
    e0, e1, e2, e3 = ets[0], ets[1], ets[2], ets[3]
    branches = [
        lambda: e0,
        lambda: (3 * e0 - e1) / 2,
        lambda: (23 * e0 - 16 * e1 + 5 * e2) / 12,
        lambda: (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24,
    ]
    return jax.lax.switch(jnp.minimum(n_seen, 3), branches)


def sample_ipndm(
    eps_fn: Callable,
    x: jax.Array,
    steps: int,
    uc_scales=None,
    *,
    num_train_timesteps: int = 1000,
):
    """Run the iPNDM loop. ``eps_fn(x, t, uc_scale)`` is the standard t-space
    denoiser (t scaled into [0, num_train_timesteps) via the trig timestep
    map atan2(beta, alpha)/pi*2, ipndms.py:29-30).
    """
    beta, alpha = ipndm_schedule(steps)
    t_unit = np.arctan2(beta, alpha) / math.pi * 2.0  # (:29)
    if uc_scales is None:
        uc_scales = np.ones(steps, np.float32)
    uc = jnp.broadcast_to(jnp.asarray(uc_scales, jnp.float32), (steps,))
    beta_j = jnp.asarray(beta)
    alpha_j = jnp.asarray(alpha)
    t_j = jnp.asarray(t_unit * num_train_timesteps, jnp.float32)

    def body(carry, i):
        x, ets = carry
        e_t = eps_fn(x, jnp.broadcast_to(t_j[i], (x.shape[0],)), uc[i])
        new = x * beta_j[i] + e_t * alpha_j[i]  # (:63)
        ets = jnp.concatenate([new[None], ets[:3]], axis=0)
        ets_ab = _ab_combine(ets, i)
        pred = (x - beta_j[i] * ets_ab) / jnp.maximum(alpha_j[i], 1e-8)  # (:86)
        x = alpha_j[i + 1] * pred + ets_ab * beta_j[i + 1]  # (:87)
        return (x, ets), None

    ets0 = jnp.zeros((4,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(body, (x, ets0), jnp.arange(steps))
    return x, None
