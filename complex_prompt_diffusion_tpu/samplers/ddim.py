"""DDIM / PLMS sampling as jit-compiled scans (t-space family).

Parity targets:
  * step math — DiscreteScheduler.step (/root/reference/cpd/scheduler/
    discrete.py:534-605): pred_x0, optional thresholding with eps
    re-derivation, dir_xt, eta-noise.
  * loop — DDIMSampler._sampling (/root/reference/cpd/samplers/ddim.py:
    111-170): iterate reversed timesteps, index = S-1-i.
  * PLMS — PLMSSampler (/root/reference/cpd/samplers/plms.py:18-85):
    Adams-Bashforth orders 1-4 over an eps ring buffer; first step is a
    pseudo improved Euler with a second model call at t_next.
  * deterministic encode (DDIM inversion) — ddim.py:627-663.

RNG contract: per-step noise is either injected (``noises`` [S, ...] array —
the bit-parity mode, since torch and JAX PRNGs differ; SURVEY.md §6) or drawn
from ``jax.random.fold_in(key, step)``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from complex_prompt_diffusion_tpu.guidance.threshold import get_thresholder
from complex_prompt_diffusion_tpu.schedules import InferenceTables

__all__ = ["ddim_step", "sample_ddim", "sample_plms", "ddim_encode"]


def _prepare(itables: InferenceTables):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), itables)


def _noise_source(key, noises, shape, steps):
    """Return noise_at(i): injected array lookup or fold_in PRNG draw."""
    if noises is not None:
        noises = jnp.asarray(noises)

        def noise_at(i):
            return noises[i]

    elif key is not None:

        def noise_at(i):
            return jax.random.normal(jax.random.fold_in(key, i), shape)

    else:

        def noise_at(i):
            return jnp.zeros(shape)

    return noise_at


def ddim_step(
    x: jax.Array,
    e_t: jax.Array,
    idx: jax.Array,
    it: InferenceTables,
    noise: jax.Array,
    *,
    temperature: float = 1.0,
    clip_sample: Optional[str] = None,
    clip_sample_thresh: float = 90.0,
):
    """One reverse step x_t -> x_{t-1} (DDIM eq. 12; discrete.py:534-605).

    ``idx`` indexes the inference tables (S-1 = most noisy). Returns
    (x_prev, pred_x0). With eta=0 tables the noise term vanishes.
    """
    a_t = jnp.take(it.alphas_cumprod_t, idx)
    a_prev = jnp.take(it.alphas_cumprod_prev_t, idx)
    sqrt_1m_at = jnp.take(it.sqrt_one_minus_alphas_cumprod_t, idx)
    sigma_t = jnp.take(it.sigmas_t, idx)

    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    if clip_sample:
        pred_x0 = get_thresholder(clip_sample)(pred_x0, clip_sample_thresh)
        # Glide-style: re-derive eps from the clipped x0 (discrete.py:582-584)
        e_t = (x - jnp.sqrt(a_t) * pred_x0) / sqrt_1m_at

    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise * temperature
    return x_prev, pred_x0


def sample_ddim(
    eps_fn: Callable,
    x_T: jax.Array,
    itables: InferenceTables,
    uc_scales: jax.Array,
    *,
    key: Optional[jax.Array] = None,
    noises: Optional[jax.Array] = None,
    uc_blur_flags: Optional[jax.Array] = None,
    temperature: float = 1.0,
    clip_sample: Optional[str] = None,
    clip_sample_thresh: float = 90.0,
    t_start: Optional[int] = None,
    unroll: int = 1,
    eps_state=None,
):
    """Full reverse chain as one scan.

    eps_fn(x, t, uc_scale, uc_blur_on) -> eps  (see guidance.make_denoiser).
    ``t_start``: run only the first ``t_start`` timesteps of the table
    (img2img decode path, ddim.py:95-104 / :684-737). Static.
    ``unroll``: lax.scan unroll factor (trades compile time/code size for
    per-iteration loop overhead; the default keeps the compile fast).
    ``eps_state``: optional pytree carried across steps through the eps
    evaluation (the DeepCache feature cache). When given, the protocol
    becomes eps_fn(x, t, uc_scale, uc_blur_on, i, state) -> (eps, state)
    with ``i`` the 0-based loop iteration.

    Returns (x_0, pred_x0_trajectory [S_run, ...]).
    """
    it = _prepare(itables)
    s_total = int(itables.num_steps)
    s_run = s_total if t_start is None else int(t_start)
    uc_scales = jnp.asarray(uc_scales, jnp.float32)
    if uc_blur_flags is None:
        uc_blur_flags = jnp.zeros(s_total, bool)
    noise_at = _noise_source(key, noises, x_T.shape, s_run)
    stateful = eps_state is not None

    def body(carry, i):
        x = carry[0] if stateful else carry
        idx = s_run - 1 - i  # descending table index (reference's `index`)
        t = jnp.take(it.timesteps, idx)
        if stateful:
            e_t, st = eps_fn(x, t, uc_scales[i], uc_blur_flags[i], i, carry[1])
        else:
            e_t = eps_fn(x, t, uc_scales[i], uc_blur_flags[i])
        x_prev, pred_x0 = ddim_step(
            x, e_t, idx, it, noise_at(i),
            temperature=temperature,
            clip_sample=clip_sample,
            clip_sample_thresh=clip_sample_thresh,
        )
        return ((x_prev, st) if stateful else x_prev), pred_x0

    init = (x_T, eps_state) if stateful else x_T
    carry, traj = jax.lax.scan(body, init, jnp.arange(s_run), unroll=unroll)
    x0 = carry[0] if stateful else carry
    return x0, traj


def _plms_combine(e_t, old_eps, n_old):
    """Adams-Bashforth blend for orders 2-4 (plms.py:33-41). old_eps is a
    ring [3, ...] with old_eps[0] = most recent."""
    e2 = (3 * e_t - old_eps[0]) / 2
    e3 = (23 * e_t - 16 * old_eps[0] + 5 * old_eps[1]) / 12
    e4 = (55 * e_t - 59 * old_eps[0] + 37 * old_eps[1] - 9 * old_eps[2]) / 24
    return jax.lax.switch(
        jnp.clip(n_old - 1, 0, 2), [lambda: e2, lambda: e3, lambda: e4]
    )


def sample_plms(
    eps_fn: Callable,
    x_T: jax.Array,
    itables: InferenceTables,
    uc_scales: jax.Array,
    *,
    key: Optional[jax.Array] = None,
    noises: Optional[jax.Array] = None,
    uc_blur_flags: Optional[jax.Array] = None,
    temperature: float = 1.0,
    clip_sample: Optional[str] = None,
    clip_sample_thresh: float = 90.0,
    eps_state=None,
):
    """PLMS (PNDM) sampling. First step: pseudo improved Euler with a second
    eps eval at t_next; later steps: Adams-Bashforth over the eps history
    (plms.py:27-41). Step formula is the same DDIM update (the reference's
    PLMS wrapper drives p_sample_reverse with eta=0 tables).

    ``eps_state``: optional pytree carried through the eps evaluations (the
    DeepCache feature cache — same protocol as :func:`sample_ddim`). The
    first step's second eval (at t_next) threads the state too.
    """
    it = _prepare(itables)
    s = int(itables.num_steps)
    uc_scales = jnp.asarray(uc_scales, jnp.float32)
    if uc_blur_flags is None:
        uc_blur_flags = jnp.zeros(s, bool)
    noise_at = _noise_source(key, noises, x_T.shape, s)
    stateful = eps_state is not None

    step = partial(
        ddim_step,
        temperature=temperature,
        clip_sample=clip_sample,
        clip_sample_thresh=clip_sample_thresh,
    )

    def body(carry, i):
        if stateful:
            x, old_eps, n_old, st = carry
        else:
            x, old_eps, n_old = carry
            st = None
        idx = s - 1 - i
        t = jnp.take(it.timesteps, idx)
        t_next_idx = jnp.maximum(idx - 1, 0)
        t_next = jnp.take(it.timesteps, t_next_idx)
        if stateful:
            e_t, st = eps_fn(x, t, uc_scales[i], uc_blur_flags[i], i, st)
        else:
            e_t = eps_fn(x, t, uc_scales[i], uc_blur_flags[i])

        def first_step(st_):
            # pseudo improved Euler: step with e_t, re-evaluate at t_next
            x_prev_1, _ = step(x, e_t, idx, it, noise_at(i))
            if stateful:
                e_t_next, st_ = eps_fn(
                    x_prev_1, t_next, uc_scales[i], uc_blur_flags[i], i, st_
                )
            else:
                e_t_next = eps_fn(
                    x_prev_1, t_next, uc_scales[i], uc_blur_flags[i]
                )
            return (e_t + e_t_next) / 2, st_

        def multistep(st_):
            return _plms_combine(e_t, old_eps, n_old), st_

        e_t_prime, st = jax.lax.cond(n_old == 0, first_step, multistep, st)
        x_prev, pred_x0 = step(x, e_t_prime, idx, it, noise_at(i))

        new_old = jnp.roll(old_eps, 1, axis=0).at[0].set(e_t)
        n_new = jnp.minimum(n_old + 1, 3)
        new_carry = (
            (x_prev, new_old, n_new, st)
            if stateful
            else (x_prev, new_old, n_new)
        )
        return new_carry, pred_x0

    old_eps0 = jnp.zeros((3,) + x_T.shape, x_T.dtype)
    init = (x_T, old_eps0, jnp.asarray(0))
    if stateful:
        init = init + (eps_state,)
    carry, traj = jax.lax.scan(body, init, jnp.arange(s))
    return carry[0], traj


def ddim_encode(
    eps_fn: Callable,
    x0: jax.Array,
    itables: InferenceTables,
    t_enc: int,
    uc_scales: jax.Array,
):
    """Deterministic DDIM inversion, image -> noise (ddim.py:627-663 /
    _get_x_next_and_pred_xt ddim.py:614-625). Runs ``t_enc`` forward steps."""
    it = _prepare(itables)
    uc_scales = jnp.asarray(uc_scales, jnp.float32)

    def body(x_next, i):
        t = jnp.take(it.timesteps, i)
        e_t = eps_fn(x_next, t, uc_scales[i], jnp.asarray(False))
        ac_next = jnp.take(it.alphas_cumprod_t, i)
        ac = jnp.take(it.alphas_cumprod_prev_t, i)
        xt_weighted = jnp.sqrt(ac_next / ac) * x_next
        weighted_eps = (
            jnp.sqrt(ac_next)
            * (jnp.sqrt(1 / ac_next - 1) - jnp.sqrt(1 / ac - 1))
            * e_t
        )
        return xt_weighted + weighted_eps, None

    x_next, _ = jax.lax.scan(body, x0, jnp.arange(int(t_enc)))
    return x_next
