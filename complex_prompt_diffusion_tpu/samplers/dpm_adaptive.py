"""DPM Adaptive: PID-controlled adaptive-step DPM-Solver.

Parity target: /root/reference/cpd/samplers/dpm.py:109-201 ("DPM Adaptive"):
embedded order-(2,3) or (1,2) solver pairs in t = -log(sigma) space, local
error against atol/rtol, PID step-size controller with the atan limiter
(dpm.py:175-201). Data-dependent control flow runs as a single
``lax.while_loop`` with a static max-iteration bound.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_dpm_adaptive"]


class _State(NamedTuple):
    x: jax.Array
    x_prev: jax.Array
    s: jax.Array  # current t
    h: jax.Array  # proposed step size
    err1: jax.Array  # inverse-error history (newest first)
    err2: jax.Array
    err3: jax.Array
    nfe: jax.Array
    steps: jax.Array


def sample_dpm_adaptive(
    den: Callable,
    x: jax.Array,
    sigmas: np.ndarray,
    uc_scales=1.0,
    *,
    key=None,
    noises=None,
    order: int = 3,
    rtol: float = 0.05,
    atol: float = 0.0078,
    h_init: float = 0.05,
    pcoeff: float = 0.0,
    icoeff: float = 1.0,
    dcoeff: float = 0.0,
    accept_safety: float = 0.81,
    max_iters: int = 200,
):
    """den(x, sigma, uc_scale) -> denoised. sigmas: descending schedule; the
    integration runs t in [-log sigmas[0], -log sigmas[-2]] (dpm.py:127-129)."""
    sigmas = np.asarray(sigmas, np.float64)
    t_start = -math.log(sigmas[0])
    t_end = -math.log(sigmas[-2])
    uc = jnp.asarray(np.broadcast_to(np.asarray(uc_scales), ()).item()
                     if np.ndim(uc_scales) == 0 else np.asarray(uc_scales).ravel()[0],
                     jnp.float32)

    b1 = (pcoeff + icoeff + dcoeff) / order
    b2 = -(pcoeff + 2 * dcoeff) / order
    b3 = dcoeff / order

    sig_of = lambda t: jnp.exp(-t)  # noqa: E731

    def eps_of(x, t):
        sigma = sig_of(t)
        return (x - den(x, sigma, uc)) / sigma

    def solver_1(x, t, t_next, eps):
        h = t_next - t
        return x - sig_of(t_next) * jnp.expm1(h) * eps

    def solver_2(x, t, t_next, eps, r1=0.5):
        h = t_next - t
        s1 = t + r1 * h
        u1 = x - sig_of(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = eps_of(u1, s1)
        return (
            x
            - sig_of(t_next) * jnp.expm1(h) * eps
            - sig_of(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps)
        ), eps_r1

    def solver_3(x, t, t_next, eps):
        h = t_next - t
        r1, r2 = 1 / 3, 2 / 3
        s1, s2 = t + r1 * h, t + r2 * h
        u1 = x - sig_of(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = eps_of(u1, s1)
        u2 = (
            x
            - sig_of(s2) * jnp.expm1(r2 * h) * eps
            - sig_of(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1)
            * (eps_r1 - eps)
        )
        eps_r2 = eps_of(u2, s2)
        return (
            x
            - sig_of(t_next) * jnp.expm1(h) * eps
            - sig_of(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps)
        )

    def cond(st: _State):
        return jnp.logical_and(st.s < t_end - 1e-5, st.steps < max_iters)

    def body(st: _State):
        t_next = jnp.minimum(t_end, st.s + st.h)
        eps = eps_of(st.x, st.s)
        if order == 2:
            x_low = solver_1(st.x, st.s, t_next, eps)
            x_high, _ = solver_2(st.x, st.s, t_next, eps)
        else:
            x_low, _ = solver_2(st.x, st.s, t_next, eps, r1=1 / 3)
            x_high = solver_3(st.x, st.s, t_next, eps)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(st.x_prev)))
        error = jnp.linalg.norm(((x_low - x_high) / delta).ravel()) * (
            x_low.size ** -0.5
        )
        inv_err = 1.0 / (error + 1e-8)
        # first iteration: seed history (dpm.py:192-193)
        first = st.steps == 0
        e1 = inv_err
        e2 = jnp.where(first, inv_err, st.err2)
        e3 = jnp.where(first, inv_err, st.err3)
        factor = e1**b1 * e2**b2 * e3**b3
        factor = 1.0 + jnp.arctan(factor - 1.0)  # limiter (dpm.py:187-188)
        accept = factor >= accept_safety

        x = jnp.where(accept, x_high, st.x)
        x_prev = jnp.where(accept, x_low, st.x_prev)
        s = jnp.where(accept, t_next, st.s)
        err2 = jnp.where(accept, e1, e2)
        err3 = jnp.where(accept, e2, e3)
        return _State(
            x=x, x_prev=x_prev, s=s, h=st.h * factor,
            err1=e1, err2=err2, err3=err3,
            nfe=st.nfe + order, steps=st.steps + 1,
        )

    init = _State(
        x=x, x_prev=x,
        s=jnp.asarray(t_start, jnp.float32),
        h=jnp.asarray(h_init, jnp.float32),
        err1=jnp.asarray(1.0), err2=jnp.asarray(1.0), err3=jnp.asarray(1.0),
        nfe=jnp.asarray(0), steps=jnp.asarray(0),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.x, {"nfe": final.nfe, "steps": final.steps}
