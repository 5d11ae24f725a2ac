"""Log-likelihood estimation via the probability-flow ODE.

Parity target: /root/reference/cpd/samplers/log.py:18-53 ("Log" sampler):
integrate the Karras ODE from sigma_min to sigma_max while accumulating the
Hutchinson trace estimate of the divergence, then add the Gaussian prior
log-prob at sigma_max.

JAX redesign: the reference needs torchdiffeq + autograd.grad for the
vector-Jacobian trace; here the divergence is one VJP. Two integrators:

  * ``log_likelihood_adaptive`` — adaptive Dormand-Prince RK45 ("dopri5")
    in a ``lax.while_loop`` with atol/rtol step control, matching the
    reference's accuracy/cost contract (torchdiffeq ``odeint(...,
    atol=1e-4, rtol=1e-4, method='dopri5')``, log.py:30-49). This is the
    default.
  * ``log_likelihood`` — fixed-grid RK4 ``lax.scan`` on log-spaced sigmas:
    static cost, useful when a known step budget matters.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "log_likelihood",
    "log_likelihood_adaptive",
    "sample_log_likelihood",
]

# Dormand-Prince 5(4) tableau (the 'dopri5' method)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (
    5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
    -92097 / 339200, 187 / 2100, 1 / 40,
)


def log_likelihood(
    den_fn: Callable,
    x: jax.Array,
    sigma_min: float,
    sigma_max: float,
    *,
    key: jax.Array,
    steps: int = 100,
    uc_scale: float = 1.0,
):
    """Estimate log p(x) in nats per sample [B].

    den_fn(x, sigma, uc_scale) -> denoised prediction. Integrates
    d = (x - denoised)/sigma from sigma_min to sigma_max on a log-spaced
    grid with RK4, Hutchinson probe v in {-1, +1}.
    """
    b = x.shape[0]
    dim = int(np.prod(x.shape[1:]))
    v = jax.random.rademacher(key, x.shape, jnp.float32)
    uc = jnp.asarray(uc_scale, jnp.float32)

    sigmas = jnp.asarray(
        np.exp(np.linspace(math.log(max(sigma_min, 1e-3)), math.log(sigma_max), steps + 1)),
        jnp.float32,
    )

    def ode_fn(x, sigma):
        def d_of(xx):
            return (xx - den_fn(xx, sigma, uc)) / sigma

        # Hutchinson via VJP (v^T J, then dot v) — exactly the reference's
        # autograd.grad((d*v).sum(), x) form (log.py:43-45); reverse mode
        # also composes with the Pallas kernels' custom VJPs
        d, vjp_fn = jax.vjp(d_of, x)
        (vt_j,) = vjp_fn(v)
        div = jnp.sum((v * vt_j).reshape(b, -1), axis=1)
        return d, div

    def body(carry, i):
        x, ll = carry
        s0, s1 = sigmas[i], sigmas[i + 1]
        h = s1 - s0
        # RK4 on the augmented (x, ll) system
        d1, g1 = ode_fn(x, s0)
        d2, g2 = ode_fn(x + 0.5 * h * d1, s0 + 0.5 * h)
        d3, g3 = ode_fn(x + 0.5 * h * d2, s0 + 0.5 * h)
        d4, g4 = ode_fn(x + h * d3, s1)
        x = x + (h / 6.0) * (d1 + 2 * d2 + 2 * d3 + d4)
        ll = ll + (h / 6.0) * (g1 + 2 * g2 + 2 * g3 + g4)
        return (x, ll), None

    (latent, delta_ll), _ = jax.lax.scan(
        body, (x, jnp.zeros((b,), jnp.float32)), jnp.arange(steps)
    )
    # N(0, sigma_max^2) prior (log.py:50-51)
    ll_prior = jnp.sum(
        (-0.5 * (latent / sigma_max) ** 2
         - math.log(sigma_max) - 0.5 * math.log(2 * math.pi)).reshape(b, -1),
        axis=1,
    )
    return ll_prior + delta_ll


def log_likelihood_adaptive(
    den_fn: Callable,
    x: jax.Array,
    sigma_min: float,
    sigma_max: float,
    *,
    key: jax.Array,
    atol: float = 1e-4,
    rtol: float = 1e-4,
    uc_scale: float = 1.0,
    max_steps: int = 512,
):
    """Adaptive dopri5 log-likelihood (the reference's torchdiffeq contract,
    log.py:30-49: atol/rtol knobs, embedded 5(4) error control).

    Integrates the augmented (x, delta_ll) system from sigma_min to
    sigma_max in a ``lax.while_loop``: the PI-free standard controller
    h *= clip(0.9 * err^(-1/5), 0.2, 10), step rejected when the scaled
    RMS error exceeds 1 (the same rule torchdiffeq's dopri5 uses, modulo
    its safety/ifactor defaults). One step size for the whole batch, like
    the reference's single odeint call over the batched state.

    Returns (log_likelihoods [B], n_accepted_steps [int32 scalar array]).
    """
    b = x.shape[0]
    v = jax.random.rademacher(key, x.shape, jnp.float32)
    uc = jnp.asarray(uc_scale, jnp.float32)
    s_min = float(max(sigma_min, 1e-3))
    s_max = float(sigma_max)

    def ode_fn(x, ll, sigma):
        del ll  # d(ll)/dsigma depends only on x

        def d_of(xx):
            return (xx - den_fn(xx, sigma, uc)) / sigma

        d, vjp_fn = jax.vjp(d_of, x)
        (vt_j,) = vjp_fn(v)
        div = jnp.sum((v * vt_j).reshape(b, -1), axis=1)
        return d, div

    def rk_step(x, ll, sigma, h):
        kx = []
        kl = []
        for i in range(7):
            xi = x
            li = ll
            for j, a in enumerate(_DP_A[i]):
                if a != 0.0:
                    xi = xi + (h * a) * kx[j]
                    li = li + (h * a) * kl[j]
            dx, dl = ode_fn(xi, li, sigma + _DP_C[i] * h)
            kx.append(dx)
            kl.append(dl)
        x5 = x
        ll5 = ll
        ex = jnp.zeros_like(x)
        el = jnp.zeros_like(ll)
        for i in range(7):
            if _DP_B5[i] != 0.0:
                x5 = x5 + (h * _DP_B5[i]) * kx[i]
                ll5 = ll5 + (h * _DP_B5[i]) * kl[i]
            db = _DP_B5[i] - _DP_B4[i]
            if db != 0.0:
                ex = ex + (h * db) * kx[i]
                el = el + (h * db) * kl[i]
        # scaled RMS error over the augmented state (torchdiffeq's norm)
        tol_x = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))
        tol_l = atol + rtol * jnp.maximum(jnp.abs(ll), jnp.abs(ll5))
        se = jnp.sum((ex / tol_x) ** 2) + jnp.sum((el / tol_l) ** 2)
        n = float(np.prod(x.shape) + np.prod(ll.shape))
        err = jnp.sqrt(se / n)
        return x5, ll5, err

    def cond(state):
        x, ll, sigma, h, nsteps = state
        return jnp.logical_and(sigma < s_max - 1e-9, nsteps < max_steps)

    def body(state):
        x, ll, sigma, h, nsteps = state
        h_eff = jnp.minimum(h, s_max - sigma)
        x5, ll5, err = rk_step(x, ll, sigma, h_eff)
        accept = err <= 1.0
        x = jnp.where(accept, x5, x)
        ll = jnp.where(accept, ll5, ll)
        sigma = jnp.where(accept, sigma + h_eff, sigma)
        factor = jnp.clip(
            0.9 * jnp.power(jnp.maximum(err, 1e-10), -0.2), 0.2, 10.0
        )
        h = jnp.maximum(h_eff * factor, 1e-6)
        return (x, ll, sigma, h, nsteps + 1)

    h0 = jnp.asarray((s_max - s_min) / 100.0, jnp.float32)
    state = (
        x,
        jnp.zeros((b,), jnp.float32),
        jnp.asarray(s_min, jnp.float32),
        h0,
        jnp.asarray(0, jnp.int32),
    )
    latent, delta_ll, _, _, nsteps = jax.lax.while_loop(cond, body, state)
    ll_prior = jnp.sum(
        (-0.5 * (latent / s_max) ** 2
         - math.log(s_max) - 0.5 * math.log(2 * math.pi)).reshape(b, -1),
        axis=1,
    )
    return ll_prior + delta_ll, nsteps


def sample_log_likelihood(
    den, x, sigmas, uc_scales=1.0, *, key=None, noises=None, steps=None,
    atol: float = 1e-4, rtol: float = 1e-4,
):
    """Sigma-family adapter: registry entry "Log" (reference log.py:12-17
    registers the estimator as a sampler). Integrates over the given sigma
    schedule's range and returns (log_likelihoods [B], None).

    ``steps=None`` (default) uses the adaptive dopri5 integrator with the
    reference's atol/rtol contract; an explicit ``steps`` selects the
    fixed-grid RK4 with that step budget."""
    import numpy as _np

    sig = _np.asarray(sigmas, _np.float64)
    sig = sig[sig > 0]
    uc = float(_np.asarray(uc_scales).ravel()[0])
    if key is None:
        key = jax.random.PRNGKey(0)
    if steps is None:
        ll, _ = log_likelihood_adaptive(
            den, x, float(sig.min()), float(sig.max()),
            key=key, atol=atol, rtol=rtol, uc_scale=uc,
        )
    else:
        ll = log_likelihood(
            den, x, float(sig.min()), float(sig.max()),
            key=key, steps=steps, uc_scale=uc,
        )
    return ll, None
