"""The k-diffusion (Karras) sampler family as jit-compiled scans.

Parity targets (all under /root/reference/cpd/samplers/):
  * Euler / Euler Ancestral — euler.py:13-111 (Karras alg. 2 + churn)
  * Heun — huen.py:11-57
  * DPM2 / DPM2 Ancestral — dpm2.py:10-113 (rho=3 midpoint)
  * DPM++ 2M / DPM++ 2S Ancestral — dpmpp.py:12-132
  * LMS — lms.py:13-62 (integrated Lagrange coefficients via scipy)
  * DPM Fast — dpm.py:57-106 (order-3 grouped solver steps)

Contract: ``den(x, sigma, uc_scale) -> denoised x0-prediction`` (the
reference Denoiser.forward, extension/denoiser.py:528-542); the ODE
derivative is d = (x - denoised) / sigma (euler.py:104-106).

Sigma schedules are host-side numpy (descending, terminal 0 appended);
per-step churn gammas and LMS coefficients are precomputed host-side, so the
scan bodies contain only model calls and arithmetic.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sample_euler",
    "sample_euler_ancestral",
    "sample_heun",
    "sample_dpm2",
    "sample_dpm2_ancestral",
    "sample_dpmpp_2m",
    "sample_dpmpp_2s_ancestral",
    "sample_lms",
    "sample_dpm_fast",
    "get_ancestral_step",
]


def _to_d(x, sigma, denoised):
    """Karras ODE derivative (euler.py:104-106)."""
    return (x - denoised) / sigma


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """(sigma_down, sigma_up) for an ancestral step (euler.py:97-101;
    dpmpp.py:117-124 adds the eta/min clamp)."""
    if not eta:
        return sigma_to, np.zeros_like(sigma_to)
    sigma_up = np.minimum(
        sigma_to,
        eta
        * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


def _churn_gammas(sigmas: np.ndarray, s_churn, s_tmin, s_tmax) -> np.ndarray:
    """Per-step churn gamma (euler.py:42: gamma = min(churn/(n-1), sqrt2-1)
    when tmin <= sigma <= tmax)."""
    n = len(sigmas) - 1
    g = np.where(
        (sigmas[:-1] >= s_tmin) & (sigmas[:-1] <= s_tmax),
        min(s_churn / n, 2**0.5 - 1) if n > 0 else 0.0,
        0.0,
    )
    return g.astype(np.float64)


def _noise_source(key, noises, shape):
    if noises is not None:
        noises = jnp.asarray(noises)
        return lambda i, tag=0: noises[i]
    if key is not None:
        return lambda i, tag=0: jax.random.normal(
            jax.random.fold_in(jax.random.fold_in(key, tag), i), shape
        )
    return lambda i, tag=0: jnp.zeros(shape)


def _scan(body, x, n):
    x_final, traj = jax.lax.scan(body, x, jnp.arange(n))
    return x_final, traj


def _den2(den: Callable, stateful: bool) -> Callable:
    """Normalize the denoiser to the stateful protocol
    ``den(x, sigma, uc_scale, i, state) -> (denoised, state')``.

    ``state`` is an optional pytree threaded through the sampling scan (the
    DeepCache deep-feature cache — same protocol as ddim.sample_ddim /
    sample_plms). A stateless ``den(x, sigma, uc_scale)`` is wrapped so the
    scan bodies can carry the state slot uniformly; a ``None`` state is an
    empty pytree and costs nothing in the carry.
    """
    if stateful:
        return den
    return lambda x, sigma, uc, i, st: (den(x, sigma, uc), None)


def _uc(uc_scales, n):
    return jnp.asarray(
        np.broadcast_to(np.asarray(uc_scales, np.float64), (n,)), jnp.float32
    )


def sample_euler(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None,
    s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = math.inf,
    s_noise: float = 1.0, den_state=None,
):
    """Karras Algorithm 2, Euler steps + churn (euler.py:24-57)."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    gammas = jnp.asarray(_churn_gammas(sigmas, s_churn, s_tmin, s_tmax), jnp.float32)
    ucs = _uc(uc_scales, n)
    noise_at = _noise_source(key, noises, x.shape)
    den2 = _den2(den, den_state is not None)

    def body(carry, i):
        x, st = carry
        gamma = gammas[i]
        sigma_hat = sig[i] * (gamma + 1)
        churn = noise_at(i, 1) * s_noise * jnp.sqrt(
            jnp.maximum(sigma_hat**2 - sig[i] ** 2, 0.0)
        )
        x = jnp.where(gamma > 0, x + churn, x)
        denoised, st = den2(x, sigma_hat, ucs[i], i, st)
        d = _to_d(x, sigma_hat, denoised)
        x = x + d * (sig[i + 1] - sigma_hat)
        return (x, st), denoised

    (x_final, _), traj = jax.lax.scan(body, (x, den_state), jnp.arange(n))
    return x_final, traj


def sample_euler_ancestral(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None, eta: float = 1.0, temperature: float = 1.0,
    den_state=None,
):
    """Euler ancestral (euler.py:74-95)."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    down, up = get_ancestral_step(sigmas[:-1], sigmas[1:], eta)
    down = jnp.asarray(down, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    ucs = _uc(uc_scales, n)
    noise_at = _noise_source(key, noises, x.shape)
    den2 = _den2(den, den_state is not None)

    def body(carry, i):
        x, st = carry
        denoised, st = den2(x, sig[i], ucs[i], i, st)
        d = _to_d(x, sig[i], denoised)
        x = x + d * (down[i] - sig[i])
        x = x + noise_at(i) * up[i] * temperature
        return (x, st), denoised

    (x_final, _), traj = jax.lax.scan(body, (x, den_state), jnp.arange(n))
    return x_final, traj


def sample_heun(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None,
    s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = math.inf,
    s_noise: float = 1.0, den_state=None,
):
    """Heun 2nd-order (huen.py:24-57); falls back to Euler on the last step."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    gammas = jnp.asarray(_churn_gammas(sigmas, s_churn, s_tmin, s_tmax), jnp.float32)
    ucs = _uc(uc_scales, n)
    noise_at = _noise_source(key, noises, x.shape)
    den2 = _den2(den, den_state is not None)

    def body(carry, i):
        x, st = carry
        gamma = gammas[i]
        sigma_hat = sig[i] * (gamma + 1)
        churn = noise_at(i, 1) * s_noise * jnp.sqrt(
            jnp.maximum(sigma_hat**2 - sig[i] ** 2, 0.0)
        )
        x = jnp.where(gamma > 0, x + churn, x)
        denoised, st = den2(x, sigma_hat, ucs[i], i, st)
        d = _to_d(x, sigma_hat, denoised)
        dt = sig[i + 1] - sigma_hat

        def euler(st_):
            return x + d * dt, st_

        def heun(st_):
            x_2 = x + d * dt
            denoised_2, st_ = den2(x_2, sig[i + 1], ucs[i], i, st_)
            d_2 = _to_d(x_2, sig[i + 1], denoised_2)
            return x + (d + d_2) / 2 * dt, st_

        x, st = jax.lax.cond(sig[i + 1] == 0, euler, heun, st)
        return (x, st), denoised

    (x_final, _), traj = jax.lax.scan(body, (x, den_state), jnp.arange(n))
    return x_final, traj


def sample_dpm2(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None,
    s_churn: float = 0.0, s_tmin: float = 0.0, s_tmax: float = math.inf,
    s_noise: float = 1.0, den_state=None,
):
    """DPM-Solver-2 midpoint with rho=3 midpoint selection (dpm2.py:22-53).

    Like the reference, the midpoint formula is used on every step; the
    terminal sigma=0 makes the last midpoint sigma_mid = (sigma_hat^(1/3)/2)^3.
    """
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    gammas = jnp.asarray(_churn_gammas(sigmas, s_churn, s_tmin, s_tmax), jnp.float32)
    ucs = _uc(uc_scales, n)
    noise_at = _noise_source(key, noises, x.shape)
    den2 = _den2(den, den_state is not None)

    def body(carry, i):
        x, st = carry
        gamma = gammas[i]
        sigma_hat = sig[i] * (gamma + 1)
        churn = noise_at(i, 1) * s_noise * jnp.sqrt(
            jnp.maximum(sigma_hat**2 - sig[i] ** 2, 0.0)
        )
        x = jnp.where(gamma > 0, x + churn, x)
        denoised, st = den2(x, sigma_hat, ucs[i], i, st)
        d = _to_d(x, sigma_hat, denoised)
        sigma_mid = ((sigma_hat ** (1 / 3) + sig[i + 1] ** (1 / 3)) / 2) ** 3
        dt_1 = sigma_mid - sigma_hat
        dt_2 = sig[i + 1] - sigma_hat
        x_2 = x + d * dt_1
        denoised_2, st = den2(x_2, sigma_mid, ucs[i], i, st)
        d_2 = _to_d(x_2, sigma_mid, denoised_2)
        x = x + d_2 * dt_2
        return (x, st), denoised

    (x_final, _), traj = jax.lax.scan(body, (x, den_state), jnp.arange(n))
    return x_final, traj


def sample_dpm2_ancestral(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None, eta: float = 1.0, den_state=None,
):
    """DPM2 ancestral (dpm2.py:66-92)."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    down_np, up_np = get_ancestral_step(sigmas[:-1], sigmas[1:], eta)
    down = jnp.asarray(down_np, jnp.float32)
    up = jnp.asarray(up_np, jnp.float32)
    ucs = _uc(uc_scales, n)
    noise_at = _noise_source(key, noises, x.shape)
    den2 = _den2(den, den_state is not None)

    def body(carry, i):
        x, st = carry
        denoised, st = den2(x, sig[i], ucs[i], i, st)
        d = _to_d(x, sig[i], denoised)
        sigma_mid = ((sig[i] ** (1 / 3) + down[i] ** (1 / 3)) / 2) ** 3
        dt_1 = sigma_mid - sig[i]
        dt_2 = down[i] - sig[i]
        x_2 = x + d * dt_1
        denoised_2, st = den2(x_2, sigma_mid, ucs[i], i, st)
        d_2 = _to_d(x_2, sigma_mid, denoised_2)
        x = x + d_2 * dt_2
        x = x + noise_at(i) * up[i]
        return (x, st), denoised

    (x_final, _), traj = jax.lax.scan(body, (x, den_state), jnp.arange(n))
    return x_final, traj


def sample_dpmpp_2m(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None, den_state=None,
):
    """DPM-Solver++(2M) multistep in t = -log(sigma) space (dpmpp.py:22-57)."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    ucs = _uc(uc_scales, n)
    den2 = _den2(den, den_state is not None)

    t_of = lambda s: -jnp.log(s)  # noqa: E731
    sig_of = lambda t: jnp.exp(-t)  # noqa: E731

    def body(carry, i):
        x, old_denoised, st = carry
        denoised, st = den2(x, sig[i], ucs[i], i, st)
        t, t_next = t_of(sig[i]), t_of(sig[i + 1])
        h = t_next - t
        x_first = (sig_of(t_next) / sig_of(t)) * x - jnp.expm1(-h) * denoised

        # multistep correction (guard i=0 divisions; selected away by where)
        h_last = t - t_of(sig[jnp.maximum(i - 1, 0)])
        r = h_last / jnp.where(h == 0, 1.0, h)
        r_safe = jnp.where(r == 0, 1.0, r)
        denoised_d = (1 + 1 / (2 * r_safe)) * denoised - (
            1 / (2 * r_safe)
        ) * old_denoised
        x_multi = (sig_of(t_next) / sig_of(t)) * x - jnp.expm1(-h) * denoised_d

        use_first = jnp.logical_or(i == 0, sig[i + 1] == 0)
        x = jnp.where(use_first, x_first, x_multi)
        return (x, denoised, st), denoised

    (x_final, _, _), traj = jax.lax.scan(
        body, (x, jnp.zeros_like(x), den_state), jnp.arange(n)
    )
    return x_final, traj


def sample_dpmpp_2s_ancestral(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None, eta: float = 1.0, temperature: float = 1.0,
    den_state=None,
):
    """DPM-Solver++(2S) ancestral (dpmpp.py:71-113)."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    down_np, up_np = get_ancestral_step(sigmas[:-1], sigmas[1:], eta)
    down = jnp.asarray(down_np, jnp.float32)
    up = jnp.asarray(up_np, jnp.float32)
    ucs = _uc(uc_scales, n)
    noise_at = _noise_source(key, noises, x.shape)
    den2 = _den2(den, den_state is not None)

    t_of = lambda s: -jnp.log(s)  # noqa: E731
    sig_of = lambda t: jnp.exp(-t)  # noqa: E731

    def body(carry, i):
        x, st = carry
        denoised, st = den2(x, sig[i], ucs[i], i, st)

        def euler(st_):
            d = _to_d(x, sig[i], denoised)
            return x + d * (down[i] - sig[i]), st_

        def dpm_2s(st_):
            down_safe = jnp.maximum(down[i], 1e-10)
            t, t_next = t_of(sig[i]), t_of(down_safe)
            r = 1 / 2
            h = t_next - t
            s_mid = t + r * h
            x_2 = (sig_of(s_mid) / sig_of(t)) * x - jnp.expm1(-h * r) * denoised
            denoised_2, st_ = den2(x_2, sig_of(s_mid), ucs[i], i, st_)
            return (
                (sig_of(t_next) / sig_of(t)) * x - jnp.expm1(-h) * denoised_2,
                st_,
            )

        x, st = jax.lax.cond(down[i] == 0, euler, dpm_2s, st)
        x = x + noise_at(i) * up[i] * temperature
        return (x, st), denoised

    (x_final, _), traj = jax.lax.scan(body, (x, den_state), jnp.arange(n))
    return x_final, traj


def lms_coefficients(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """Integrated Lagrange coefficients [n, order] (lms.py:52-62), computed
    host-side with scipy quadrature; column j weights the j-th newest
    derivative."""
    from scipy import integrate

    n = len(sigmas) - 1
    out = np.zeros((n, order))

    def coeff(cur_order, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(cur_order):
                if j == k:
                    continue
                prod *= (tau - sigmas[i - k]) / (sigmas[i - j] - sigmas[i - k])
            return prod

        return integrate.quad(fn, sigmas[i], sigmas[i + 1], epsrel=1e-4)[0]

    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            out[i, j] = coeff(cur_order, i, j)
    return out


def sample_lms(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None, order: int = 4, den_state=None,
):
    """Linear multistep (lms.py:25-50): derivative ring buffer, integrated
    coefficients."""
    n = len(sigmas) - 1
    sig = jnp.asarray(sigmas, jnp.float32)
    coeffs = jnp.asarray(lms_coefficients(np.asarray(sigmas, np.float64), order), jnp.float32)
    ucs = _uc(uc_scales, n)
    den2 = _den2(den, den_state is not None)

    def body(carry, i):
        x, ds, st = carry  # ds[0] = newest derivative
        denoised, st = den2(x, sig[i], ucs[i], i, st)
        d = _to_d(x, sig[i], denoised)
        ds = jnp.roll(ds, 1, axis=0).at[0].set(d)
        # coeffs row already zero-padded beyond the current order
        x = x + jnp.tensordot(coeffs[i], ds, axes=1)
        return (x, ds, st), denoised

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x_final, _, _), traj = jax.lax.scan(body, (x, ds0, den_state), jnp.arange(n))
    return x_final, traj


def sample_dpm_fast(
    den: Callable, x: jax.Array, sigmas: np.ndarray, uc_scales,
    *, key=None, noises=None, eta: float = 0.0, s_noise: float = 1.0,
):
    """DPM Fast (dpm.py:57-106): NFE-budgeted order-1/2/3 solver steps on a
    uniform grid in t = -log(sigma). The order pattern is static, so the loop
    unrolls (m ~ steps/3 iterations, 3 model evals each)."""
    sigmas = np.asarray(sigmas, np.float64)
    t_start = -math.log(sigmas[0])
    t_end = -math.log(sigmas[-2])
    nfe = len(sigmas) - 1
    m = nfe // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    if nfe % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [nfe % 3]

    # the order-grouped walk has fewer outer steps than NFE; resample the
    # per-step scale schedule onto the group grid
    uc_arr = np.broadcast_to(np.asarray(uc_scales, np.float64), (nfe,))
    grid = np.linspace(0, nfe - 1, len(orders))
    ucs = _uc(np.interp(grid, np.arange(nfe), uc_arr), len(orders))
    noise_at = _noise_source(key, noises, x.shape)
    sig_of = lambda t: math.exp(-t)  # noqa: E731

    def eps_of(x, t, uc):
        sigma = sig_of(t)
        return _to_d(x, sigma, den(x, jnp.asarray(sigma, jnp.float32), uc))

    for i, order in enumerate(orders):
        t, t_next = ts[i], ts[i + 1]
        if eta:
            gamma = eta * math.sqrt(2 * (t_next - t))
            t_up = max(t_start, t - math.log1p(gamma))
            if t_up < t:
                x = x + noise_at(i) * s_noise * math.sqrt(
                    sig_of(t_up) ** 2 - sig_of(t) ** 2
                )
            t = t_up
        h = t_next - t
        eps = eps_of(x, t, ucs[i])
        if order == 1:
            x = x - sig_of(t_next) * math.expm1(h) * eps
        elif order == 2:
            r1 = 1 / 2
            s1 = t + r1 * h
            u1 = x - sig_of(s1) * math.expm1(r1 * h) * eps
            eps_r1 = eps_of(u1, s1, ucs[i])
            x = (
                x
                - sig_of(t_next) * math.expm1(h) * eps
                - sig_of(t_next) / (2 * r1) * math.expm1(h) * (eps_r1 - eps)
            )
        else:
            r1, r2 = 1 / 3, 2 / 3
            s1, s2 = t + r1 * h, t + r2 * h
            u1 = x - sig_of(s1) * math.expm1(r1 * h) * eps
            eps_r1 = eps_of(u1, s1, ucs[i])
            u2 = (
                x
                - sig_of(s2) * math.expm1(r2 * h) * eps
                - sig_of(s2)
                * (r2 / r1)
                * (math.expm1(r2 * h) / (r2 * h) - 1)
                * (eps_r1 - eps)
            )
            eps_r2 = eps_of(u2, s2, ucs[i])
            x = (
                x
                - sig_of(t_next) * math.expm1(h) * eps
                - sig_of(t_next) / r2 * (math.expm1(h) / h - 1) * (eps_r2 - eps)
            )
    return x, None
